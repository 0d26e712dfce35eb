from cerebro_spark.plans.client import CerebroClient  # noqa: F401
