"""Bucketed co-located joins: same-key bucketed tables join without a shuffle
(the write-once-shuffle-never strategy for the big fact tables)."""

from pyspark.sql import functions as F

from cerebro_spark.io import load_table, write_bucketed
from cerebro_spark.operators.util import salted_join


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, "orders", sf_dir)
        li = load_table(spark, "lineitem", sf_dir)
        write_bucketed(orders, "orders_b", "o_orderkey", 8)
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b",
            "o_orderkey", 8,
        )
        joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the join result is still correct
        expected = orders.join(
            li, orders.o_orderkey == li.l_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_salted_join_equivalence(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name").count()
    )
    salted = (
        salted_join(
            orders.withColumnRenamed("o_custkey", "k"),
            cust.withColumnRenamed("c_custkey", "k"),
            "k",
        )
        .groupBy("c_name").count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
