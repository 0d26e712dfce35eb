"""Volume/join queries over the remaining star-schema tables (part, supplier)
— broadcast-dimension joins, conditional aggregation, and a correlated
min-per-group shape (TPC-H Q14/Q15/Q2 flavors)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cerebro_spark.io import load_table


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: revenue share of a part-type family (conditional agg
    over a broadcast part join)."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.sum(F.when(F.col("p_type").startswith("STANDARD"), rev).otherwise(0.0))
                * 100.0
                / F.sum(rev)
            ).alias("standard_share_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_PROMO_SQL = """
SELECT
  100.0 * sum(CASE WHEN p_type LIKE 'STANDARD%'
                   THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
        / sum(l_extendedprice * (1 - l_discount)) AS standard_share_pct,
  count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue per supplier, deterministic top-10."""
    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    # TakeOrderedAndProject top-k + bounded rank instead of a global
    # row_number window (round-1 single-partition WindowExec warning).
    from cerebro_spark.operators.util import top_k_ranked

    joined = (
        # supplier scales with SF — no forced broadcast (AQE decides)
        rev.join(sup, rev.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "revenue")
    )
    return top_k_ranked(
        joined, [("revenue", "desc"), ("s_suppkey", "asc")], k=10
    )


_TOP_SUPPLIERS_SQL = """
SELECT s_suppkey, s_name, n_name, revenue, rank FROM (
  SELECT s_suppkey, s_name, n_name, revenue,
    row_number() OVER (ORDER BY revenue DESC, s_suppkey ASC) AS rank
  FROM (
    SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM lineitem GROUP BY l_suppkey
  ) r
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
) WHERE rank <= 10
"""


def q_cheapest_part_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-per-group with the row that achieves it
    (min_by / correlated-min semantics)."""
    part = load_table(spark, "part", sf_dir)
    w = Window.partitionBy("p_brand")
    return (
        part.withColumn("min_price", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("min_price"))
        .groupBy("p_brand", "p_retailprice")
        .agg(F.min("p_partkey").alias("p_partkey"))
        .select("p_brand", "p_partkey", F.col("p_retailprice").alias("price"))
    )


_CHEAPEST_SQL = """
SELECT p_brand, min(p_partkey) AS p_partkey, p_retailprice AS price
FROM part
WHERE p_retailprice = (
  SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = part.p_brand
)
GROUP BY p_brand, p_retailprice
"""


def q_part_size_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets flavor: per-(brand, size) and per-brand totals via rollup."""
    part = load_table(spark, "part", sf_dir)
    return (
        part.rollup("p_brand", "p_size")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("p_retailprice").alias("avg_price"),
        )
        .filter(F.col("p_brand").isNotNull())  # keep brand-level + leaf rows
    )


_PART_SIZE_SQL = """
SELECT p_brand, p_size, count(*) AS n, avg(p_retailprice) AS avg_price
FROM part GROUP BY ROLLUP (p_brand, p_size)
HAVING p_brand IS NOT NULL
"""


def q_customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dimension chain region←nation←customer (TPC-H Q5 dimension side):
    broadcast snowflake join + aggregation."""
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.avg("c_acctbal").alias("avg_acctbal"),
        )
    )


_CUSTOMERS_REGION_SQL = """
SELECT r_name, count(*) AS n_customers, avg(c_acctbal) AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_salted_segment_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted-join correctness parity: events × customer-segment dim through
    ``util.salted_join`` (16-way salt) must produce exactly the plain-join
    aggregate — the oracle runs the unsalted SQL.  Salting is the manual
    fallback for keys AQE's skew split can't break (a single key > executor
    memory); this row proves the rewrite is semantics-preserving."""
    from cerebro_spark.operators.util import salted_join

    ev = load_table(spark, "events", sf_dir)
    seg = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, seg, "user_id", salt_buckets=16)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


_SALTED_SEGMENT_SQL = """
SELECT c_mktsegment, count(*) AS n_events,
       round(sum(value), 4) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


def q_user_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window showcase over PARTITIONED windows (never global):
    per event_type, users ranked by total value with dense_rank, quartile
    (ntile) and gap-to-previous (lag) — the everyday SQL-analytics surface
    a reference user would expect from a query engine."""
    ev = load_table(spark, "events", sf_dir)
    totals = ev.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 4).alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id").asc()
    )
    return totals.select(
        "event_type",
        "user_id",
        "total_value",
        F.dense_rank().over(w).alias("rnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(
            F.coalesce(
                F.lag("total_value").over(w) - F.col("total_value"), F.lit(0.0)
            ),
            4,
        ).alias("gap_to_prev"),
    ).filter(F.col("rnk") <= 10)


_USER_VALUE_RANKS_SQL = """
WITH totals AS (
  SELECT event_type, user_id, round(sum(value), 4) AS total_value
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, user_id, total_value,
    dense_rank() OVER w AS rnk,
    ntile(4) OVER w AS quartile,
    round(coalesce(lag(total_value) OVER w - total_value, 0.0), 4)
      AS gap_to_prev
  FROM totals
  WINDOW w AS (PARTITION BY event_type
               ORDER BY total_value DESC, user_id ASC)
)
SELECT * FROM ranked WHERE rnk <= 10
"""



def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS surface: revenue by (year, quarter) with ROLLUP
    subtotals and grand total — one shuffle computes all three levels
    (Spark expands grouping sets in the partial aggregate, no re-scan per
    level); grouping_id disambiguates subtotal rows for the gate."""
    orders = load_table(spark, "orders", sf_dir)
    price_e2 = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders.select(
            F.year("o_orderdate").alias("o_year"),
            F.quarter("o_orderdate").alias("o_quarter"),
            price_e2.alias("__p"),
        )
        .rollup("o_year", "o_quarter")
        .agg(
            F.sum("__p").alias("revenue_e2"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().alias("gid"),
        )
    )


_REVENUE_ROLLUP_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
  CAST(quarter(o_orderdate) AS INT) AS o_quarter,
  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_e2,
  count(*) AS n_orders,
  CAST(grouping(year(o_orderdate)) * 2 + grouping(quarter(o_orderdate))
       AS BIGINT) AS gid
FROM orders
GROUP BY ROLLUP (year(o_orderdate), quarter(o_orderdate))
"""


QUERIES = {
    "customers_per_region": q_customers_per_region,
    "promo_revenue_share": q_promo_revenue_share,
    "top_suppliers": q_top_suppliers,
    "cheapest_part_per_brand": q_cheapest_part_per_brand,
    "part_size_stats": q_part_size_stats,
    "salted_segment_value": q_salted_segment_value,
    "user_value_ranks": q_user_value_ranks,
    "revenue_rollup": q_revenue_rollup,
}

ORACLES = {
    "customers_per_region": _CUSTOMERS_REGION_SQL,
    "promo_revenue_share": _PROMO_SQL,
    "top_suppliers": _TOP_SUPPLIERS_SQL,
    "cheapest_part_per_brand": _CHEAPEST_SQL,
    "part_size_stats": _PART_SIZE_SQL,
    "salted_segment_value": _SALTED_SEGMENT_SQL,
    "user_value_ranks": _USER_VALUE_RANKS_SQL,
    "revenue_rollup": _REVENUE_ROLLUP_SQL,
}


def q_users_purchase_no_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op shape: users who purchased but had no error in the final week —
    EXCEPT expressed as a distinct + anti join."""
    ev = load_table(spark, "events", sf_dir)
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    erroring = ev.filter(
        (F.col("event_type") == "error")
        & (F.col("ts") >= F.lit("2024-01-24 00:00:00").cast("timestamp"))
    ).select("user_id")
    return (
        purchasers.distinct()
        .join(erroring.distinct(), "user_id", "left_anti")
        .select("user_id")
    )


_USERS_SETOP_SQL = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT DISTINCT user_id FROM events
WHERE event_type = 'error' AND ts >= TIMESTAMP '2024-01-24 00:00:00'
"""


def q_orders_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join shape (EXISTS): orders having at least one returned lineitem."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    return orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


_ORDERS_RETURNS_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
)
"""

QUERIES["users_purchase_no_error"] = q_users_purchase_no_error
QUERIES["orders_with_returns"] = q_orders_with_returns
ORACLES["users_purchase_no_error"] = _USERS_SETOP_SQL
ORACLES["orders_with_returns"] = _ORDERS_RETURNS_SQL


def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: (type × weekday), type-only, weekday-only, grand
    total — completes the grouping-sets family next to ROLLUP."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.withColumn("weekday", F.dayofweek("ts"))
        .cube("event_type", "weekday")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("value_avg"))
    )


_EVENTS_CUBE_SQL = """
SELECT event_type, weekday, count(*) AS n, avg(value) AS value_avg
FROM (SELECT event_type, dayofweek(ts) + 1 AS weekday, value FROM events)
GROUP BY CUBE (event_type, weekday)
"""

QUERIES["events_cube"] = q_events_cube
ORACLES["events_cube"] = _EVENTS_CUBE_SQL
