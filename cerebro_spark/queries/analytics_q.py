"""Heavier multi-join analytics (TPC-H Q8/Q12/Q18/Q21 shapes, adapted to
the trimmed testdata schema — no shipmode/commitdate columns).

Scale notes baked into each query:
- only CONSTANT-size dimensions (nation, region) carry broadcast hints;
  SF-scaled ones (customer, supplier) are left to AQE, which broadcasts
  them while they fit and shuffles them at the 100 TB target;
- the Q21 shape is expressed as ONE aggregation over (order, supplier)
  flags instead of correlated EXISTS / NOT EXISTS sub-queries — a
  correlated-exists plan re-joins lineitem per predicate, the flag
  aggregation reads it once;
- double sums are rounded in-query on both engines (driver canonicalizer
  hashes full precision; cross-engine summation order differs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cerebro_spark.io import load_table


def q_late_shipments_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: per order priority, how many lineitems shipped >60 days
    after the order date vs on time — conditional counts over one join."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(late.cast("long")).alias("late_items"),
            F.sum((~late).cast("long")).alias("ontime_items"),
        )
    )


_LATE_SHIPMENTS_SQL = """
SELECT o_orderpriority,
  CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
           THEN 1 ELSE 0 END) AS BIGINT) AS late_items,
  CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
           THEN 0 ELSE 1 END) AS BIGINT) AS ontime_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: customers whose single order exceeds 300 units — the
    HAVING filter runs on the lineitem aggregate BEFORE the joins, so only
    qualifying orderkeys (rare) reach the orders/customer joins."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    # no hint on customer: it scales with SF (15B rows at the 100 TB
    # target); AQE broadcasts it only while it fits the threshold
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.round("total_qty", 4).alias("total_qty"),
        )
    )


_LARGE_VOLUME_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice,
       round(total_qty, 4) AS total_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the ONLY supplier with a returned item
    in a multi-supplier order.  EXISTS/NOT-EXISTS re-expressed as one
    (order, supplier) flag aggregation + one order-level aggregation:
    qualifies iff the order has ≥2 suppliers and exactly this one returned."""
    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_ret")
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("has_ret").alias("n_ret_supp"),
    )
    qualifying = (
        per_os.join(per_o, "l_orderkey")
        .filter(
            (F.col("has_ret") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_ret_supp") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("sole_return_orders"))
    )
    # supplier scales with SF — no forced broadcast (AQE decides)
    return (
        qualifying.join(sup, qualifying.l_suppkey == sup.s_suppkey)
        .select("s_suppkey", "s_name", "sole_return_orders")
    )


_SOLE_RETURN_SQL = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_ret
  FROM lineitem GROUP BY l_orderkey, l_suppkey
),
per_o AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(has_ret) AS n_ret_supp
  FROM per_os GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, count(*) AS sole_return_orders
FROM per_os JOIN per_o USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE has_ret = 1 AND n_supp >= 2 AND n_ret_supp = 1
GROUP BY s_suppkey, s_name
"""


def q_market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: within the ASIA region, each nation's share of yearly
    revenue.  Snowflake join (lineitem→orders, customer→nation→region all
    broadcast); the share denominator is a windowless two-level aggregate
    (per-(year,nation) partial sums re-aggregated per year, then a broadcast
    join back — no global window)."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey", "n_name")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_ny = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dims, orders.o_custkey == dims.c_custkey)  # customer-derived:
        # SF-scaled, so no forced broadcast — nation/region (constant-size)
        # are hinted inside dims, the big probe side stays shuffled
        .groupBy(F.year("o_orderdate").alias("o_year"), F.col("n_name"))
        .agg(F.sum(rev).alias("nation_rev"))
    )
    per_y = per_ny.groupBy("o_year").agg(F.sum("nation_rev").alias("year_rev"))
    return (
        per_ny.join(F.broadcast(per_y), "o_year")
        .select(
            "o_year",
            "n_name",
            F.round("nation_rev", 2).alias("nation_rev"),
            F.round(F.col("nation_rev") * 100.0 / F.col("year_rev"), 6).alias(
                "share_pct"
            ),
        )
    )


_MARKET_SHARE_SQL = """
WITH per_ny AS (
  SELECT year(o_orderdate) AS o_year, n_name,
         sum(l_extendedprice * (1 - l_discount)) AS nation_rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
  GROUP BY 1, 2
)
SELECT o_year, n_name, round(nation_rev, 2) AS nation_rev,
       round(nation_rev * 100.0 / sum(nation_rev) OVER (PARTITION BY o_year), 6)
         AS share_pct
FROM per_ny
"""


QUERIES = {
    "late_shipments_by_priority": q_late_shipments_by_priority,
    "large_volume_customers": q_large_volume_customers,
    "sole_return_suppliers": q_sole_return_suppliers,
    "market_share_by_year": q_market_share_by_year,
}

ORACLES = {
    "late_shipments_by_priority": _LATE_SHIPMENTS_SQL,
    "large_volume_customers": _LARGE_VOLUME_SQL,
    "sole_return_suppliers": _SOLE_RETURN_SQL,
    "market_share_by_year": _MARKET_SHARE_SQL,
}
