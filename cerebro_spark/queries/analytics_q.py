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

from pyspark.sql import DataFrame, SparkSession, Window
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


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: yearly revenue that would be lost by dropping
    small-quantity orders of one brand's parts — the per-part 20%%-of-average
    cutoff is a correlated scalar subquery in the oracle; here it is an
    explicit per-part aggregate joined back, so the brand filter prunes
    lineitem BEFORE the cutoff aggregate (the correlated form re-reads
    lineitem per part).  The brand part list is SF-scaled → no forced
    broadcast, AQE decides."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    sel = part.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    li_sel = li.join(sel, li.l_partkey == sel.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    cut = li_sel.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        li_sel.join(cut, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


_SMALL_QTY_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p_partkey)
"""


def q_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue from three disjunctive brand/size/quantity
    brackets.  One equi-join on partkey with the OR-of-ANDs as a post-join
    filter — Catalyst keeps the join an equi-join (hash, not nested-loop)
    and pushes the common ``l_quantity <= 30`` bound and per-branch part
    predicates to the scans."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    bracket = (
        ((b == "Brand#1") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#2") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#3") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(bracket)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


_BRACKET_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: per market segment, customers with above-positive-average
    balance and no order since 2001-01-01.  The global average is a
    broadcast scalar (1-row crossJoin, allowlisted); inactivity is a
    LEFT ANTI join against the distinct recent-purchaser set — the date
    filter prunes orders at the scan before the distinct."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    avg_pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = (
        orders.filter(F.col("o_orderdate") >= "2001-01-01")
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


_IDLE_CUSTOMERS_SQL = """
SELECT c_mktsegment, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
FROM customer c,
     (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0) t
WHERE c.c_acctbal > t.a
  AND NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY 1
"""



def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: revenue where the ordering customer and the shipping
    supplier sit in the SAME nation, per nation within one region — the
    classic two-dimension equi-join (lineitem joins BOTH the
    customer→nation and supplier→nation paths, then the equality collapses
    them)."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    dims = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("n_nationkey", "n_name")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(dims), F.col("c_nationkey") == dims.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
    )


_LOCAL_SUPPLIER_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
GROUP BY n_name
"""


def q_returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top 20 customers by revenue lost to returns in one
    quarter.  The return filter prunes lineitem at the scan; top-N via
    TakeOrderedAndProject + bounded rank (never a global window)."""
    from cerebro_spark.operators.util import top_k_ranked

    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    # exact integer domain: price in cents × (100 - discount%) sums as a
    # BIGINT and is RETURNED as 1e-4 currency units — a float sum's low-bit
    # noise flipped 2-dp rounding at one customer, and even the exact total
    # divided to double hits engine round-half disagreements at x.595
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    per_cust = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1996-04-01")
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(F.sum(rev_e4).alias("lost_revenue_e4"))
    )
    return top_k_ranked(
        per_cust, [("lost_revenue_e4", "desc"), ("c_custkey", "asc")], k=20
    )


_RETURNED_ITEM_SQL = """
WITH per_cust AS (
  SELECT c_custkey, c_name, c_mktsegment,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)))
           AS lost_revenue_e4
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1, 2, 3
)
SELECT c_custkey, c_name, c_mktsegment,
       CAST(lost_revenue_e4 AS BIGINT) AS lost_revenue_e4, rank FROM (
  SELECT *, row_number() OVER (
    ORDER BY lost_revenue_e4 DESC, c_custkey ASC) AS rank
  FROM per_cust
) WHERE rank <= 20
"""


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event funnel: per user, did a `click` precede a `purchase` within
    24 h?  Expressed as a conditional aggregate over per-user min/max
    event times (one shuffle) rather than a self-join of the events table
    against itself — the self-join form doubles the fact scan and
    explodes on active users."""
    ev = load_table(spark, "events", sf_dir)
    first_click = F.min(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).alias("first_click")
    per_user = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            first_click,
            F.collect_list(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("purchases"),
        )
        .select(
            "user_id",
            "first_click",
            F.when(
                F.col("first_click").isNotNull()
                & F.exists(
                    "purchases",
                    lambda t: (t >= F.col("first_click"))
                    & (
                        t
                        <= F.col("first_click") + F.expr("INTERVAL 24 HOURS")
                    ),
                ),
                1,
            )
            .otherwise(0)
            .alias("converted"),
        )
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("first_click").isNotNull(), 1).otherwise(0)).alias(
            "n_clicked"
        ),
        F.sum("converted").alias("n_converted"),
    )


_FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
    min(CASE WHEN event_type = 'click' THEN ts END) AS first_click
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
),
conv AS (
  SELECT p.user_id, p.first_click,
    CASE WHEN p.first_click IS NOT NULL AND EXISTS (
      SELECT 1 FROM events e
      WHERE e.user_id = p.user_id AND e.event_type = 'purchase'
        AND e.ts >= p.first_click
        AND e.ts <= p.first_click + INTERVAL 24 HOUR
    ) THEN 1 ELSE 0 END AS converted
  FROM per_user p
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
  CAST(sum(CASE WHEN first_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_clicked,
  CAST(sum(converted) AS BIGINT) AS n_converted
FROM conv
"""



def q_priority_order_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders (per priority, one quarter) with at least one
    lineitem shipped after 30 days — EXISTS as a LEFT SEMI join against the
    date-filtered lineitem, counted per priority."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    sel = orders.filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    )
    lateitems = (
        li.join(sel, li.l_orderkey == sel.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .select("l_orderkey")
        .distinct()
    )
    return (
        sel.join(lateitems, sel.o_orderkey == lateitems.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_PRIORITY_ORDER_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: pure scan-side arithmetic — one year, a discount band, a
    quantity cap; every predicate pushes to the parquet scan and the sum is
    one partial-agg shuffle of a single double."""
    li = load_table(spark, "lineitem", sf_dir)
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * F.round(
        F.col("l_discount") * 100
    ).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.02, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(rev_e4) / 10000.0).alias("revenue_increase"))
        .select(F.round("revenue_increase", 2).alias("revenue_increase"))
    )


_FORECAST_REVENUE_SQL = """
SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0, 2)
  AS revenue_increase
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
"""


def q_bilateral_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipping volume between two nations by year in both
    directions — supplier-nation × customer-nation cross-filtered to the
    ordered pair set, broadcast dims on both paths."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg((F.sum(rev_e4) / 10000.0).alias("revenue"))
        .select(
            "supp_nation", "cust_nation", "l_year",
            F.round("revenue", 2).alias("revenue"),
        )
    )


_BILATERAL_TRADE_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  year(l_shipdate) AS l_year,
  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0, 2)
    AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY 1, 2, 3
"""


def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: how many customers placed exactly N orders (including
    zero) — LEFT join + two-level aggregate; the zero bucket only exists
    because the join is outer."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


_ORDER_COUNT_SQL = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count
"""



def q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) achieving the maximum quarterly revenue —
    the revenue "view" is computed once and reused for both the per-
    supplier rows and the scalar max (broadcast 1-row join; the correlated
    form would re-aggregate lineitem).  Exact 1e-4 integer revenue, so the
    max comparison can't be perturbed by float summation order."""
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev_e4).alias("total_e4"))
    )
    mx = rev.agg(F.max("total_e4").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_e4") == F.col("mx"))
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_e4").alias("total_revenue_e4"))
    )


_TOP_REVENUE_SUPPLIER_SQL = """
WITH rev AS (
  SELECT l_suppkey,
    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS total_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(total_e4 AS BIGINT) AS total_revenue_e4
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_e4 = (SELECT max(total_e4) FROM rev)
"""



def q_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (adapted: no partsupp, so part cost is proxied as
    0.6·p_retailprice per unit): profit per supplier nation per order year
    for parts whose name mentions a color.  Join order: lineitem × part
    (selective name filter prunes first) × orders × supplier ×
    broadcast(nation).  Money sums in e4 fixed point — exact BIGINT
    aggregation, no cross-engine double-sum noise."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_name").contains("red") | F.col("p_name").contains("blue")
    )
    orders = load_table(spark, "orders", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    price_e2 = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_e2 = F.round(F.col("l_discount") * 100).cast("long")
    retail_e2 = F.round(F.col("p_retailprice") * 100).cast("long")
    qty = F.round(F.col("l_quantity")).cast("long")
    profit_e4 = price_e2 * (100 - disc_e2) - retail_e2 * 60 * qty
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit_e4).alias("profit_e4"))
    )


_PROFIT_BY_NATION_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        * (100 - CAST(round(l_discount * 100) AS BIGINT))
      - CAST(round(p_retailprice * 100) AS BIGINT) * 60
        * CAST(round(l_quantity) AS BIGINT))::BIGINT AS profit_e4
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%' OR p_name LIKE '%blue%'
GROUP BY 1, 2
"""


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (adapted: shipped value instead of partsupp stock value):
    parts whose shipped value exceeds 1.25× the average part's — a
    RELATIVE threshold, because an absolute share cutoff (Q11's 0.01%)
    empties or floods the result as the part count scales with SF.  The
    global (total, n_parts) is a 1-row aggregate broadcast back over the
    per-part aggregate — the scalar-subquery pattern, not a second scan;
    the comparison stays in exact integer arithmetic (value·n·4 > 5·total)."""
    li = load_table(spark, "lineitem", sf_dir)
    value_e2 = F.round(F.col("l_extendedprice") * 100).cast("long")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(value_e2).alias("value_e2")
    )
    total = per_part.agg(
        F.sum("value_e2").alias("__total_e2"),
        F.count(F.lit(1)).alias("__n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_e2") * F.col("__n_parts") * 4 > F.col("__total_e2") * 5
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "value_e2",
            F.round(F.col("value_e2") / F.col("__total_e2"), 8).alias(
                "value_share"
            ),
        )
    )


_IMPORTANT_PARTS_SQL = """
WITH per_part AS (
  SELECT l_partkey AS p_partkey,
    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS value_e2
  FROM lineitem GROUP BY 1
),
tot AS (SELECT sum(value_e2) AS total_e2, count(*) AS n_parts FROM per_part)
SELECT p_partkey, CAST(value_e2 AS BIGINT) AS value_e2,
  round(1.0 * value_e2 / total_e2, 8) AS value_share
FROM per_part, tot
WHERE value_e2 * n_parts * 4 > total_e2 * 5
"""


def q_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (adapted: the part↔supplier relation comes from lineitem —
    no partsupp table — and the complaint exclusion becomes negative
    account balance): distinct suppliers able to ship each (brand, type,
    size) bucket, excluding one brand.  distinct-count shuffles on the
    grouping key after an early dropDuplicates pre-shrink."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_brand") != "Brand#5"
    )
    supp = load_table(spark, "supplier", sf_dir).filter(
        F.col("s_acctbal") >= 0
    )
    # pre-shrink: the (part, supplier) pairs, not every lineitem row,
    # reach the wide join/agg — map-side dedup before the shuffle
    pairs = li.select("l_partkey", "l_suppkey").dropDuplicates()
    return (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .join(supp, pairs.l_suppkey == supp.s_suppkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


_SUPPLIER_BREADTH_SQL = """
SELECT p_brand, p_type, p_size,
  count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_brand <> 'Brand#5' AND s_acctbal >= 0
GROUP BY 1, 2, 3
"""


def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (adapted: 'excess availability' becomes shipment
    concentration): suppliers shipping >3x their fair share of some part's
    total quantity (relative threshold — an absolute share cutoff empties
    as the supplier count scales with SF), with how many parts they
    dominate.  Two aggregations over ONE scan of
    (partkey, suppkey, qty) — the per-part total is a re-aggregation of
    the finer (part, supp) aggregate, not a second lineitem read — then an
    equi-join on partkey and a broadcast nation lookup."""
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    qty = F.round(F.col("l_quantity")).cast("long")
    by_ps = li.select("l_partkey", "l_suppkey", qty.alias("q")).groupBy(
        "l_partkey", "l_suppkey"
    ).agg(F.sum("q").alias("supp_qty"))
    by_part = by_ps.groupBy("l_partkey").agg(
        F.sum("supp_qty").alias("part_qty"),
        F.count(F.lit(1)).alias("n_supp"),
    )
    dominant = (
        by_ps.join(by_part, "l_partkey")
        .filter(F.col("supp_qty") * F.col("n_supp") > F.col("part_qty") * 3)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("parts_dominated"))
    )
    return (
        dominant.join(supp, dominant.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "s_suppkey", "s_name", F.col("n_name").alias("nation"),
            "parts_dominated",
        )
    )


_DOMINANT_SUPPLIERS_SQL = """
WITH by_ps AS (
  SELECT l_partkey, l_suppkey,
    sum(CAST(round(l_quantity) AS BIGINT)) AS supp_qty
  FROM lineitem GROUP BY 1, 2
),
by_part AS (
  SELECT l_partkey, sum(supp_qty) AS part_qty, count(*) AS n_supp
  FROM by_ps GROUP BY 1
),
dom AS (
  SELECT l_suppkey, count(*) AS parts_dominated
  FROM by_ps JOIN by_part USING (l_partkey)
  WHERE supp_qty * n_supp > part_qty * 3
  GROUP BY 1
)
SELECT s_suppkey, s_name, n_name AS nation,
  CAST(parts_dominated AS BIGINT) AS parts_dominated
FROM dom
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (adapted: no partsupp, so the part↔supplier relation comes
    from lineitem and supply cost is proxied by s_acctbal): for each part
    of size ≥ 40 shipped by an ASIA supplier, the cheapest such supplier
    (min acctbal, tie → min suppkey).  The correlated min runs as a window
    PARTITIONED BY part (wide fan-out, no global ordering); dims chain
    nation→region broadcast."""
    part = load_table(spark, "part", sf_dir).filter(F.col("p_size") >= 40)
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    sdim = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pairs = (
        li.select("l_partkey", "l_suppkey").dropDuplicates()
        .join(part, F.col("l_partkey") == part.p_partkey)
        .join(sdim, F.col("l_suppkey") == sdim.s_suppkey)
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("s_acctbal").asc(), F.col("s_suppkey").asc()
    )
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "p_partkey", "p_brand", "p_size", "s_suppkey", "s_name",
            "s_acctbal", F.col("n_name").alias("nation"),
        )
    )


_MIN_COST_SUPPLIER_SQL = """
WITH sdim AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p_partkey, p_brand, p_size, s_suppkey, s_name, s_acctbal,
       n_name AS nation
FROM (
  SELECT p.p_partkey, p.p_brand, p.p_size, s.s_suppkey, s.s_name,
         s.s_acctbal, s.n_name,
         row_number() OVER (PARTITION BY p.p_partkey
                            ORDER BY s.s_acctbal ASC, s.s_suppkey ASC) AS rn
  FROM pairs
  JOIN part p ON l_partkey = p_partkey
  JOIN sdim s ON l_suppkey = s_suppkey
  WHERE p.p_size >= 40
) WHERE rn = 1
"""


QUERIES = {
    "late_shipments_by_priority": q_late_shipments_by_priority,
    "large_volume_customers": q_large_volume_customers,
    "sole_return_suppliers": q_sole_return_suppliers,
    "market_share_by_year": q_market_share_by_year,
    "small_qty_revenue": q_small_qty_revenue,
    "bracket_revenue": q_bracket_revenue,
    "idle_customers": q_idle_customers,
    "local_supplier_volume": q_local_supplier_volume,
    "returned_item_losses": q_returned_item_losses,
    "funnel_conversion": q_funnel_conversion,
    "priority_order_check": q_priority_order_check,
    "forecast_revenue_change": q_forecast_revenue_change,
    "bilateral_trade": q_bilateral_trade,
    "order_count_distribution": q_order_count_distribution,
    "top_revenue_supplier": q_top_revenue_supplier,
    "profit_by_nation_year": q_profit_by_nation_year,
    "important_parts": q_important_parts,
    "supplier_breadth": q_supplier_breadth,
    "dominant_suppliers": q_dominant_suppliers,
    "min_cost_supplier": q_min_cost_supplier,
}

ORACLES = {
    "late_shipments_by_priority": _LATE_SHIPMENTS_SQL,
    "large_volume_customers": _LARGE_VOLUME_SQL,
    "sole_return_suppliers": _SOLE_RETURN_SQL,
    "market_share_by_year": _MARKET_SHARE_SQL,
    "small_qty_revenue": _SMALL_QTY_SQL,
    "bracket_revenue": _BRACKET_SQL,
    "idle_customers": _IDLE_CUSTOMERS_SQL,
    "local_supplier_volume": _LOCAL_SUPPLIER_SQL,
    "returned_item_losses": _RETURNED_ITEM_SQL,
    "funnel_conversion": _FUNNEL_SQL,
    "priority_order_check": _PRIORITY_ORDER_SQL,
    "forecast_revenue_change": _FORECAST_REVENUE_SQL,
    "bilateral_trade": _BILATERAL_TRADE_SQL,
    "order_count_distribution": _ORDER_COUNT_SQL,
    "top_revenue_supplier": _TOP_REVENUE_SUPPLIER_SQL,
    "profit_by_nation_year": _PROFIT_BY_NATION_SQL,
    "important_parts": _IMPORTANT_PARTS_SQL,
    "supplier_breadth": _SUPPLIER_BREADTH_SQL,
    "dominant_suppliers": _DOMINANT_SUPPLIERS_SQL,
    "min_cost_supplier": _MIN_COST_SUPPLIER_SQL,
}


def q_rolling_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue per order priority: daily e2 fixed-point
    totals first (shrinks the window input from order-grain to
    day×priority-grain), then an integer RANGE frame over the day index —
    gap-correct (missing days don't stretch the window) and partitioned by
    priority, so no global sort at any scale."""
    orders = load_table(spark, "orders", sf_dir)
    day = F.floor(F.col("o_orderdate").cast("long") / 86400).alias("day")
    rev_e2 = F.round(F.col("o_totalprice") * 100).cast("long")
    daily = orders.groupBy(day, "o_orderpriority").agg(
        F.sum(rev_e2).alias("rev_e2")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "o_orderpriority",
        "day",
        F.col("rev_e2"),
        F.sum("rev_e2").over(w).alias("rolling_rev_e2"),
    )


_ROLLING_REVENUE_SQL = """
WITH daily AS (
  SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
    o_orderpriority,
    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_e2
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, day, rev_e2,
  CAST(sum(rev_e2) OVER (
    PARTITION BY o_orderpriority ORDER BY day
    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS rolling_rev_e2
FROM daily
"""

QUERIES["rolling_revenue_7d"] = q_rolling_revenue_7d
ORACLES["rolling_revenue_7d"] = _ROLLING_REVENUE_SQL


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) user segmentation over the
    events stream — the classic CRM cut, banded on FIXED thresholds so no
    global ranking window exists (an ntile() over all users would serialize
    through one WindowExec task; fixed bands are one combinable groupBy).
    Monetary is an exact integer cents sum (floor(value*100 + 0.5) per
    event) and recency is integer days vs the corpus max timestamp — every
    output column is integer-derived, so the cross-engine hash is exact."""
    from cerebro_spark.io import load_table

    ev = load_table(spark, "events", sf_dir)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum(cents).alias("monetary_e2"),
        F.max(F.col("ts").cast("long")).alias("last_s"),
    )
    # 1-row corpus anchor; scalar crossJoin broadcast (the allowlisted shape)
    anchor = ev.agg(F.max(F.col("ts").cast("long")).alias("max_s"))
    days = F.floor((F.col("max_s") - F.col("last_s")) / F.lit(86400)).cast("int")
    banded = per_user.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.when(days <= 0, "r1").when(days <= 1, "r2").otherwise("r3").alias("r_band"),
        F.when(F.col("freq") >= 70, "f1").when(F.col("freq") >= 55, "f2").otherwise("f3").alias("f_band"),
        F.when(F.col("monetary_e2") >= 400000, "m1")
        .when(F.col("monetary_e2") >= 250000, "m2")
        .otherwise("m3")
        .alias("m_band"),
        "monetary_e2",
    )
    return banded.groupBy("r_band", "f_band", "m_band").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("monetary_e2").alias("segment_monetary_e2"),
    )


_RFM_SQL = """
WITH per_user AS (
  SELECT user_id, count(*) AS freq,
    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS monetary_e2,
    CAST(floor(epoch(max(ts))) AS BIGINT) AS last_s
  FROM events GROUP BY 1
),
anchor AS (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS max_s FROM events),
banded AS (
  SELECT user_id,
    CASE WHEN floor((max_s - last_s) / 86400.0) <= 0 THEN 'r1'
         WHEN floor((max_s - last_s) / 86400.0) <= 1 THEN 'r2'
         ELSE 'r3' END AS r_band,
    CASE WHEN freq >= 70 THEN 'f1' WHEN freq >= 55 THEN 'f2'
         ELSE 'f3' END AS f_band,
    CASE WHEN monetary_e2 >= 400000 THEN 'm1'
         WHEN monetary_e2 >= 250000 THEN 'm2'
         ELSE 'm3' END AS m_band,
    monetary_e2
  FROM per_user, anchor
)
SELECT r_band, f_band, m_band, count(*) AS n_users,
  CAST(sum(monetary_e2) AS BIGINT) AS segment_monetary_e2
FROM banded GROUP BY 1, 2, 3
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session event-type transition counts (the first-order Markov
    matrix behind funnel/path analysis): per-user lag over (ts, event_id) —
    the deterministic total order — with transitions crossing a 30-minute
    gap discarded as session breaks.  One per-user window pass + one
    combinable groupBy; at 100 TB the window partitions by user (millions of
    independent partitions), never globally."""
    from cerebro_spark.io import load_table

    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    lagged = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        (F.col("us") - F.lag("us").over(w)).alias("gap_us"),
    ).filter(F.col("prev_type").isNotNull() & (F.col("gap_us") < 1800 * 1_000_000))
    return lagged.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )


_EVENT_TRANSITIONS_SQL = """
WITH lagged AS (
  SELECT event_type,
    lag(event_type) OVER w AS prev_type,
    epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
)
SELECT prev_type, event_type, count(*) AS n_transitions
FROM lagged
WHERE prev_type IS NOT NULL AND gap_us < 1800000000
GROUP BY 1, 2
"""

QUERIES["rfm_segments"] = q_rfm_segments
ORACLES["rfm_segments"] = _RFM_SQL
QUERIES["event_transitions"] = q_event_transitions
ORACLES["event_transitions"] = _EVENT_TRANSITIONS_SQL


def q_order_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-versioning diff (profile.snapshot_diff): two deterministic
    snapshots of orders — 'old' missing the keys ≡5 (mod 89), 'new' missing
    keys ≡0 (mod 97) with prices bumped +1.0 on keys ≡0 (mod 13) — diffed
    on o_orderkey comparing o_totalprice, summarized per status.  The +1.0
    double op is exact on both engines, so 'changed' membership is
    deterministic."""
    from cerebro_spark.operators.profile import snapshot_diff

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_totalprice"
    )
    old = orders.filter(F.col("o_orderkey") % 89 != 5)
    new = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + F.lit(1.0)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    diff = snapshot_diff(old, new, keys=["o_orderkey"])
    return (
        diff.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").alias("first_key"),
            F.max("o_orderkey").alias("last_key"),
        )
    )


_SNAPSHOT_DIFF_SQL = """
WITH old AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 89 <> 5
),
new AS (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END
      AS o_totalprice
  FROM orders WHERE o_orderkey % 97 <> 0
),
diff AS (
  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
    CASE
      WHEN o.o_orderkey IS NULL THEN 'added'
      WHEN n.o_orderkey IS NULL THEN 'removed'
      WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'changed'
      ELSE 'unchanged'
    END AS status
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
)
SELECT status, count(*) AS n,
  min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
FROM diff
WHERE status <> 'unchanged'
GROUP BY 1
"""

QUERIES["order_snapshot_diff"] = q_order_snapshot_diff
ORACLES["order_snapshot_diff"] = _SNAPSHOT_DIFF_SQL


def q_k_anonymity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk summary (profile.k_anonymity, k=5) over the events
    quasi-identifier tuple (event_type, day, value bucketed to width 50 —
    raw floats would make every row its own class).  One combinable
    groupBy + one 1-row aggregate; the share is one division of exact
    counts."""
    from cerebro_spark.operators.profile import k_anonymity

    ev = load_table(spark, "events", sf_dir)
    return k_anonymity(
        ev,
        [
            F.col("event_type"),
            F.date_trunc("day", F.col("ts")),
            F.floor(F.col("value") / 50),
        ],
        k=5,
    )


_K_ANONYMITY_SQL = """
WITH classes AS (
  SELECT event_type, date_trunc('day', ts) AS d, floor(value / 50) AS vb,
    count(*) AS sz
  FROM events GROUP BY 1, 2, 3
)
SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
  count(*) AS n_groups,
  CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_groups,
  CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS n_risky_rows,
  1.0 * sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) / sum(sz) AS risky_row_share
FROM classes
"""

QUERIES["k_anonymity_events"] = q_k_anonymity_events
ORACLES["k_anonymity_events"] = _K_ANONYMITY_SQL


def q_incremental_rollup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability gate for the incremental-aggregate state
    (rollup.rollup_state / merge_rollup_states): the per-type state built
    from two disjoint halves of events (event_id parity split) and then
    MERGED must equal the oracle's one-pass aggregate bit-for-bit — counts
    and e2 fixed-point sums are integers, min/max are value extrema, so
    the identity holds exactly or the hash fails."""
    from cerebro_spark.operators.rollup import merge_rollup_states, rollup_state

    ev = load_table(spark, "events", sf_dir)
    a = rollup_state(ev.filter(F.col("event_id") % 2 == 0), ["event_type"])
    b = rollup_state(ev.filter(F.col("event_id") % 2 == 1), ["event_type"])
    return merge_rollup_states([a, b], ["event_type"])


_INCREMENTAL_ROLLUP_SQL = """
SELECT event_type,
  count(value) AS n,
  min(value) AS vmin,
  max(value) AS vmax,
  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS vsum_e2
FROM events
GROUP BY 1
"""

QUERIES["incremental_rollup_check"] = q_incremental_rollup_check
ORACLES["incremental_rollup_check"] = _INCREMENTAL_ROLLUP_SQL


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 history build (profile.scd2_collapse):
    collapse each sampled user's event log into event_type version
    intervals — valid_from / valid_to (NULL while current) / run size.
    Ordering ties at equal ts break on event_id (operator docstring), so
    run boundaries are engine-deterministic; every output value is a
    string, timestamp or exact count — no float canon needed.  Users are
    subset with user_id % 5 = 0 to keep the gate result interval-sized."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("user_id") % 5 == 0)
    from cerebro_spark.operators.profile import scd2_collapse

    return scd2_collapse(
        ev,
        key_cols=["user_id"],
        attr_cols=["event_type"],
        ts_col="ts",
        tiebreak_cols=["event_id"],
    )


_SCD2_SQL = """
WITH ev AS (
  SELECT user_id, event_type, ts, event_id FROM events WHERE user_id % 5 = 0
),
marked AS (
  SELECT user_id, event_type, ts, event_id,
    CASE WHEN event_type IS DISTINCT FROM lag(event_type) OVER w
         THEN 1 ELSE 0 END AS chg
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, event_type, ts,
    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS run
  FROM marked
),
iv AS (
  SELECT user_id, run, event_type,
    min(ts) AS valid_from, count(*) AS n_events
  FROM runs GROUP BY 1, 2, 3
)
SELECT user_id, event_type, valid_from,
  lead(valid_from) OVER w2 AS valid_to,
  n_events,
  lead(valid_from) OVER w2 IS NULL AS is_current
FROM iv
WINDOW w2 AS (PARTITION BY user_id ORDER BY run)
"""

QUERIES["scd2_intervals"] = q_scd2_intervals
ORACLES["scd2_intervals"] = _SCD2_SQL


#: Benford first-digit expectations log10(1 + 1/d), embedded as IDENTICAL
#: literal doubles in the Spark plan and the oracle SQL (repr round-trips
#: exactly), so neither engine evaluates log10 at runtime.
_BENFORD_EXPECTED = {
    d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)
}


def q_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance audit over order totals: first significant
    digit of floor(o_totalprice) per order priority, with the chi-square
    statistic against the Benford expectation.  The digit is extracted
    from the BIGINT's string form (identical formatting in both engines —
    no float→string, no log10 at runtime: expectations are shared literal
    constants).  Per-digit chi² terms are quantized to 1e-6 BIGINTs and
    summed exactly (the DSIR integer-sum trick), so the statistic is
    engine-deterministic.  The FULL priority×digit grid is materialized
    (an absent digit still owes its expected mass (0−e)²/e = e to the
    chi² — dropping empty cells understates the statistic, the same rule
    chi2_independence documents).  Plan: one combinable groupBy over
    (priority, digit) — 9 rows per priority — then window sums over that
    tiny frame."""
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_totalprice") >= 1.0)
    fd = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("int")
    observed = (
        orders.select("o_orderpriority", fd.alias("fd"))
        .groupBy("o_orderpriority", "fd")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = (
        observed.select("o_orderpriority")
        .distinct()
        .withColumn("fd", F.explode(F.sequence(F.lit(1), F.lit(9))))
    )
    counts = grid.join(observed, ["o_orderpriority", "fd"], "left").select(
        "o_orderpriority", "fd", F.coalesce("n", F.lit(0)).alias("n")
    )
    w = Window.partitionBy("o_orderpriority")
    p_exp = F.element_at(
        F.create_map(
            *[x for d, e in sorted(_BENFORD_EXPECTED.items()) for x in (F.lit(d), F.lit(e))]
        ),
        F.col("fd"),
    )
    scored = counts.select(
        "o_orderpriority",
        "fd",
        "n",
        F.sum("n").over(w).alias("total"),
        p_exp.alias("p_exp"),
    ).select(
        "o_orderpriority",
        "fd",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("p_obs"),
        "p_exp",
        F.floor(
            (F.col("n") - F.col("p_exp") * F.col("total"))
            * (F.col("n") - F.col("p_exp") * F.col("total"))
            / (F.col("p_exp") * F.col("total"))
            * F.lit(1.0e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("__term"),
    )
    return scored.select(
        "o_orderpriority",
        "fd",
        "n",
        "p_obs",
        "p_exp",
        (F.sum("__term").over(w) / F.lit(1.0e6)).alias("chi2"),
    )


def _benford_sql() -> str:
    # CAST each literal to DOUBLE: DuckDB otherwise types the 17-digit
    # decimal literals as DECIMAL and runs the whole chi² in decimal
    # arithmetic (overflowing DECIMAL(38) and diverging from Spark doubles)
    cases = " ".join(
        f"WHEN fd = {d} THEN CAST({e!r} AS DOUBLE)"
        for d, e in sorted(_BENFORD_EXPECTED.items())
    )
    return f"""
WITH observed AS (
  SELECT o_orderpriority,
    CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS fd,
    count(*) AS n
  FROM orders WHERE o_totalprice >= 1.0
  GROUP BY 1, 2
),
grid AS (
  SELECT p.o_orderpriority, CAST(g.d AS INT) AS fd
  FROM (SELECT DISTINCT o_orderpriority FROM observed) p,
       generate_series(1, 9) AS g(d)
),
counts AS (
  SELECT grid.o_orderpriority, grid.fd, coalesce(o.n, 0) AS n
  FROM grid LEFT JOIN observed o
    ON grid.o_orderpriority = o.o_orderpriority AND grid.fd = o.fd
),
scored AS (
  SELECT o_orderpriority, fd, n,
    sum(n) OVER w AS total,
    CASE {cases} END AS p_exp
  FROM counts
  WINDOW w AS (PARTITION BY o_orderpriority)
)
SELECT o_orderpriority, fd, n,
  CAST(n AS DOUBLE) / total AS p_obs,
  p_exp,
  sum(CAST(floor(
        (n - p_exp * total) * (n - p_exp * total) / (p_exp * total) * 1e6 + 0.5
      ) AS BIGINT)) OVER (PARTITION BY o_orderpriority) / 1e6 AS chi2
FROM scored
"""


QUERIES["benford_profile"] = q_benford_profile
ORACLES["benford_profile"] = _benford_sql()


def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-step ordered funnel view → click → purchase within 24 h of each
    user's FIRST view (timeops.window_funnel, the anchored-greedy
    ClickHouse windowFunnel shape): per-level user counts plus the
    earliest anchor among that level's users.  Every step is a filtered
    scan + min-groupBy chained on user_id — no fact-table self-join
    (operator docstring)."""
    from cerebro_spark.operators.timeops import window_funnel

    ev = load_table(spark, "events", sf_dir)
    lv = window_funnel(
        ev,
        [
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        time_col="ts",
        keys=["user_id"],
        window_seconds=86400,
    )
    return lv.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("t1").alias("first_anchor"),
    )


_WINDOW_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click'
    AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 86400 SECONDS
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase'
    AND e.ts > s2.t2 AND e.ts <= s2.t1 + INTERVAL 86400 SECONDS
  GROUP BY 1
),
lv AS (
  SELECT s1.user_id,
    CASE WHEN s3.t3 IS NOT NULL THEN 3
         WHEN s2.t2 IS NOT NULL THEN 2
         ELSE 1 END AS level,
    s1.t1
  FROM s1
  LEFT JOIN s2 ON s1.user_id = s2.user_id
  LEFT JOIN s3 ON s1.user_id = s3.user_id
)
SELECT CAST(level AS INT) AS level, count(*) AS n_users,
  min(t1) AS first_anchor
FROM lv GROUP BY level
"""

QUERIES["window_funnel"] = q_window_funnel
ORACLES["window_funnel"] = _WINDOW_FUNNEL_SQL


def q_chi2_event_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test (profile.chi2_independence): is the
    event-type mix independent of the hour of day?  Full 5×24 contingency
    grid including zero cells, e6-quantized terms summed exactly,
    Cramér's V via IEEE-correctly-rounded sqrt (operator docstring) —
    single-row engine-exact summary."""
    from cerebro_spark.operators.profile import chi2_independence

    ev = load_table(spark, "events", sf_dir)
    return chi2_independence(ev, F.col("event_type"), F.hour(F.col("ts")))


_CHI2_SQL = """
WITH cells AS (
  SELECT event_type AS a, hour(ts) AS b, count(*) AS o
  FROM events
  WHERE event_type IS NOT NULL AND hour(ts) IS NOT NULL
  GROUP BY 1, 2
),
ra AS (SELECT a, sum(o) AS ra FROM cells GROUP BY 1),
cb AS (SELECT b, sum(o) AS cb FROM cells GROUP BY 1),
tot AS (
  SELECT sum(o) AS n, count(DISTINCT a) AS r, count(DISTINCT b) AS c
  FROM cells
),
grid AS (
  SELECT ra.a, cb.b, ra.ra, cb.cb, coalesce(cells.o, 0) AS o
  FROM ra CROSS JOIN cb
  LEFT JOIN cells ON ra.a = cells.a AND cb.b = cells.b
),
terms AS (
  SELECT CAST(floor(
    (o - CAST(ra * cb AS DOUBLE) / n) * (o - CAST(ra * cb AS DOUBLE) / n)
      / (CAST(ra * cb AS DOUBLE) / n) * 1e6 + 0.5) AS BIGINT) AS t6
  FROM grid, tot
)
SELECT sum(t6) / 1e6 AS chi2,
  CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
  CAST(n AS BIGINT) AS n,
  sqrt((sum(t6) / 1e6) / (n * CAST(least(r - 1, c - 1) AS DOUBLE)))
    AS cramers_v
FROM terms, tot
GROUP BY r, c, n
"""

QUERIES["chi2_event_hour"] = q_chi2_event_hour
ORACLES["chi2_event_hour"] = _CHI2_SQL


def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue (profile.gini_concentration):
    how concentrated is spend across the customer base — exact-cents
    integer ranks via the two-level bucketed distributed ranking (no
    global window; operator docstring), final formula a mirrored chain of
    single IEEE ops."""
    from cerebro_spark.operators.profile import gini_concentration

    orders = load_table(spark, "orders", sf_dir)
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_e2")
    )
    return gini_concentration(rev, "rev_e2", "o_custkey")


_GINI_SQL = """
WITH rev AS (
  SELECT o_custkey AS k,
    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT v, row_number() OVER (ORDER BY v, k) AS i FROM rev
),
agg AS (
  SELECT CAST(sum(v) AS BIGINT) AS s0,
    CAST(sum(i * v) AS BIGINT) AS s1,
    count(*) AS n
  FROM ranked
)
SELECT
  (2.0 * s1) / (CAST(s0 AS DOUBLE) * n) - CAST(n + 1 AS DOUBLE) / n AS gini,
  CAST(n AS BIGINT) AS n, s0 AS total
FROM agg
"""

QUERIES["revenue_gini"] = q_revenue_gini
ORACLES["revenue_gini"] = _GINI_SQL


def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-advance per funnel level (companion to window_funnel): for
    users who reached level 2 / level 3, the count and exact-microsecond
    min/avg/max latency from the level-1 anchor to that level's step —
    avg is a division of exact integer sums, so no rounding is needed."""
    from cerebro_spark.operators.timeops import window_funnel

    ev = load_table(spark, "events", sf_dir)
    lv = window_funnel(
        ev,
        [
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        time_col="ts",
        keys=["user_id"],
        window_seconds=86400,
    )
    lat = lambda c: F.unix_micros(F.col(c)) - F.unix_micros(F.col("t1"))  # noqa: E731
    two = lv.filter(F.col("t2").isNotNull()).select(
        F.lit(2).alias("level"), lat("t2").alias("us")
    )
    three = lv.filter(F.col("t3").isNotNull()).select(
        F.lit(3).alias("level"), lat("t3").alias("us")
    )
    return (
        two.unionByName(three)
        .groupBy("level")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("us").alias("min_us"),
            ((F.sum("us").cast("double") / F.count(F.lit(1))) / F.lit(1.0e6)).alias(
                "avg_s"
            ),
            F.max("us").alias("max_us"),
        )
    )


_FUNNEL_LATENCY_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click'
    AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 86400 SECONDS
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3, min(s2.t1) AS t1
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase'
    AND e.ts > s2.t2 AND e.ts <= s2.t1 + INTERVAL 86400 SECONDS
  GROUP BY 1
),
lat AS (
  SELECT 2 AS level, epoch_us(t2) - epoch_us(t1) AS us FROM s2
  UNION ALL
  SELECT 3 AS level, epoch_us(t3) - epoch_us(t1) AS us FROM s3
)
SELECT CAST(level AS INT) AS level, count(*) AS n_users,
  CAST(min(us) AS BIGINT) AS min_us,
  (CAST(sum(us) AS DOUBLE) / count(*)) / 1e6 AS avg_s,
  CAST(max(us) AS BIGINT) AS max_us
FROM lat GROUP BY level
"""

QUERIES["funnel_latency"] = q_funnel_latency
ORACLES["funnel_latency"] = _FUNNEL_LATENCY_SQL


def q_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the user's
    most recent PRECEDING non-purchase event within 1 h ('none' if the
    purchase opens cold).  One carried window per user —
    ``last(non-purchase, ignorenulls)`` over rows up to the previous
    event — then a combinable groupBy; the avg gap is a division of
    exact integer microsecond sums (unrounded)."""
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.last(
        F.when(
            F.col("event_type") != "purchase",
            F.struct(F.unix_micros(F.col("ts")).alias("us"), F.col("event_type")),
        ),
        ignorenulls=True,
    ).over(w)
    purchases = (
        ev.select("user_id", "ts", "event_id", "event_type", prev.alias("__p"))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("__p").isNotNull()
                & (F.unix_micros(F.col("ts")) - F.col("__p.us") <= 3600 * 1_000_000),
                F.col("__p.event_type"),
            )
            .otherwise(F.lit("none"))
            .alias("attributed_to"),
            F.when(
                F.col("__p").isNotNull()
                & (F.unix_micros(F.col("ts")) - F.col("__p.us") <= 3600 * 1_000_000),
                F.unix_micros(F.col("ts")) - F.col("__p.us"),
            ).alias("gap_us"),
        )
    )
    return purchases.groupBy("attributed_to").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        ((F.sum("gap_us").cast("double") / F.count("gap_us")) / F.lit(1.0e6)).alias(
            "avg_gap_s"
        ),
    )


_ATTRIBUTION_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_type,
    last_value(
      CASE WHEN event_type <> 'purchase'
           THEN struct_pack(us := epoch_us(ts), et := event_type) END
      IGNORE NULLS
    ) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p
  FROM events
),
purchases AS (
  SELECT
    CASE WHEN p IS NOT NULL AND epoch_us(ts) - p.us <= 3600000000
         THEN p.et ELSE 'none' END AS attributed_to,
    CASE WHEN p IS NOT NULL AND epoch_us(ts) - p.us <= 3600000000
         THEN epoch_us(ts) - p.us END AS gap_us
  FROM marked WHERE event_type = 'purchase'
)
SELECT attributed_to, count(*) AS n_purchases,
  (CAST(sum(gap_us) AS DOUBLE) / count(gap_us)) / 1e6 AS avg_gap_s
FROM purchases GROUP BY attributed_to
"""

QUERIES["purchase_attribution"] = q_purchase_attribution
ORACLES["purchase_attribution"] = _ATTRIBUTION_SQL


def q_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B split (variant = user_id parity):
    did variant B's view→purchase conversion rate differ?  One row:
    per-variant exposed/converted counts, rates, and the pooled-variance
    z statistic — every input an exact integer, every downstream op a
    single IEEE step (sqrt correctly rounded), mirrored in the oracle.
    Plan: one combinable per-user aggregate, one 1-row reduce."""
    ev = load_table(spark, "events", sf_dir)
    # conversion = purchase within 1 h of the FIRST view (lifetime
    # conversion saturates at ~1.0 in this corpus → pooled variance 0)
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("__t1"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("__tp")
    )
    per_user = (
        views.join(purch, "user_id", "left")
        .groupBy("user_id")
        .agg(
            F.max(
                (
                    F.col("__tp").isNotNull()
                    & (F.col("__tp") > F.col("__t1"))
                    & (F.col("__tp") <= F.col("__t1") + 3600 * 1_000_000)
                ).cast("int")
            ).alias("conv")
        )
        .select(F.pmod(F.col("user_id"), F.lit(2)).alias("variant"), "conv")
    )
    agg = per_user.groupBy().agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0)).alias("c_b"),
    )
    p_a = F.col("c_a").cast("double") / F.col("n_a")
    p_b = F.col("c_b").cast("double") / F.col("n_b")
    p_pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        p_pool
        * (F.lit(1.0) - p_pool)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return agg.select(
        "n_a", "c_a", "n_b", "c_b",
        # empty-arm guard: Spark 0/0 gives NaN, DuckDB float /0 gives NULL
        # — emit NULL on both engines when an arm has no exposed users
        F.when(F.col("n_a") > 0, p_a).alias("rate_a"),
        F.when(F.col("n_b") > 0, p_b).alias("rate_b"),
        # degenerate pools (0% or 100% conversion everywhere) have zero
        # pooled variance — the test is undefined, emit NULL not a crash
        F.when((F.col("n_a") > 0) & (F.col("n_b") > 0) & (se > 0), (p_b - p_a) / se)
        .alias("z"),
    )


_AB_ZTEST_SQL = """
WITH views AS (
  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
per_user AS (
  SELECT v.user_id % 2 AS variant,
    max(CASE WHEN p.ts IS NOT NULL
              AND epoch_us(p.ts) > v.t1
              AND epoch_us(p.ts) <= v.t1 + 3600000000
             THEN 1 ELSE 0 END) AS conv
  FROM views v
  LEFT JOIN events p
    ON p.user_id = v.user_id AND p.event_type = 'purchase'
  GROUP BY v.user_id
),
agg AS (
  SELECT
    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS c_a,
    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS c_b
  FROM per_user
)
SELECT n_a, c_a, n_b, c_b,
  CASE WHEN n_a > 0 THEN CAST(c_a AS DOUBLE) / n_a END AS rate_a,
  CASE WHEN n_b > 0 THEN CAST(c_b AS DOUBLE) / n_b END AS rate_b,
  CASE WHEN n_a > 0 AND n_b > 0
        AND sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                 * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                 * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) > 0
  THEN (CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
    / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
           * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
           * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
  END AS z
FROM agg
"""

QUERIES["ab_test_ztest"] = q_ab_test_ztest
ORACLES["ab_test_ztest"] = _AB_ZTEST_SQL


def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival over user lifetimes (days from first to last
    event; users still active on the corpus' final day are CENSORED, not
    events): per distinct event-time, the at-risk count, event count, and
    the KM survival estimate.  Determinism: d/n are exact integers, each
    factor's ln is libm-identical, per-step log terms quantized to 1e-9
    BIGINTs and summed exactly in a cumulative window over the ≤31-row
    lifetime grid, survival = exp(logsum) — same libm exp both engines.
    Plan: one per-user aggregate, one combinable lifetime groupBy, two
    windows over the day-grid-sized frame."""
    ev = load_table(spark, "events", sf_dir)
    corpus_max = ev.agg(F.max(F.col("ts").cast("long")).alias("__cm"))
    lives = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("long")).alias("__first"),
            F.max(F.col("ts").cast("long")).alias("__last"),
        )
        .crossJoin(F.broadcast(corpus_max))
        .select(
            F.floor((F.col("__last") - F.col("__first")) / 86400)
            .cast("long")
            .alias("t"),
            # censored = still active in the corpus' final day
            (F.col("__last") >= F.col("__cm") - 86400).cast("int").alias("censored"),
        )
    )
    grid = lives.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_ending"),
        F.sum(F.lit(1) - F.col("censored")).alias("d_events"),
    )
    from pyspark.sql import Window

    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wtot = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # lifetime grid is calendar-bounded (≤ span days) — keyless windows OK
    at_risk = F.sum("n_ending").over(wtot) - F.coalesce(
        F.sum("n_ending").over(wcum), F.lit(0)
    )
    staged = grid.select(
        "t",
        "n_ending",
        "d_events",
        at_risk.alias("n_at_risk"),
    ).select(
        "t",
        "n_at_risk",
        "d_events",
        # a grid row where EVERYONE at risk events (n_at_risk == d_events)
        # has factor 0 → survival drops to exactly 0 from here on.  ln(0)
        # is NULL in Spark but an error in DuckDB, so both sides use a
        # −1e12 sentinel instead: exp((−1e12 + anything)/1e9) ≤ exp(−990)
        # underflows to IEEE +0.0 deterministically on both engines.
        F.when(
            F.col("n_at_risk") > F.col("d_events"),
            F.floor(
                F.log(
                    (F.col("n_at_risk") - F.col("d_events")).cast("double")
                    / F.col("n_at_risk")
                )
                * F.lit(1.0e9)
                + F.lit(0.5)
            ).cast("long"),
        )
        .otherwise(F.lit(-1_000_000_000_000))
        .alias("__l9"),
    )
    wkm = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return staged.select(
        "t",
        "n_at_risk",
        "d_events",
        F.exp(F.sum("__l9").over(wkm) / F.lit(1.0e9)).alias("survival"),
    )


_SURVIVAL_KM_SQL = """
WITH cm AS (SELECT max(floor(epoch(ts))) AS corpus_max FROM events),
lives AS (
  SELECT
    CAST(floor((max(floor(epoch(ts))) - min(floor(epoch(ts)))) / 86400)
         AS BIGINT) AS t,
    CASE WHEN max(floor(epoch(ts))) >= (SELECT corpus_max FROM cm) - 86400
         THEN 1 ELSE 0 END AS censored
  FROM events GROUP BY user_id
),
grid AS (
  SELECT t, count(*) AS n_ending,
    CAST(sum(1 - censored) AS BIGINT) AS d_events
  FROM lives GROUP BY t
),
staged AS (
  SELECT t, n_ending, d_events,
    sum(n_ending) OVER () - coalesce(sum(n_ending) OVER (
      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS n_at_risk
  FROM grid
),
logs AS (
  SELECT t, n_at_risk, d_events,
    CASE WHEN n_at_risk > d_events
      THEN CAST(floor(ln(CAST(n_at_risk - d_events AS DOUBLE) / n_at_risk)
                      * 1e9 + 0.5) AS BIGINT)
      ELSE CAST(-1000000000000 AS BIGINT)
    END AS l9
  FROM staged
)
SELECT t, CAST(n_at_risk AS BIGINT) AS n_at_risk, d_events,
  exp(sum(l9) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) / 1e9) AS survival
FROM logs
"""

QUERIES["survival_km"] = q_survival_km
ORACLES["survival_km"] = _SURVIVAL_KM_SQL


def q_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% CI for the mean purchase value
    (profile.bootstrap_ci, Chamandy et al. 2012): 100 hash-deterministic
    Poisson(1) reweightings, exact integer replicate sums, exact-rank
    percentile endpoints — the zero-coordination uncertainty estimate for
    data-parallel metrics."""
    from cerebro_spark.operators.profile import bootstrap_ci

    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    return bootstrap_ci(ev, "value", "event_id", b=100)


def _bootstrap_sql() -> str:
    from cerebro_spark.operators.profile import POISSON1_THRESHOLDS
    from cerebro_spark.queries.extensions import _hex2long_sql

    u = (
        _hex2long_sql(
            "md5(CAST(event_id AS VARCHAR) || ':' || CAST(r AS VARCHAR))", 8
        )
        + " % 1000000"
    )
    w = "CASE "
    for k, t in enumerate(POISSON1_THRESHOLDS):
        w += f"WHEN {u} < {t} THEN {k} "
    w += "ELSE 8 END"
    return f"""
WITH base AS (
  SELECT event_id, CAST(floor(value * 10000 + 0.5) AS BIGINT) AS q
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
),
reps AS (
  SELECT r,
    CAST(sum(({w}) * q) AS BIGINT) AS s,
    CAST(sum({w}) AS BIGINT) AS c
  FROM base, generate_series(0, 99) AS g(r)
  GROUP BY r
),
means AS (
  SELECT r, CASE WHEN c > 0 THEN CAST(s AS DOUBLE) / (10000.0 * c) END AS m
  FROM reps
),
ranked AS (
  SELECT m, row_number() OVER (ORDER BY m ASC NULLS LAST, r ASC) AS rk
  FROM means
),
ci AS (
  SELECT max(CASE WHEN rk = 3 THEN m END) AS ci_lo,
         max(CASE WHEN rk = 98 THEN m END) AS ci_hi
  FROM ranked
),
point AS (
  SELECT count(*) AS n,
    CAST(sum(q) AS DOUBLE) / (10000.0 * count(*)) AS mean
  FROM base
)
SELECT n, 100 AS b, mean, ci_lo, ci_hi FROM point, ci
"""


QUERIES["bootstrap_ci_mean"] = q_bootstrap_ci_mean
ORACLES["bootstrap_ci_mean"] = _bootstrap_sql()


def q_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the A/B split (Deng et al., WSDM'13):
    covariate X = each user's pre-period value mass (events before the
    corpus-midpoint timestamp), metric Y = post-period mass, variant =
    user parity.  θ = cov(X,Y)/var(X) from EXACT fixed-point integer sums
    (e2 per-event quantization); the adjusted lift is
    (Ȳ_b − θ·X̄_b) − (Ȳ_a − θ·X̄_a) and var_reduction = ρ²(X,Y).  Every
    double is derived from the shared integers by an identical IEEE chain.

    Plan: 1-row midpoint scalar broadcast onto the scan, one combinable
    per-user groupBy, one 1-row reduce.  Overflow bound: n·Σx·y must stay
    representable — sums leave BIGINT for double before the θ products
    (exact through 2^53, identically rounded past it on both engines).
    """
    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    mid = ev.agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long").alias("__mid")
    )
    q = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    t = F.unix_micros("ts")
    from cerebro_spark.operators.profile import cuped_lift

    per_user = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(t < F.col("__mid"), q).otherwise(F.lit(0))).alias("x"),
            F.sum(F.when(t >= F.col("__mid"), q).otherwise(F.lit(0))).alias("y"),
        )
        .select(F.pmod(F.col("user_id"), F.lit(2)).alias("variant"), "x", "y")
    )
    return cuped_lift(per_user, scale=100)


_CUPED_SQL = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS q
  FROM events WHERE value IS NOT NULL
),
mid AS (
  SELECT CAST(floor((min(t) + max(t)) / 2.0) AS BIGINT) AS mid FROM ev
),
per_user AS (
  SELECT user_id % 2 AS variant,
    CAST(sum(CASE WHEN t < mid THEN q ELSE 0 END) AS BIGINT) AS x,
    CAST(sum(CASE WHEN t >= mid THEN q ELSE 0 END) AS BIGINT) AS y
  FROM ev, mid GROUP BY user_id
),
agg AS (
  SELECT count(*) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
    CAST(sum(x * y) AS BIGINT) AS sxy,
    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN variant = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_a,
    CAST(sum(CASE WHEN variant = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_a,
    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(sum(CASE WHEN variant = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_b,
    CAST(sum(CASE WHEN variant = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_b
  FROM per_user
)
SELECT n, n_a, n_b,
  CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
       THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
  END AS theta,
  CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
        AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
       THEN ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
          * ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
  END AS var_reduction,
  (CASE WHEN n_b > 0 THEN CAST(sy_b AS DOUBLE) / (100.0 * n_b) END
   - CASE WHEN n_a > 0 THEN CAST(sy_a AS DOUBLE) / (100.0 * n_a) END)
  AS diff_raw,
  ((CASE WHEN n_b > 0 THEN CAST(sy_b AS DOUBLE) / (100.0 * n_b) END
    - (CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
            THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) END)
      * CASE WHEN n_b > 0 THEN CAST(sx_b AS DOUBLE) / (100.0 * n_b) END)
   - (CASE WHEN n_a > 0 THEN CAST(sy_a AS DOUBLE) / (100.0 * n_a) END
    - (CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
            THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) END)
      * CASE WHEN n_a > 0 THEN CAST(sx_a AS DOUBLE) / (100.0 * n_a) END))
  AS diff_cuped
FROM agg
"""

QUERIES["cuped_adjust"] = q_cuped_adjust
ORACLES["cuped_adjust"] = _CUPED_SQL


def q_calibration_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins + exact ECE feed (profile.calibration_bins)
    for a deterministic baseline scorer (md5 of event_id → [0,1)) against
    the purchase label: per bin, exact-integer conf/acc/gap — the gate for
    the binning and the shared-numerator exactness trick; an informative
    scorer plugs into the same operator unchanged."""
    from cerebro_spark.operators.profile import calibration_bins

    ev = load_table(spark, "events", sf_dir)
    score = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
               16, 10).cast("long") % 1_000_000
    ).cast("double") / 1_000_000.0
    scored = ev.select(
        score.alias("score"),
        (F.col("event_type") == "purchase").alias("label"),
    )
    return calibration_bins(scored, "score", "label", bins=10)


def _calibration_sql() -> str:
    from cerebro_spark.queries.extensions import _hex2long_sql

    h = _hex2long_sql("md5(CAST(event_id AS VARCHAR))", 8) + " % 1000000"
    return f"""
WITH scored AS (
  SELECT CAST({h} AS DOUBLE) / 1000000.0 AS score,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lab
  FROM events
),
agg AS (
  SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin,
    count(*) AS n,
    CAST(sum(CAST(floor(score * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS s,
    CAST(sum(lab) AS BIGINT) AS c
  FROM scored GROUP BY 1
)
SELECT bin, n,
  CAST(s AS DOUBLE) / (1e6 * n) AS conf,
  CAST(c AS DOUBLE) / n AS acc,
  CAST(1000000 * c - s AS DOUBLE) / (1e6 * n) AS gap,
  1000000 * c - s AS gap_num
FROM agg
"""


QUERIES["calibration_events"] = q_calibration_events
ORACLES["calibration_events"] = _calibration_sql()


def q_winsorized_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5/95 winsorized mean of value per event_type
    (profile.winsorized_mean): exact-rank quantiles and clamp-sums over a
    VALUE-GRID histogram — the data volume never passes through a window;
    rank arithmetic stays in BIGINTs (rational quantile fractions)."""
    from cerebro_spark.operators.profile import winsorized_mean

    ev = load_table(spark, "events", sf_dir)
    return winsorized_mean(ev, "value", keys=["event_type"])


_WINSORIZED_SQL = """
WITH grid AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS q,
    count(*) AS c, CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
cum AS (
  SELECT *, CAST(sum(c) OVER (PARTITION BY event_type ORDER BY q
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumc
  FROM grid
),
tot AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS rawsum
  FROM grid GROUP BY 1
),
bounds AS (
  SELECT g.event_type,
    min(CASE WHEN g.cumc >= CAST(floor((5 * t.n + 99) / 100.0) AS BIGINT) THEN g.q END) AS lo,
    min(CASE WHEN g.cumc >= CAST(floor((95 * t.n + 99) / 100.0) AS BIGINT) THEN g.q END) AS hi,
    min(t.n) AS n, min(t.rawsum) AS rawsum
  FROM cum g JOIN tot t USING (event_type)
  GROUP BY 1
)
SELECT b.event_type, b.n AS n,
  CAST(b.lo AS DOUBLE) / 100 AS p_lo,
  CAST(b.hi AS DOUBLE) / 100 AS p_hi,
  CAST(sum(greatest(least(g.q, b.hi), b.lo) * g.c) AS DOUBLE)
    / (100.0 * b.n) AS win_mean,
  CAST(b.rawsum AS DOUBLE) / (100.0 * b.n) AS raw_mean
FROM grid g JOIN bounds b USING (event_type)
GROUP BY 1, 2, 3, 4, b.rawsum
"""

QUERIES["winsorized_value"] = q_winsorized_value
ORACLES["winsorized_value"] = _WINSORIZED_SQL


def q_conformal_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal 90% prediction intervals for value per event_type
    (profile.conformal_interval): 50/25/25 md5 split, exact fixed-point
    group-mean predictor, integer-rank q̂ = ⌈(n+1)·0.9⌉-th residual over a
    cap_per_key-bounded calibration set, exact test coverage."""
    from cerebro_spark.operators.profile import conformal_interval

    ev = load_table(spark, "events", sf_dir)
    return conformal_interval(ev, "value", "event_type", "event_id")


def _conformal_sql() -> str:
    from cerebro_spark.queries.extensions import _hex2long_sql

    b = _hex2long_sql("md5(CAST(event_id AS VARCHAR))", 8) + " % 100"
    return f"""
WITH base AS (
  SELECT event_type AS grp, event_id AS id, value AS v,
    CAST(floor(value * 10000 + 0.5) AS BIGINT) AS q,
    {b} AS b
  FROM events WHERE value IS NOT NULL
),
pred AS (
  SELECT grp, count(*) AS n_train,
    CAST(sum(q) AS DOUBLE) / (10000.0 * count(*)) AS pred
  FROM base WHERE b < 50 GROUP BY 1
),
cal_all AS (
  SELECT c.grp, c.id, abs(c.v - p.pred) AS res,
    row_number() OVER (
      PARTITION BY c.grp
      ORDER BY md5(CAST(c.id AS VARCHAR)) ASC, c.id ASC
    ) AS cap_rank
  FROM base c JOIN pred p USING (grp)
  WHERE c.b >= 50 AND c.b < 75
),
cal AS (SELECT * FROM cal_all WHERE cap_rank <= 1000),
ncal AS (SELECT grp, count(*) AS n_calib FROM cal GROUP BY 1),
qhat AS (
  SELECT grp, n_calib, res AS qhat FROM (
    SELECT c.grp, n.n_calib, c.res,
      row_number() OVER (PARTITION BY c.grp ORDER BY c.res ASC, c.id ASC) AS rn,
      least(CAST(floor(((n.n_calib + 1) * 9 + 9) / 10.0) AS BIGINT),
            n.n_calib) AS tgt
    FROM cal c JOIN ncal n USING (grp)
  ) WHERE rn = tgt
)
SELECT t.grp AS event_type,
  min(p.n_train) AS n_train, min(h.n_calib) AS n_calib,
  count(*) AS n_test, min(p.pred) AS pred, min(h.qhat) AS qhat,
  CAST(sum(CASE WHEN abs(t.v - p.pred) <= h.qhat THEN 1 ELSE 0 END) AS DOUBLE)
    / count(*) AS coverage
FROM base t JOIN pred p USING (grp) JOIN qhat h ON h.grp = t.grp
WHERE t.b >= 75
GROUP BY 1
"""


QUERIES["conformal_value"] = q_conformal_value
ORACLES["conformal_value"] = _conformal_sql()


def q_golden_user_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge per user (cluster.golden_record): each attribute
    independently takes its most recent NON-NULL value (freshest-wins,
    (ts, event_id) recency key) over an event log with deterministically
    synthesized NULL holes — the MDM golden-record step after entity
    resolution.  One combinable max_by groupBy; no window, skew-safe."""
    from cerebro_spark.operators.cluster import golden_record

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id",
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value")).alias("value"),
        F.when(F.col("event_id") % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("props")).alias("props"),
        "event_type",
    )
    out = golden_record(
        ev, "user_id", "ts", ["value", "props", "event_type"],
        id_col="event_id",
    )
    return out.withColumnRenamed("cluster", "user_id")


_GOLDEN_RECORD_SQL = """
WITH holes AS (
  SELECT user_id, ts, event_id,
    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value,
    CASE WHEN event_id % 11 = 0 THEN NULL ELSE props END AS props,
    event_type
  FROM events
)
SELECT user_id, count(*) AS n_members, max(ts) AS last_ts,
  (max({'nn': value IS NOT NULL, 'ts': ts, 'id': event_id, 'a': value})).a
    AS value,
  (max({'nn': props IS NOT NULL, 'ts': ts, 'id': event_id, 'a': props})).a
    AS props,
  (max({'nn': event_type IS NOT NULL, 'ts': ts, 'id': event_id,
        'a': event_type})).a AS event_type
FROM holes GROUP BY 1
"""

QUERIES["golden_user_record"] = q_golden_user_record
ORACLES["golden_user_record"] = _GOLDEN_RECORD_SQL


def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for the user-parity A/B split: a
    50/50 assignment with traffic counts (n_a, n_b) has goodness-of-fit
    χ² = (n_a−n_b)²/n EXACTLY (the two-cell Pearson statistic collapses
    algebraically) — one integer-sum reduce and a single division, with
    the 95% flag against the literal 3.841 df=1 critical value.  SRM is
    the first thing to check before reading ab_test_ztest/cuped_adjust:
    a mismatched split invalidates both."""
    ev = load_table(spark, "events", sf_dir)
    users = ev.select("user_id").distinct()
    agg = users.groupBy().agg(
        F.sum(F.when(F.pmod(F.col("user_id"), F.lit(2)) == 0, 1)
              .otherwise(0)).alias("n_a"),
        F.sum(F.when(F.pmod(F.col("user_id"), F.lit(2)) == 1, 1)
              .otherwise(0)).alias("n_b"),
    )
    n = F.col("n_a") + F.col("n_b")
    d = F.col("n_a") - F.col("n_b")
    chi2 = F.when(n > 0, (d * d).cast("double") / n.cast("double"))
    return agg.select(
        "n_a", "n_b",
        chi2.alias("chi2"),
        F.when(n > 0, chi2 > 3.841458820694124).alias("srm"),
    )


_SRM_SQL = """
WITH users AS (SELECT DISTINCT user_id FROM events),
agg AS (
  SELECT
    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM users
)
SELECT n_a, n_b,
  CASE WHEN n_a + n_b > 0
       THEN CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
            / CAST(n_a + n_b AS DOUBLE) END AS chi2,
  CASE WHEN n_a + n_b > 0
       THEN (CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
             / CAST(n_a + n_b AS DOUBLE)) > 3.841458820694124 END AS srm
FROM agg
"""

QUERIES["srm_check"] = q_srm_check
ORACLES["srm_check"] = _SRM_SQL


def q_mi_event_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (profile.mutual_info): how many nats of the
    event-type distribution does the hour of day carry?  The effect-SIZE
    companion to chi2_event_hour's significance test — e6-quantized ln
    terms summed exactly (operator docstring), single-row engine-exact
    summary with the symmetric NMI normalization."""
    from cerebro_spark.operators.profile import mutual_info

    ev = load_table(spark, "events", sf_dir)
    return mutual_info(ev, F.col("event_type"), F.hour(F.col("ts")))


_MI_SQL = """
WITH cells AS (
  SELECT event_type AS a, hour(ts) AS b, count(*) AS o
  FROM events
  WHERE event_type IS NOT NULL AND hour(ts) IS NOT NULL
  GROUP BY 1, 2
),
ra AS (SELECT a, sum(o) AS ra FROM cells GROUP BY 1),
cb AS (SELECT b, sum(o) AS cb FROM cells GROUP BY 1),
tot AS (SELECT sum(o) AS n FROM cells),
mi AS (
  SELECT sum(CAST(floor(
    (CAST(o AS DOUBLE) / n) * ln(CAST(o * n AS DOUBLE) / CAST(ra * cb AS DOUBLE))
    * 1e6 + 0.5) AS BIGINT)) AS mi6
  FROM cells JOIN ra USING (a) JOIN cb USING (b), tot
),
ha AS (
  SELECT sum(CAST(floor(
    -(CAST(ra AS DOUBLE) / n) * ln(CAST(ra AS DOUBLE) / n) * 1e6 + 0.5)
    AS BIGINT)) AS ha6
  FROM ra, tot
),
hb AS (
  SELECT sum(CAST(floor(
    -(CAST(cb AS DOUBLE) / n) * ln(CAST(cb AS DOUBLE) / n) * 1e6 + 0.5)
    AS BIGINT)) AS hb6
  FROM cb, tot
)
SELECT CAST(n AS BIGINT) AS n,
  mi6 / 1e6 AS mi_nats,
  ha6 / 1e6 AS h_a,
  hb6 / 1e6 AS h_b,
  CASE WHEN ha6 > 0 AND hb6 > 0
       THEN (mi6 / 1e6) / sqrt((ha6 / 1e6) * (hb6 / 1e6)) END AS nmi
FROM mi, ha, hb, tot
"""

QUERIES["mi_event_hour"] = q_mi_event_hour
ORACLES["mi_event_hour"] = _MI_SQL


def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact audience overlap (profile.audience_overlap): distinct-user
    intersection + Jaccard for every co-occurring event-type pair, via the
    per-user sorted-set pair explode (one distinct + one combinable
    pair count — no fact self-join; operator docstring)."""
    from cerebro_spark.operators.profile import audience_overlap

    ev = load_table(spark, "events", sf_dir)
    return audience_overlap(ev, "user_id", "event_type")


_AUDIENCE_OVERLAP_SQL = """
WITH ut AS (
  SELECT DISTINCT user_id AS k, event_type AS c
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
per AS (SELECT c, count(*) AS n FROM ut GROUP BY 1),
ov AS (
  SELECT x.c AS cat_a, y.c AS cat_b, count(*) AS overlap
  FROM ut x JOIN ut y ON x.k = y.k AND x.c < y.c
  GROUP BY 1, 2
)
SELECT cat_a, cat_b,
  CAST(pa.n AS BIGINT) AS keys_a, CAST(pb.n AS BIGINT) AS keys_b,
  CAST(overlap AS BIGINT) AS overlap,
  CAST(overlap AS DOUBLE) / (pa.n + pb.n - overlap) AS jaccard
FROM ov JOIN per pa ON ov.cat_a = pa.c JOIN per pb ON ov.cat_b = pb.c
"""

QUERIES["audience_overlap"] = q_audience_overlap
ORACLES["audience_overlap"] = _AUDIENCE_OVERLAP_SQL


def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution (profile.markov_attribution):
    absorbing-chain conversion probability with each channel knocked out,
    normalized into attribution shares — transitions computed in Spark,
    the bounded matrix solved by exact fixed-point integer iterations
    (operator docstring); the oracle unrolls the identical HUGEINT
    recurrence."""
    from cerebro_spark.operators.profile import markov_attribution

    ev = load_table(spark, "events", sf_dir)
    return markov_attribution(ev, iterations=25)


def _markov_sql(k: int = 25) -> str:
    """DuckDB twin of profile.markov_attribution (identical per-edge-floor
    integer recurrence on HUGEINT)."""
    its = []
    for j in range(1, k + 1):
        its.append(f"""
a{j} AS MATERIALIZED (
  SELECT g.run, g.s,
    coalesce(sum(
      CASE WHEN t.dst = 'conv'
             THEN (CAST(1000000000000 AS HUGEINT) * t.c) // t.tot
           WHEN ap.a IS NOT NULL THEN (ap.a * t.c) // t.tot
           ELSE CAST(0 AS HUGEINT) END
    ), 0) AS a
  FROM grid g
  LEFT JOIN tr t ON t.run = g.run AND t.src = g.s
  LEFT JOIN a{j - 1} ap ON ap.run = g.run AND ap.s = t.dst
  GROUP BY 1, 2
)""")
    return f"""
WITH ev AS (
  SELECT user_id AS u, event_type AS ty,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC) AS rn
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
ev2 AS (
  SELECT *,
    min(CASE WHEN ty = 'purchase' THEN rn END)
      OVER (PARTITION BY u) AS conv_rn,
    max(rn) OVER (PARTITION BY u) AS max_rn
  FROM ev
),
kept AS (SELECT * FROM ev2 WHERE conv_rn IS NULL OR rn <= conv_rn),
steps AS (
  SELECT coalesce(lag(ty) OVER (PARTITION BY u ORDER BY rn ASC), 'start')
      AS src,
    CASE WHEN ty = 'purchase' THEN 'conv' ELSE ty END AS dst,
    ty, rn, conv_rn, max_rn
  FROM kept
),
trans AS (
  SELECT src, dst, count(*) AS c FROM (
    SELECT src, dst FROM steps
    UNION ALL
    SELECT ty AS src, 'null' AS dst FROM steps
    WHERE conv_rn IS NULL AND rn = max_rn
  ) GROUP BY 1, 2
),
tot AS (SELECT src AS s, sum(c) AS tot FROM trans GROUP BY 1),
states AS (SELECT s FROM tot),
runs AS (
  SELECT 'full' AS run UNION ALL SELECT s FROM states WHERE s <> 'start'
),
grid AS MATERIALIZED (SELECT run, s FROM runs, states),
tr AS MATERIALIZED (
  SELECT g.run, t.src, t.dst, t.c, tt.tot
  FROM runs g JOIN trans t ON NOT (g.run <> 'full' AND t.dst = g.run)
  JOIN tot tt ON tt.s = t.src
),
a0 AS (SELECT run, s, CAST(0 AS HUGEINT) AS a FROM grid),{",".join(its)},
fullrun AS (
  SELECT a AS a_full FROM a{k} WHERE run = 'full' AND s = 'start'
),
rem AS (
  SELECT run AS channel, a AS a_rem FROM a{k}
  WHERE run <> 'full' AND s = 'start'
),
re AS (
  SELECT channel, a_full, a_rem,
    greatest(a_full - a_rem, CAST(0 AS HUGEINT)) AS re
  FROM rem, fullrun
),
tre AS (SELECT sum(re) AS t FROM re)
SELECT channel,
  CAST(a_full AS DOUBLE) / 1e12 AS p_conv,
  CAST(a_rem AS DOUBLE) / 1e12 AS p_conv_removed,
  CAST(re AS DOUBLE) / 1e12 AS removal_effect,
  CASE WHEN t > 0 THEN CAST(re AS DOUBLE) / CAST(t AS DOUBLE) END
    AS attribution_share
FROM re, tre
"""


_MARKOV_SQL = _markov_sql(25)

QUERIES["markov_attribution"] = q_markov_attribution
ORACLES["markov_attribution"] = _MARKOV_SQL


def q_msprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid sequential A/B monitor (profile.msprt_monitor): the
    mixture-SPRT log likelihood ratio and monotone always-valid p-value
    per day, arms = user_id parity, τ² = 25 — the peeking-safe companion
    to ab_test_ztest.  Exact cumulative integer moments, one fixed IEEE
    chain per day with logΛ rounded before exp (operator docstring); the
    oracle replays the identical chain."""
    from cerebro_spark.operators.profile import msprt_monitor

    ev = load_table(spark, "events", sf_dir).withColumn(
        "arm", F.pmod(F.col("user_id"), F.lit(2))
    )
    return msprt_monitor(
        ev, "arm", "value", "ts", tau2=25.0, arm_a=0, arm_b=1
    )


_MSPRT_SQL = """
WITH base AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         user_id % 2 AS arm,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS q
  FROM events WHERE value IS NOT NULL
),
daily AS (
  SELECT day,
    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na_d,
    SUM(CASE WHEN arm = 0 THEN q ELSE 0 END) AS sa_d,
    SUM(CASE WHEN arm = 0 THEN CAST(q AS HUGEINT) * q ELSE 0 END) AS ssa_d,
    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb_d,
    SUM(CASE WHEN arm = 1 THEN q ELSE 0 END) AS sb_d,
    SUM(CASE WHEN arm = 1 THEN CAST(q AS HUGEINT) * q ELSE 0 END) AS ssb_d
  FROM base GROUP BY 1
),
c AS (
  SELECT day,
    SUM(na_d) OVER w AS na, SUM(sa_d) OVER w AS sa, SUM(ssa_d) OVER w AS ssa,
    SUM(nb_d) OVER w AS nb, SUM(sb_d) OVER w AS sb, SUM(ssb_d) OVER w AS ssb
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
chain AS (
  SELECT day, na, nb,
    (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
     - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) / 1e6 AS delta_raw,
    (CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
      / (CAST(na AS DOUBLE) - 1.0) / 1e12 AS va,
    (CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
      / (CAST(nb AS DOUBLE) - 1.0) / 1e12 AS vb
  FROM c WHERE na >= 2 AND nb >= 2
),
stat AS (
  SELECT day, na, nb, delta_raw,
    round(0.5 * ln((va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE))
                   / ((va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE)) + 25.0))
          + delta_raw * delta_raw * 25.0
            / (2.0 * (va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE))
               * ((va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE)) + 25.0)),
          6) AS log_lambda
  FROM chain WHERE va > 0 AND vb > 0
)
SELECT day, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, round(delta_raw, 6) AS delta, log_lambda,
  MIN(round(least(1.0, exp(-log_lambda)), 6))
    OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS p_always
FROM stat
"""

QUERIES["msprt_monitor"] = q_msprt_monitor
ORACLES["msprt_monitor"] = _MSPRT_SQL


def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common first-4-event user journeys per user-day
    (timeops.top_paths): deterministic (ts, event_id) ordering, path
    strings counted combinably, integer-exact top-20 (operator
    docstring)."""
    from cerebro_spark.operators.timeops import top_paths

    ev = load_table(spark, "events", sf_dir)
    return top_paths(ev, "user_id", "event_type", "ts", "event_id", 4, 86400, 20)


_TOP_PATHS_SQL = """
WITH seq AS (
  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, event_type,
    ROW_NUMBER() OVER (
      PARTITION BY user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT)
      ORDER BY ts, event_id) AS rn
  FROM events
),
p AS (
  SELECT user_id, day, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM seq WHERE rn <= 4 GROUP BY 1, 2
)
SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY 1
ORDER BY n_sessions DESC, path ASC LIMIT 20
"""

QUERIES["top_paths"] = q_top_paths
ORACLES["top_paths"] = _TOP_PATHS_SQL


def q_l_diversity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (profile.l_diversity): for the (event_type, day)
    quasi-identifier groups, how diverse the sensitive value-bucket is —
    the 20 most disclosing groups by distinct-l then entropy-l.  The
    privacy check k_anonymity_events misses (operator docstring);
    e6-quantized entropy terms, exact counts."""
    from cerebro_spark.operators.profile import l_diversity

    ev = load_table(spark, "events", sf_dir).withColumn(
        "value_bucket", F.floor(F.col("value") / 100).cast("long")
    )
    return l_diversity(
        ev,
        [F.col("event_type"), F.date_trunc("day", F.col("ts"))],
        "value_bucket",
        worst_k=20,
    )


_L_DIVERSITY_SQL = """
WITH cells AS (
  SELECT event_type AS qi_0, date_trunc('day', ts) AS qi_1,
         CAST(floor(value / 100) AS BIGINT) AS s, COUNT(*) AS c
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2, 3
),
tot AS (
  SELECT qi_0, qi_1, SUM(c) AS n, COUNT(*) AS l_distinct
  FROM cells GROUP BY 1, 2
),
ent AS (
  SELECT cells.qi_0, cells.qi_1,
    SUM(c * CAST(floor(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6 + 0.5)
               AS BIGINT)) AS hsum
  FROM cells JOIN tot USING (qi_0, qi_1) GROUP BY 1, 2
)
SELECT tot.qi_0, tot.qi_1, CAST(n AS BIGINT) AS n, l_distinct,
  round(exp(-(CAST(hsum AS DOUBLE) / CAST(n AS DOUBLE)) / 1e6), 6) AS l_entropy
FROM tot JOIN ent USING (qi_0, qi_1)
ORDER BY l_distinct ASC, l_entropy ASC, qi_0 ASC, qi_1 ASC LIMIT 20
"""

QUERIES["l_diversity_events"] = q_l_diversity_events
ORACLES["l_diversity_events"] = _L_DIVERSITY_SQL


def q_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution (timeops.time_decay_attribution):
    view/click touches within 7 days of a purchase earn 2^(-dt/1d)
    credit — per-pair e9-quantized decay, exact channel sums, bucket-
    exploded interval equi-join (operator docstring)."""
    from cerebro_spark.operators.timeops import time_decay_attribution

    ev = load_table(spark, "events", sf_dir)
    return time_decay_attribution(
        ev, "user_id", "event_type", "ts", "purchase", ["view", "click"],
        604800, 86400, 86400,
    )


_TIME_DECAY_SQL = """
WITH conv AS (
  SELECT user_id, epoch(ts) AS tp FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, event_type AS channel, epoch(ts) AS tt
  FROM events WHERE event_type IN ('view', 'click')
),
w AS (
  SELECT channel,
    CAST(floor(exp(-(tp - tt) * 0.6931471805599453 / 86400.0) * 1e9 + 0.5)
         AS BIGINT) AS we9
  FROM touch JOIN conv USING (user_id)
  WHERE tt >= tp - 604800.0 AND tt <= tp
),
agg AS (SELECT channel, COUNT(*) AS touches, SUM(we9) AS sw FROM w GROUP BY 1)
SELECT channel, touches,
  round(CAST(sw AS DOUBLE) / 1e9, 6) AS weight,
  round(CAST(sw AS DOUBLE) / CAST(SUM(sw) OVER () AS DOUBLE), 6) AS share
FROM agg
"""

QUERIES["time_decay_attribution"] = q_time_decay_attribution
ORACLES["time_decay_attribution"] = _TIME_DECAY_SQL


def q_info_gain_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information-gain feature shortlist (profile.info_gain_ranking):
    four candidate features ranked by MI against the value-bucket label
    in ONE events scan (projection-side melt) — e6-quantized terms, the
    mutual_info contract, integer ordering key (operator docstring)."""
    from cerebro_spark.operators.profile import info_gain_ranking

    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    t = F.col("ts").cast("double")
    return info_gain_ranking(
        ev.withColumn("label", F.floor(F.col("value") / 250).cast("long")),
        {
            "event_type": F.col("event_type"),
            "hour": F.floor(t / 3600) % 24,
            "weekday": F.floor(t / 86400) % 7,
            "user_mod10": F.pmod(F.col("user_id"), F.lit(10)),
        },
        "label",
    )


_INFO_GAIN_SQL = """
WITH melted AS (
  SELECT * FROM (
    SELECT 'event_type' AS f, CAST(event_type AS VARCHAR) AS v,
           CAST(CAST(floor(value / 250) AS BIGINT) AS VARCHAR) AS l
    FROM events WHERE value IS NOT NULL
    UNION ALL
    SELECT 'hour', CAST(CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS VARCHAR),
           CAST(CAST(floor(value / 250) AS BIGINT) AS VARCHAR)
    FROM events WHERE value IS NOT NULL
    UNION ALL
    SELECT 'weekday', CAST(CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7 AS VARCHAR),
           CAST(CAST(floor(value / 250) AS BIGINT) AS VARCHAR)
    FROM events WHERE value IS NOT NULL
    UNION ALL
    SELECT 'user_mod10', CAST(user_id % 10 AS VARCHAR),
           CAST(CAST(floor(value / 250) AS BIGINT) AS VARCHAR)
    FROM events WHERE value IS NOT NULL
  ) WHERE v IS NOT NULL AND l IS NOT NULL
),
cells AS (SELECT f, v, l, COUNT(*) AS o FROM melted GROUP BY 1, 2, 3),
rv AS (SELECT f, v, SUM(o) AS rv FROM cells GROUP BY 1, 2),
cl AS (SELECT f, l, SUM(o) AS cl FROM cells GROUP BY 1, 2),
nf AS (SELECT f, SUM(o) AS n FROM cells GROUP BY 1),
mi AS (
  SELECT cells.f,
    SUM(CAST(floor(
      (CAST(o AS DOUBLE) / n) * ln(CAST(o * n AS DOUBLE) / CAST(rv.rv * cl.cl AS DOUBLE))
      * 1e6 + 0.5) AS BIGINT)) AS mi6
  FROM cells JOIN rv USING (f, v) JOIN cl USING (f, l) JOIN nf USING (f)
  GROUP BY 1
),
hf AS (
  SELECT rv.f,
    SUM(CAST(floor(
      -(CAST(rv AS DOUBLE) / n) * ln(CAST(rv AS DOUBLE) / n) * 1e6 + 0.5)
      AS BIGINT)) AS hf6
  FROM rv JOIN nf USING (f)
  GROUP BY 1
)
SELECT mi.f AS feature, CAST(n AS BIGINT) AS n,
  mi6 / 1e6 AS mi_nats, hf6 / 1e6 AS h_feature,
  CASE WHEN hf6 > 0
       THEN round(CAST(mi6 AS DOUBLE) / CAST(hf6 AS DOUBLE), 6) END AS gain_ratio
FROM mi JOIN hf USING (f) JOIN nf USING (f)
ORDER BY mi6 DESC, feature ASC
"""

QUERIES["info_gain_ranking"] = q_info_gain_ranking
ORACLES["info_gain_ranking"] = _INFO_GAIN_SQL


def q_quantile_normalize_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantile normalization grid (profile.quantile_normalize):
    each event_type's value distribution mapped onto the corpus
    quantiles over the width-50 value grid — integer midranks, one
    DECIMAL integral division per cell, the repo's as-of join for the
    value-at-rank lookup (operator docstring)."""
    from cerebro_spark.operators.profile import quantile_normalize

    ev = load_table(spark, "events", sf_dir)
    return quantile_normalize(ev, "event_type", "value", 0.02)


_QUANTILE_NORMALIZE_SQL = """
WITH cells AS (
  SELECT event_type AS "group", CAST(floor(value * 0.02 + 0.5) AS BIGINT) AS q,
         COUNT(*) AS n_cell
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
probe AS (
  SELECT "group", q, n_cell,
    SUM(n_cell) OVER (PARTITION BY "group" ORDER BY q
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    SUM(n_cell) OVER (PARTITION BY "group") AS ng
  FROM cells
),
grid AS (SELECT q, SUM(n_cell) AS gc FROM cells GROUP BY 1),
g2 AS (
  SELECT q, gc,
    SUM(gc) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS gcum
  FROM grid
),
total AS (SELECT SUM(n_cell) AS n FROM cells),
pr AS (
  SELECT "group", q, n_cell,
    (CAST(2 * cum - n_cell + 1 AS HUGEINT) * n + 2 * ng - 1) // (2 * ng) AS rk
  FROM probe CROSS JOIN total
)
SELECT pr."group", pr.q, pr.n_cell,
  CAST(rk AS BIGINT) AS rank_target,
  CAST(g2.q AS DOUBLE) / 0.02 AS mapped_value
FROM pr JOIN g2 ON rk BETWEEN g2.gcum - g2.gc + 1 AND g2.gcum
"""

QUERIES["quantile_normalize_check"] = q_quantile_normalize_check
ORACLES["quantile_normalize_check"] = _QUANTILE_NORMALIZE_SQL


def q_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 snapshot (profile.scd2_snapshot_at): the
    dimension state AS OF the corpus-midpoint instant — every sampled
    user resolves to exactly ONE current version (half-open intervals).
    The time-travel verb over scd2_intervals; same deterministic run
    boundaries (operator docstrings)."""
    from cerebro_spark.operators.profile import scd2_collapse, scd2_snapshot_at

    ev = load_table(spark, "events", sf_dir).filter(F.col("user_id") % 5 == 0)
    t = F.col("ts").cast("double")
    mid = ev.agg(((F.min(t) + F.max(t)) / 2).alias("__mid"))
    iv = scd2_collapse(
        ev, key_cols=["user_id"], attr_cols=["event_type"],
        ts_col="ts", tiebreak_cols=["event_id"],
    )
    snap = scd2_snapshot_at(iv.crossJoin(F.broadcast(mid)), F.col("__mid"))
    return snap.select(
        "user_id",
        F.col("event_type").alias("event_type_at"),
        F.col("valid_from").alias("since"),
        "n_events",
    )


_SCD2_SNAPSHOT_SQL = f"""
WITH ivals AS ({_SCD2_SQL}),
mid AS (
  SELECT (epoch(MIN(ts)) + epoch(MAX(ts))) / 2 AS m
  FROM events WHERE user_id % 5 = 0
)
SELECT user_id, event_type AS event_type_at, valid_from AS since, n_events
FROM ivals CROSS JOIN mid
WHERE epoch(valid_from) <= m
  AND (valid_to IS NULL OR epoch(valid_to) > m)
"""

QUERIES["scd2_snapshot"] = q_scd2_snapshot
ORACLES["scd2_snapshot"] = _SCD2_SNAPSHOT_SQL


def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent events-table checksum (profile.table_fingerprint):
    256 bucket checksums over (event_id, user_id, event_type, e6 value,
    epoch second) — the reconciliation primitive that proves a
    migration/backfill byte-equal without shipping either table
    (operator docstring)."""
    from cerebro_spark.operators.profile import table_fingerprint

    ev = load_table(spark, "events", sf_dir)
    return table_fingerprint(
        ev,
        [
            F.col("event_id"),
            F.col("user_id"),
            F.col("event_type"),
            F.floor(F.col("value").cast("double") * F.lit(1.0e6) + F.lit(0.5))
            .cast("long"),
            F.floor(F.col("ts").cast("double")).cast("long"),
        ],
        buckets=256,
    )


def _table_fingerprint_sql() -> str:
    from cerebro_spark.queries.extensions import _hex2long_sql

    row = (
        "CONCAT_WS(chr(31), "
        "COALESCE(CAST(event_id AS VARCHAR), chr(0) || 'NULL'), "
        "COALESCE(CAST(user_id AS VARCHAR), chr(0) || 'NULL'), "
        "COALESCE(CAST(event_type AS VARCHAR), chr(0) || 'NULL'), "
        "COALESCE(CAST(CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS VARCHAR), chr(0) || 'NULL'), "
        "COALESCE(CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR), chr(0) || 'NULL'))"
    )
    h = _hex2long_sql(f"md5({row})", 15)
    return f"""
WITH hashed AS (SELECT {h} AS h FROM events)
SELECT h % 256 AS bucket, COUNT(*) AS n,
       CAST(SUM(CAST(h AS HUGEINT)) AS VARCHAR) AS checksum
FROM hashed GROUP BY 1
"""


QUERIES["table_fingerprint"] = q_table_fingerprint
ORACLES["table_fingerprint"] = _table_fingerprint_sql()


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile (profile.column_profile): completeness,
    cardinality and string-stable min/max for five events columns from
    a single scan via the projection-side melt (operator docstring)."""
    from cerebro_spark.operators.profile import column_profile

    ev = load_table(spark, "events", sf_dir)
    t = F.col("ts").cast("double")
    return column_profile(
        ev,
        {
            "event_id": F.col("event_id"),
            "user_id": F.col("user_id"),
            "event_type": F.col("event_type"),
            "value_e6": F.floor(F.col("value").cast("double") * F.lit(1.0e6) + F.lit(0.5)).cast("long"),
            "epoch_s": F.floor(t).cast("long"),
        },
    )


_COLUMN_PROFILE_SQL = """
WITH melted AS (
  SELECT 'event_id' AS col, CAST(event_id AS VARCHAR) AS v FROM events
  UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
  UNION ALL SELECT 'event_type', CAST(event_type AS VARCHAR) FROM events
  UNION ALL SELECT 'value_e6',
    CAST(CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS VARCHAR) FROM events
  UNION ALL SELECT 'epoch_s',
    CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR) FROM events
)
SELECT col AS "column", COUNT(*) AS n_rows, COUNT(v) AS n_nonnull,
  COUNT(*) - COUNT(v) AS n_null, COUNT(DISTINCT v) AS n_distinct,
  MIN(v) AS min_value, MAX(v) AS max_value
FROM melted GROUP BY 1
"""

QUERIES["column_profile"] = q_column_profile
ORACLES["column_profile"] = _COLUMN_PROFILE_SQL


def q_change_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Root-cause contribution analysis (profile.change_contribution):
    which event_type / user-decile / weekday slices drove the
    early-vs-late value change — exact integer slice deltas that sum to
    the total per dimension, top-20 by |delta| (operator docstring)."""
    from cerebro_spark.operators.profile import change_contribution

    ev = load_table(spark, "events", sf_dir)
    t = F.col("ts").cast("double")
    return change_contribution(
        ev,
        {
            "event_type": F.col("event_type"),
            "user_decile": F.pmod(F.col("user_id"), F.lit(10)),
            "weekday": F.floor(t / 86400) % 7,
        },
        "value",
        "ts",
        top_k=20,
    )


_CHANGE_CONTRIBUTION_SQL = """
WITH base AS (
  SELECT epoch(ts) AS t, CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS q,
         event_type,
         CAST(user_id % 10 AS VARCHAR) AS user_decile,
         CAST(CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7 AS VARCHAR) AS weekday
  FROM events WHERE value IS NOT NULL
),
mid AS (SELECT (MIN(t) + MAX(t)) / 2 AS m FROM base),
melted AS (
  SELECT 'event_type' AS dimension, CAST(event_type AS VARCHAR) AS dim_value, t, q FROM base
  UNION ALL SELECT 'user_decile', user_decile, t, q FROM base
  UNION ALL SELECT 'weekday', weekday, t, q FROM base
),
cells AS (
  SELECT dimension, dim_value,
    SUM(CASE WHEN t <= m THEN q ELSE 0 END) AS e,
    SUM(CASE WHEN t > m THEN q ELSE 0 END) AS l
  FROM melted CROSS JOIN mid
  WHERE dim_value IS NOT NULL
  GROUP BY 1, 2
),
tot AS (
  SELECT dimension, SUM(l) - SUM(e) AS total_delta FROM cells GROUP BY 1
)
SELECT dimension, dim_value,
  round(CAST(e AS DOUBLE) / 1e6, 6) AS early_sum,
  round(CAST(l AS DOUBLE) / 1e6, 6) AS late_sum,
  round(CAST(l - e AS DOUBLE) / 1e6, 6) AS delta,
  CASE WHEN total_delta != 0
       THEN round(CAST(l - e AS DOUBLE) / CAST(total_delta AS DOUBLE), 6)
  END AS share
FROM cells JOIN tot USING (dimension)
ORDER BY abs(l - e) DESC, dimension ASC, dim_value ASC LIMIT 20
"""

QUERIES["change_contribution"] = q_change_contribution
ORACLES["change_contribution"] = _CHANGE_CONTRIBUTION_SQL


def q_trending_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day trending event types (timeops.trending_topk): top-3 by
    exact count with rank and share — total-order ranks, bucket-
    partitioned window over item-count rows (operator docstring)."""
    from cerebro_spark.operators.timeops import trending_topk

    ev = load_table(spark, "events", sf_dir)
    return trending_topk(ev, "event_type", "ts", 86400, 3)


_TRENDING_DAILY_SQL = """
WITH cells AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS bucket, event_type AS item,
         COUNT(*) AS n
  FROM events WHERE event_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (SELECT bucket, SUM(n) AS t FROM cells GROUP BY 1),
ranked AS (
  SELECT bucket, item, n,
    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY n DESC, item ASC) AS rank
  FROM cells
)
SELECT bucket, rank, item, n,
       round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share
FROM ranked JOIN tot USING (bucket)
WHERE rank <= 3
"""

QUERIES["trending_daily"] = q_trending_daily
ORACLES["trending_daily"] = _TRENDING_DAILY_SQL


def q_auc_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC (profile.roc_auc): does `value` rank purchase events above
    the rest?  One combinable quantized-score aggregate + a
    quantization-bounded cumulative window; ties midranked exactly."""
    from cerebro_spark.operators.profile import roc_auc

    ev = load_table(spark, "events", sf_dir)
    return roc_auc(ev, "value", F.col("event_type") == "purchase", quant=100)


_AUC_SQL = """
WITH cells AS (
  SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS s,
         count(*) AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
),
g AS (
  SELECT s, n, p,
    COALESCE(sum(n) OVER (ORDER BY s
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
  FROM cells
),
m AS (
  SELECT sum(CAST(p AS HUGEINT) * (2 * c + n + 1)) AS s2,
         sum(p) AS pos, sum(n) AS tot
  FROM g
)
SELECT CAST(pos AS BIGINT) AS n_pos,
       CAST(tot - pos AS BIGINT) AS n_neg,
  CASE WHEN pos > 0 AND tot > pos THEN
    round(CAST(s2 - CAST(pos AS HUGEINT) * (pos + 1) AS DOUBLE)
          / (2.0 * CAST(pos AS DOUBLE) * CAST(tot - pos AS DOUBLE)), 6)
  END AS auc
FROM m
"""

QUERIES["auc_purchase_value"] = q_auc_purchase_value
ORACLES["auc_purchase_value"] = _AUC_SQL


def q_lang_id_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (profile.cohens_kappa) between the lang_id heuristic
    and the recorded lang label — chance-corrected agreement of our own
    classifier against ground truth; exact integer contingency, one IEEE
    division per statistic."""
    from cerebro_spark.operators.profile import cohens_kappa
    from cerebro_spark.operators.text import lang_id_heuristic

    docs = load_table(spark, "documents", sf_dir)
    pairs = docs.filter(F.col("lang").isNotNull()).select(
        lang_id_heuristic(F.col("text")).alias("pred"), "lang"
    )
    return cohens_kappa(pairs, "pred", "lang")


def _lang_kappa_sql() -> str:
    from cerebro_spark.operators.text import EN_STOPWORDS

    sw = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    return f"""
WITH pairs AS (
  SELECT
    CASE WHEN len(regexp_extract_all(text, '[一-鿿]')) > 0 THEN 'zh'
         WHEN len(regexp_extract_all(lower(text), '[äöüß]')) >
              len(regexp_extract_all(lower(text), '[àâçéèêëîïôùûœ]'))
              + len(regexp_extract_all(lower(text), '[áéíóúñ¿¡]')) THEN 'de'
         WHEN len(regexp_extract_all(lower(text), '[áéíóúñ¿¡]')) >
              len(regexp_extract_all(lower(text), '[àâçéèêëîïôùûœ]')) THEN 'es'
         WHEN len(regexp_extract_all(lower(text), '[àâçéèêëîïôùûœ]')) > 0 THEN 'fr'
         WHEN len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                              t -> list_contains([{sw}], t)))
              >= 0.05 * len(string_split_regex(trim(lower(text)), '\\s+')) THEN 'en'
         ELSE 'unknown' END AS a,
    lang AS b
  FROM documents WHERE lang IS NOT NULL
),
cells AS (SELECT a, b, count(*) AS c FROM pairs GROUP BY 1, 2),
rows_ AS (SELECT a, sum(c) AS r FROM cells GROUP BY 1),
cols_ AS (SELECT b, sum(c) AS k FROM cells GROUP BY 1),
rc AS (
  SELECT sum(CAST(COALESCE(r, 0) AS HUGEINT) * COALESCE(k, 0)) AS src
  FROM rows_ FULL OUTER JOIN cols_ ON rows_.a = cols_.b
),
tot AS (
  SELECT sum(c) AS n,
         sum(CASE WHEN a = b THEN c ELSE 0 END) AS diag
  FROM cells
)
SELECT CAST(n AS BIGINT) AS n,
  round(CAST(diag AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_observed,
  round(CAST(src AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)
    AS p_expected,
  CASE WHEN CAST(n AS HUGEINT) * n - src > 0 THEN
    round(CAST(CAST(n AS HUGEINT) * diag - src AS DOUBLE)
          / CAST(CAST(n AS HUGEINT) * n - src AS DOUBLE), 6)
  END AS kappa
FROM tot, rc
"""


QUERIES["lang_id_kappa"] = q_lang_id_kappa
ORACLES["lang_id_kappa"] = _lang_kappa_sql()


def q_w1_chars_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 drift (profile.w1_drift): how far, in characters,
    each source's doc-length distribution sits from the corpus — the
    integral-CDF companion of psi/ks/js over the shared 50-bucket grid."""
    from cerebro_spark.operators.profile import w1_drift

    docs = load_table(spark, "documents", sf_dir)
    return w1_drift(docs, "n_chars", "source", n_buckets=50)


_W1_SQL = """
WITH base AS (
  SELECT source AS g, CAST(n_chars AS BIGINT) AS v
  FROM documents WHERE n_chars IS NOT NULL
),
span AS (SELECT min(v) AS lo, max(v) AS hi FROM base),
bb AS (
  SELECT g,
    CASE WHEN hi > lo
         THEN CAST(floor((v - lo) * 50 / (hi - lo + 1.0)) AS BIGINT)
         ELSE 0 END AS b,
    hi - lo + 1 AS span_u
  FROM base, span
),
counts AS (SELECT g, b, count(*) AS c FROM bb GROUP BY 1, 2),
gs AS (SELECT DISTINCT g, max(span_u) AS span_u FROM bb GROUP BY 1),
grid AS (
  SELECT gs.g, gs.span_u, gb.b
  FROM gs CROSS JOIN (SELECT unnest(range(50)) AS b) gb
),
dense AS (
  SELECT grid.g, grid.span_u, grid.b, COALESCE(counts.c, 0) AS c
  FROM grid LEFT JOIN counts ON grid.g = counts.g AND grid.b = counts.b
),
allc AS (
  SELECT gb.b, COALESCE(sum(counts.c), 0) AS ac
  FROM (SELECT unnest(range(50)) AS b) gb
  LEFT JOIN counts ON gb.b = counts.b
  GROUP BY 1
),
allcum AS (
  SELECT b, sum(ac) OVER (ORDER BY b
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca
  FROM allc
),
terms AS (
  SELECT d.g, d.span_u,
    sum(d.c) OVER (PARTITION BY d.g ORDER BY d.b
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cg,
    COALESCE(allcum.ca, 0) AS ca
  FROM dense d LEFT JOIN allcum ON d.b = allcum.b
),
ng AS (
  SELECT g, max(span_u) AS span_u, max(cg) AS ngr, max(ca) AS n_all
  FROM terms GROUP BY 1
),
num AS (
  SELECT t.g, ng.span_u, ng.ngr, ng.n_all,
    sum(abs(CAST(t.cg AS HUGEINT) * ng.n_all
            - CAST(t.ca AS HUGEINT) * ng.ngr)) AS nm
  FROM terms t JOIN ng ON t.g = ng.g
  GROUP BY 1, 2, 3, 4
)
SELECT g AS source, CAST(ngr AS BIGINT) AS n,
  round(CAST(nm AS DOUBLE)
        / (CAST(ngr AS DOUBLE) * CAST(n_all AS DOUBLE) * 50.0)
        * CAST(span_u AS DOUBLE), 6) AS w1_units,
  round(CAST(nm AS DOUBLE)
        / (CAST(ngr AS DOUBLE) * CAST(n_all AS DOUBLE) * 50.0), 6) AS w1_norm
FROM num
ORDER BY w1_norm DESC, source ASC
"""

QUERIES["w1_chars_drift"] = q_w1_chars_drift
ORACLES["w1_chars_drift"] = _W1_SQL


def q_did_launch_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences (profile.did_estimate): treated = odd
    user_id, post = events after the corpus-midpoint instant — the
    launch-without-randomization estimate; exact e6 cell moments, one
    IEEE division per mean."""
    from cerebro_spark.operators.profile import did_estimate

    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    mid = ev.agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long").alias("__mid")
    )
    base = ev.crossJoin(F.broadcast(mid))
    return did_estimate(
        base,
        "value",
        F.pmod(F.col("user_id"), F.lit(2)) == 1,
        F.unix_micros("ts") >= F.col("__mid"),
    )


_DID_SQL = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t,
    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
mid AS (
  SELECT CAST(floor((min(t) + max(t)) / 2.0) AS BIGINT) AS mid FROM ev
),
cells AS (
  SELECT
    sum(CASE WHEN user_id % 2 = 0 AND t <  mid THEN 1 ELSE 0 END) AS n_c_pre,
    sum(CASE WHEN user_id % 2 = 0 AND t <  mid THEN CAST(v AS HUGEINT) ELSE 0 END) AS s_c_pre,
    sum(CASE WHEN user_id % 2 = 0 AND t >= mid THEN 1 ELSE 0 END) AS n_c_post,
    sum(CASE WHEN user_id % 2 = 0 AND t >= mid THEN CAST(v AS HUGEINT) ELSE 0 END) AS s_c_post,
    sum(CASE WHEN user_id % 2 = 1 AND t <  mid THEN 1 ELSE 0 END) AS n_t_pre,
    sum(CASE WHEN user_id % 2 = 1 AND t <  mid THEN CAST(v AS HUGEINT) ELSE 0 END) AS s_t_pre,
    sum(CASE WHEN user_id % 2 = 1 AND t >= mid THEN 1 ELSE 0 END) AS n_t_post,
    sum(CASE WHEN user_id % 2 = 1 AND t >= mid THEN CAST(v AS HUGEINT) ELSE 0 END) AS s_t_post
  FROM ev, mid
)
SELECT
  CAST(n_c_pre AS BIGINT) AS n_c_pre, CAST(n_c_post AS BIGINT) AS n_c_post,
  CAST(n_t_pre AS BIGINT) AS n_t_pre, CAST(n_t_post AS BIGINT) AS n_t_post,
  round(CAST(s_c_pre AS DOUBLE) / (CAST(n_c_pre AS DOUBLE) * 1000000.0), 6) AS mean_c_pre,
  round(CAST(s_c_post AS DOUBLE) / (CAST(n_c_post AS DOUBLE) * 1000000.0), 6) AS mean_c_post,
  round(CAST(s_t_pre AS DOUBLE) / (CAST(n_t_pre AS DOUBLE) * 1000000.0), 6) AS mean_t_pre,
  round(CAST(s_t_post AS DOUBLE) / (CAST(n_t_post AS DOUBLE) * 1000000.0), 6) AS mean_t_post,
  CASE WHEN n_c_pre > 0 AND n_c_post > 0 AND n_t_pre > 0 AND n_t_post > 0 THEN
    round(
      (CAST(s_t_post AS DOUBLE) / (CAST(n_t_post AS DOUBLE) * 1000000.0)
       - CAST(s_t_pre AS DOUBLE) / (CAST(n_t_pre AS DOUBLE) * 1000000.0))
      - (CAST(s_c_post AS DOUBLE) / (CAST(n_c_post AS DOUBLE) * 1000000.0)
         - CAST(s_c_pre AS DOUBLE) / (CAST(n_c_pre AS DOUBLE) * 1000000.0)),
      6)
  END AS did
FROM cells
"""

QUERIES["did_launch_value"] = q_did_launch_value
ORACLES["did_launch_value"] = _DID_SQL


def q_neyman_value_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal allocation (sampling.neyman_allocation): how a
    1000-row stratified sample should split across event types
    (share ∝ n_h·s_h) — exact integer moments per stratum, order-free
    e6-quantized weights, one division per share."""
    from cerebro_spark.operators.sampling import neyman_allocation

    ev = load_table(spark, "events", sf_dir)
    return neyman_allocation(ev, "value", "event_type", k=1000)


_NEYMAN_SQL = """
WITH base AS (
  SELECT event_type AS h,
    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
),
per AS (
  SELECT h, count(*) AS n,
    sum(CAST(v AS HUGEINT)) AS s,
    sum(CAST(v AS HUGEINT) * v) AS ss
  FROM base GROUP BY 1
),
w AS (
  SELECT h, n,
    CASE WHEN n > 1 AND CAST(n AS HUGEINT) * ss - s * s >= 0 THEN
      sqrt(CAST(CAST(n AS HUGEINT) * ss - s * s AS DOUBLE)
           / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)) / 1000000.0
    END AS sd
  FROM per
),
w2 AS (
  SELECT h, n, sd,
    COALESCE(CAST(floor(CAST(n AS DOUBLE) * sd * 1000000.0 + 0.5) AS BIGINT),
             0) AS wq
  FROM w
),
tot AS (SELECT sum(wq) AS tw FROM w2)
SELECT h AS event_type, CAST(n AS BIGINT) AS n,
  round(sd, 6) AS sd,
  round(CASE WHEN tw > 0
             THEN CAST(wq AS DOUBLE) / CAST(tw AS DOUBLE) END, 6) AS share,
  CAST(floor(CASE WHEN tw > 0
                  THEN CAST(wq AS DOUBLE) / CAST(tw AS DOUBLE) END
             * 1000.0 + 0.5) AS BIGINT) AS n_alloc
FROM w2, tot
ORDER BY event_type ASC
"""

QUERIES["neyman_value_alloc"] = q_neyman_value_alloc
ORACLES["neyman_value_alloc"] = _NEYMAN_SQL


def q_event_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa (profile.fleiss_kappa): consecutive event triples
    (subject = event_id // 3) act as a 3-rater panel labeling with
    event_type — chance-corrected m-way agreement from exact integer
    counts; subjects without exactly 3 ratings drop on both engines."""
    from cerebro_spark.operators.profile import fleiss_kappa

    ev = load_table(spark, "events", sf_dir).select(
        F.floor(F.col("event_id") / 3).cast("long").alias("subject"),
        F.col("event_type").alias("category"),
    )
    return fleiss_kappa(ev, "subject", "category", m=3)


_FLEISS_SQL = """
WITH base AS (
  SELECT CAST(floor(event_id / 3) AS BIGINT) AS s, event_type AS c
  FROM events WHERE event_id IS NOT NULL AND event_type IS NOT NULL
),
sc AS (SELECT s, c, count(*) AS n FROM base GROUP BY 1, 2),
per AS (
  SELECT s, sum(n) AS tot, sum(CAST(n AS HUGEINT) * n) AS sq
  FROM sc GROUP BY 1 HAVING sum(n) = 3
),
at AS (
  SELECT CAST(count(*) AS HUGEINT) AS nsub, sum(sq) AS sumsq FROM per
),
cc AS (
  SELECT COALESCE(sum(CAST(t AS HUGEINT) * t), 0) AS bb FROM (
    SELECT sum(sc.n) AS t FROM sc JOIN per USING (s) GROUP BY sc.c
  )
)
SELECT CAST(nsub AS BIGINT) AS n_subjects,
  CAST(nsub * 3 AS BIGINT) AS n_ratings,
  CASE WHEN nsub > 0 THEN
    round(CAST(sumsq - nsub * 3 AS DOUBLE)
          / CAST(nsub * 3 * 2 AS DOUBLE), 6) END AS p_observed,
  CASE WHEN nsub > 0 THEN
    round(CAST(bb AS DOUBLE)
          / CAST(nsub * 3 * nsub * 3 AS DOUBLE), 6) END AS p_expected,
  CASE WHEN (nsub * 3 * nsub * 3 - bb) * 2 > 0 THEN
    round(CAST((sumsq - nsub * 3) * nsub * 3 - bb * 2 AS DOUBLE)
          / CAST((nsub * 3 * nsub * 3 - bb) * 2 AS DOUBLE), 6)
  END AS kappa
FROM at, cc
"""

QUERIES["event_fleiss_kappa"] = q_event_fleiss_kappa
ORACLES["event_fleiss_kappa"] = _FLEISS_SQL


def q_mde_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect (profile.mde_power): per event type,
    the absolute and relative lift a 50/50 test on this traffic could
    detect at alpha=5%/power=80% — exact e6 integer moments, z constants
    as Python literals, a fixed IEEE chain rounded 6 dp."""
    from cerebro_spark.operators.profile import mde_power

    ev = load_table(spark, "events", sf_dir)
    return mde_power(ev, "value", "event_type")


def _mde_sql() -> str:
    from cerebro_spark.operators.profile import Z_ALPHA_025, Z_POWER_080

    c = repr(Z_ALPHA_025 + Z_POWER_080)
    return f"""
WITH base AS (
  SELECT event_type AS h,
    CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
),
per AS (
  SELECT h, count(*) AS n,
    sum(CAST(v AS HUGEINT)) AS s,
    sum(CAST(v AS HUGEINT) * v) AS ss
  FROM base GROUP BY 1
),
w AS (
  SELECT h, n, s,
    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 AS mean,
    CASE WHEN n > 1 AND CAST(n AS HUGEINT) * ss - s * s >= 0 THEN
      sqrt(CAST(CAST(n AS HUGEINT) * ss - s * s AS DOUBLE)
           / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)) / 1000000.0
    END AS sd
  FROM per
),
w2 AS (
  SELECT h, n, s, mean, sd,
    {c} * sqrt(4.0 * sd * sd / CAST(n AS DOUBLE)) AS mde
  FROM w
)
SELECT h AS event_type, CAST(n AS BIGINT) AS n,
  round(mean, 6) AS mean, round(sd, 6) AS sd,
  round(mde, 6) AS mde_abs,
  CASE WHEN abs(CAST(s AS DOUBLE)) > 0
       THEN round(mde / abs(mean), 6) END AS mde_rel
FROM w2
ORDER BY event_type ASC
"""


QUERIES["mde_value"] = q_mde_value
ORACLES["mde_value"] = _mde_sql()


def q_bt_brand_strengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry brand strengths (profile.bradley_terry): within each
    order the brand of the highest-revenue lineitem 'beats' the brand of
    the lowest — the pairwise-preference fit behind reward-model data.
    Pair counts are the one distributed aggregate; the MM solve runs 20
    exact fixed-point HUGEINT rounds on the collected |brands|^2 matrix,
    unrolled identically in the oracle."""
    from cerebro_spark.operators.profile import bradley_terry

    li = load_table(spark, "lineitem", sf_dir)
    pt = load_table(spark, "part", sf_dir)
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    base = li.join(
        pt, li["l_partkey"] == pt["p_partkey"]
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.col("p_brand").alias("brand"),
        rev.alias("rev"),
    )
    w_hi = Window.partitionBy("l_orderkey").orderBy(
        F.col("rev").desc(), F.col("l_linenumber").asc()
    )
    w_lo = Window.partitionBy("l_orderkey").orderBy(
        F.col("rev").asc(), F.col("l_linenumber").desc()
    )
    ranked = base.select(
        "l_orderkey",
        "brand",
        F.row_number().over(w_hi).alias("__rh"),
        F.row_number().over(w_lo).alias("__rl"),
    )
    winners = ranked.filter(F.col("__rh") == 1).select(
        "l_orderkey", F.col("brand").alias("winner")
    )
    losers = ranked.filter(F.col("__rl") == 1).select(
        "l_orderkey", F.col("brand").alias("loser")
    )
    matches = winners.join(losers, "l_orderkey")
    return bradley_terry(matches, "winner", "loser", iterations=20)


def _bt_sql(k: int = 20) -> str:
    """DuckDB twin of profile.bradley_terry (identical per-round-floor
    HUGEINT recurrence, unrolled like _markov_sql)."""
    s1 = "CAST(1000000000000 AS HUGEINT)"      # BT_SCALE
    s2 = "CAST(1000000000000000000 AS HUGEINT)"  # BT_SCALE2
    its = []
    for j in range(1, k + 1):
        its.append(f"""
d{j} AS MATERIALIZED (
  SELECT p.i AS item, sum(({s2} * p.c) // (si.s + sj.s)) AS d
  FROM pairs p
  JOIN s{j - 1} si ON si.item = p.i
  JOIN s{j - 1} sj ON sj.item = p.j
  GROUP BY 1
),
r{j} AS (
  SELECT d.item,
    CASE WHEN d.d > 0
         THEN (COALESCE(w.w, CAST(0 AS HUGEINT)) * {s2}) // d.d
         ELSE CAST(0 AS HUGEINT) END AS r
  FROM d{j} d LEFT JOIN wins w ON w.item = d.item
),
t{j} AS (SELECT sum(r) AS t, CAST(count(*) AS HUGEINT) AS k FROM r{j}),
s{j} AS (
  SELECT r.item,
    CASE WHEN t.t = 0 THEN CAST(0 AS HUGEINT)
         WHEN w.w IS NOT NULL AND w.w > 0
           THEN greatest((r.r * t.k * {s1}) // t.t, CAST(1 AS HUGEINT))
         ELSE (r.r * t.k * {s1}) // t.t END AS s
  FROM r{j} r LEFT JOIN wins w ON w.item = r.item, t{j} t
)""")
    return f"""
WITH base AS (
  SELECT l_orderkey AS o, l_linenumber AS ln, p_brand AS brand,
         l_extendedprice * (1 - l_discount) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
rk AS (
  SELECT o, brand,
    row_number() OVER (PARTITION BY o ORDER BY rev DESC, ln ASC) AS rh,
    row_number() OVER (PARTITION BY o ORDER BY rev ASC, ln DESC) AS rl
  FROM base
),
m AS (
  SELECT w.brand AS wb, l.brand AS lb
  FROM (SELECT o, brand FROM rk WHERE rh = 1) w
  JOIN (SELECT o, brand FROM rk WHERE rl = 1) l USING (o)
  WHERE w.brand <> l.brand
),
wins AS (SELECT wb AS item, CAST(count(*) AS HUGEINT) AS w FROM m GROUP BY 1),
und AS (
  SELECT least(wb, lb) AS a, greatest(wb, lb) AS b,
         CAST(count(*) AS HUGEINT) AS c
  FROM m GROUP BY 1, 2
),
pairs AS MATERIALIZED (
  SELECT a AS i, b AS j, c FROM und
  UNION ALL
  SELECT b AS i, a AS j, c FROM und
),
items AS (SELECT DISTINCT i AS item FROM pairs),
nm AS (SELECT i AS item, sum(c) AS n FROM pairs GROUP BY 1),
s0 AS (SELECT item, {s1} AS s FROM items),{",".join(its)},
tot AS (SELECT sum(s) AS ts FROM s{k})
SELECT s.item,
  CAST(COALESCE(w.w, 0) AS BIGINT) AS n_wins,
  CAST(nm.n AS BIGINT) AS n_matches,
  CAST(s.s AS DOUBLE) / 1000000000000.0 AS strength,
  CASE WHEN tot.ts > 0
       THEN CAST(s.s AS DOUBLE) / CAST(tot.ts AS DOUBLE) END AS share
FROM s{k} s
LEFT JOIN wins w ON w.item = s.item
JOIN nm ON nm.item = s.item, tot
ORDER BY s.item ASC
"""


QUERIES["bt_brand_strengths"] = q_bt_brand_strengths
ORACLES["bt_brand_strengths"] = _bt_sql()


def q_t_closeness_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (profile.t_closeness): QI class = event_type ×
    hour-of-day, sensitive = floor(value) — per class the normalized
    integral-CDF gap between the class's value distribution and the
    table's over a shared 50-bucket grid, flagged at t = 0.25.  Value is
    pre-floored on BOTH engines (Spark's long cast truncates, DuckDB's
    rounds)."""
    from cerebro_spark.operators.profile import t_closeness

    ev = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.hour(F.col("ts")).alias("hour"),
            F.floor(F.col("value")).cast("long").alias("sens_value"),
        )
    )
    return t_closeness(
        ev, ["event_type", "hour"], "sens_value", n_buckets=50, t=0.25
    )


_T_CLOSENESS_SQL = """
WITH base AS (
  SELECT event_type || '|' || CAST(hour(ts) AS VARCHAR) AS g,
    CAST(floor(value) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
span AS (SELECT min(v) AS lo, max(v) AS hi FROM base),
bb AS (
  SELECT g,
    CASE WHEN hi > lo
         THEN CAST(floor((v - lo) * 50 / (hi - lo + 1.0)) AS BIGINT)
         ELSE 0 END AS b
  FROM base, span
),
counts AS (SELECT g, b, count(*) AS c FROM bb GROUP BY 1, 2),
gs AS (SELECT DISTINCT g FROM bb),
grid AS (
  SELECT gs.g, gb.b
  FROM gs CROSS JOIN (SELECT unnest(range(50)) AS b) gb
),
dense AS (
  SELECT grid.g, grid.b, COALESCE(counts.c, 0) AS c
  FROM grid LEFT JOIN counts ON grid.g = counts.g AND grid.b = counts.b
),
allc AS (
  SELECT gb.b, COALESCE(sum(counts.c), 0) AS ac
  FROM (SELECT unnest(range(50)) AS b) gb
  LEFT JOIN counts ON gb.b = counts.b
  GROUP BY 1
),
allcum AS (
  SELECT b, sum(ac) OVER (ORDER BY b
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca
  FROM allc
),
terms AS (
  SELECT d.g,
    sum(d.c) OVER (PARTITION BY d.g ORDER BY d.b
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cg,
    COALESCE(allcum.ca, 0) AS ca
  FROM dense d LEFT JOIN allcum ON d.b = allcum.b
),
ng AS (
  SELECT g, max(cg) AS ngr, max(ca) AS n_all FROM terms GROUP BY 1
),
num AS (
  SELECT t.g, ng.ngr, ng.n_all,
    sum(abs(CAST(t.cg AS HUGEINT) * ng.n_all
            - CAST(t.ca AS HUGEINT) * ng.ngr)) AS nm
  FROM terms t JOIN ng ON t.g = ng.g
  GROUP BY 1, 2, 3
)
SELECT g AS qi_class, CAST(ngr AS BIGINT) AS n,
  round(CAST(nm AS DOUBLE)
        / (CAST(ngr AS DOUBLE) * CAST(n_all AS DOUBLE) * 50.0), 6)
    AS t_distance,
  round(CAST(nm AS DOUBLE)
        / (CAST(ngr AS DOUBLE) * CAST(n_all AS DOUBLE) * 50.0), 6) >= 0.25
    AS is_violation
FROM num
ORDER BY t_distance DESC, qi_class ASC
"""

QUERIES["t_closeness_events"] = q_t_closeness_events
ORACLES["t_closeness_events"] = _T_CLOSENESS_SQL


def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit (profile.fk_orphan_audit) over the
    seven FK edges of the TPC-H-ish schema — per edge the exact child,
    null-FK and orphan counts plus the orphan rate; the warehouse-load
    health report next to column_profile/table_fingerprint."""
    from cerebro_spark.operators.profile import fk_orphan_audit

    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    part = load_table(spark, "part", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    edges = [
        ("customer.c_nationkey->nation", customer, "c_nationkey",
         nation, "n_nationkey"),
        ("lineitem.l_orderkey->orders", li, "l_orderkey",
         orders, "o_orderkey"),
        ("lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey"),
        ("lineitem.l_suppkey->supplier", li, "l_suppkey",
         supplier, "s_suppkey"),
        ("nation.n_regionkey->region", nation, "n_regionkey",
         region, "r_regionkey"),
        ("orders.o_custkey->customer", orders, "o_custkey",
         customer, "c_custkey"),
        ("supplier.s_nationkey->nation", supplier, "s_nationkey",
         nation, "n_nationkey"),
    ]
    return fk_orphan_audit(edges)


def _fk_sql() -> str:
    edges = [
        ("customer.c_nationkey->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey",
         "region", "r_regionkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
    ]
    parts = []
    for name, child, fk, parent, pk in edges:
        parts.append(f"""
SELECT '{name}' AS edge,
  CAST(count(*) AS BIGINT) AS child_rows,
  CAST(sum(CASE WHEN c.{fk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS null_fk,
  CAST(sum(CASE WHEN c.{fk} IS NOT NULL AND p.__pk IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS orphan_fk
FROM {child} c
LEFT JOIN (SELECT DISTINCT {pk} AS __pk FROM {parent}) p
  ON c.{fk} = p.__pk""")
    union = "\nUNION ALL".join(parts)
    return f"""
WITH u AS ({union})
SELECT edge, child_rows, null_fk, orphan_fk,
  CASE WHEN child_rows > 0 THEN
    round(CAST(orphan_fk AS DOUBLE) / CAST(child_rows AS DOUBLE), 6)
  END AS orphan_rate
FROM u
ORDER BY edge ASC
"""


QUERIES["fk_integrity"] = q_fk_integrity
ORACLES["fk_integrity"] = _fk_sql()


def q_hill_value_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail index (profile.hill_tail_index): per event type, is the
    value distribution's tail integrable?  alpha from the top-101 order
    statistics under the (value desc, event_id asc) total order — e6-
    quantized logs, exact integer Hill numerator, one IEEE division."""
    from cerebro_spark.operators.profile import hill_tail_index

    ev = load_table(spark, "events", sf_dir)
    return hill_tail_index(ev, "value", "event_type", "event_id", k=100)


_HILL_SQL = """
WITH base AS (
  SELECT event_type AS g, CAST(value AS DOUBLE) AS v, event_id AS i
  FROM events WHERE value IS NOT NULL AND value > 0
),
ranked AS (
  SELECT g, v,
    row_number() OVER (PARTITION BY g ORDER BY v DESC, i ASC) AS rn
  FROM base
),
per AS (
  SELECT g,
    CAST(count(*) AS BIGINT) AS m,
    sum(CAST(floor(ln(v) * 1000000.0 + 0.5) AS BIGINT)) AS sq,
    min(CAST(floor(ln(v) * 1000000.0 + 0.5) AS BIGINT)) AS qlast
  FROM ranked WHERE rn <= 101 GROUP BY 1
),
tot AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1)
SELECT g AS event_type, n, CAST(m - 1 AS BIGINT) AS k_used,
  CASE WHEN m >= 3 AND sq - m * qlast > 0 THEN
    round(CAST(m - 1 AS DOUBLE) * 1000000.0
          / CAST(sq - m * qlast AS DOUBLE), 6)
  END AS alpha
FROM tot JOIN per USING (g)
ORDER BY event_type ASC
"""

QUERIES["hill_value_tail"] = q_hill_value_tail
ORACLES["hill_value_tail"] = _HILL_SQL


def q_value_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (profile.dispersion_index): VMR of daily event
    counts per type over each type's observed day span (silent days count
    as zero) — Poisson = 1, bursty >> 1; one combinable count, a
    calendar-bounded dense grid, one exact-integer division."""
    from cerebro_spark.operators.profile import dispersion_index

    ev = load_table(spark, "events", sf_dir).select(
        "event_type", F.col("ts").cast("double").alias("tsec")
    )
    return dispersion_index(ev, "tsec", "event_type", bucket_seconds=86400)


_DISPERSION_SQL = """
WITH base AS (
  SELECT event_type AS k,
    CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS b
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
counts AS (SELECT k, b, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1, 2),
span AS (SELECT k, min(b) AS lo, max(b) AS hi FROM counts GROUP BY 1),
grid AS (
  SELECT span.k, lo + g.i AS b
  FROM span, generate_series(0, 100000) AS g(i)
  WHERE lo + g.i <= hi
),
dense AS (
  SELECT grid.k, COALESCE(counts.c, 0) AS c
  FROM grid LEFT JOIN counts ON grid.k = counts.k AND grid.b = counts.b
),
agg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS m,
    sum(CAST(c AS HUGEINT)) AS s,
    sum(CAST(c AS HUGEINT) * c) AS ss
  FROM dense GROUP BY 1
)
SELECT k AS event_type, m AS n_buckets, CAST(s AS BIGINT) AS total,
  round(CAST(s AS DOUBLE) / CAST(m AS DOUBLE), 6) AS mean_count,
  CASE WHEN m > 1 AND s > 0 THEN
    round(CAST(CAST(m AS HUGEINT) * ss - s * s AS DOUBLE)
          / CAST((CAST(m AS HUGEINT) - 1) * s AS DOUBLE), 6)
  END AS vmr,
  (CASE WHEN m > 1 AND s > 0 THEN
    round(CAST(CAST(m AS HUGEINT) * ss - s * s AS DOUBLE)
          / CAST((CAST(m AS HUGEINT) - 1) * s AS DOUBLE), 6)
  END) > 1.0 AS overdispersed
FROM agg
ORDER BY event_type ASC
"""

QUERIES["value_dispersion"] = q_value_dispersion
ORACLES["value_dispersion"] = _DISPERSION_SQL


def q_mcnemar_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test (profile.mcnemar_test): is the lang_id
    heuristic actually better than the predict-'en' baseline, or do they
    just disagree symmetrically?  Four exact discordance cells, one
    IEEE division — the classifier companion of ranker_sign_test."""
    from cerebro_spark.operators.profile import mcnemar_test
    from cerebro_spark.operators.text import lang_id_heuristic
    from cerebro_spark.operators.util import ensure_parallelism

    # spread the single-file scan: the lang-id regex battery runs per row
    # on the scan's partitions (no-op on a multi-split scan)
    docs = ensure_parallelism(
        load_table(spark, "documents", sf_dir).filter(
            F.col("lang").isNotNull()
        )
    )
    return mcnemar_test(
        docs,
        lang_id_heuristic(F.col("text")) == F.col("lang"),
        F.lit("en") == F.col("lang"),
    )


def _mcnemar_sql() -> str:
    from cerebro_spark.operators.text import EN_STOPWORDS

    sw = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    return f"""
WITH pairs AS (
  SELECT
    CAST((CASE WHEN len(regexp_extract_all(text, '[一-鿿]')) > 0 THEN 'zh'
         WHEN len(regexp_extract_all(lower(text), '[äöüß]')) >
              len(regexp_extract_all(lower(text), '[àâçéèêëîïôùûœ]'))
              + len(regexp_extract_all(lower(text), '[áéíóúñ¿¡]')) THEN 'de'
         WHEN len(regexp_extract_all(lower(text), '[áéíóúñ¿¡]')) >
              len(regexp_extract_all(lower(text), '[àâçéèêëîïôùûœ]')) THEN 'es'
         WHEN len(regexp_extract_all(lower(text), '[àâçéèêëîïôùûœ]')) > 0 THEN 'fr'
         WHEN len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                              t -> list_contains([{sw}], t)))
              >= 0.05 * len(string_split_regex(trim(lower(text)), '\\s+')) THEN 'en'
         ELSE 'unknown' END) = lang AS INTEGER) AS a,
    CAST(('en' = lang) AS INTEGER) AS b
  FROM documents WHERE lang IS NOT NULL
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
    CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS only_a,
    CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS only_b,
    CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
  FROM pairs
)
SELECT n, n_both, only_a, only_b, n_neither,
  CASE WHEN only_a + only_b > 0 THEN
    round(CAST((CAST(only_a AS HUGEINT) - only_b)
               * (CAST(only_a AS HUGEINT) - only_b) AS DOUBLE)
          / CAST(only_a + only_b AS DOUBLE), 6)
  END AS chi2
FROM agg
"""


QUERIES["mcnemar_langid"] = q_mcnemar_langid
ORACLES["mcnemar_langid"] = _mcnemar_sql()


def q_eb_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage (profile.eb_shrunk_means): per-user mean
    event value shrunk toward the grand mean with the one-way random-
    effects MoM weight B = tau2/(tau2 + sigma2/n) — small-n users shrink
    hard, heavy users keep their mean.  Exact e6 integer moments with
    order-free integer-floor cross-group sums; the fit chain is mirrored
    op-for-op in the oracle."""
    from cerebro_spark.operators.profile import eb_shrunk_means

    ev = load_table(spark, "events", sf_dir)
    return eb_shrunk_means(ev, "value", "user_id")


_EB_SQL = """
WITH base AS (
  SELECT user_id AS g,
    CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
),
per AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
    sum(CAST(v AS HUGEINT)) AS s,
    sum(CAST(v AS HUGEINT) * v) AS ss
  FROM base GROUP BY 1
),
per2 AS (
  SELECT *, (s * s) // CAST(n AS HUGEINT) AS qs FROM per
),
gtot AS (
  SELECT CAST(count(*) AS BIGINT) AS gg,
    sum(CAST(n AS HUGEINT)) AS nn,
    sum(s) AS ts, sum(ss) AS tss, sum(qs) AS tqs,
    sum(CAST(n AS HUGEINT) * n) AS n2
  FROM per2
),
fit AS (
  SELECT gg, nn, ts,
    tqs - (ts * ts) // nn AS ssb,
    tss - tqs AS ssw,
    n2 // nn AS n2overn
  FROM gtot
)
SELECT p.g AS user_id, p.n,
  round(CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE) / 1000000.0, 6) AS mean,
  CASE WHEN f.gg > 1 AND f.nn > f.gg THEN
    round(
      (CAST(f.ts AS DOUBLE) / CAST(f.nn AS DOUBLE) / 1000000.0)
      + (greatest(
           (CAST(f.ssb AS DOUBLE) / (CAST(f.gg AS DOUBLE) - 1.0)
            - CAST(f.ssw AS DOUBLE)
              / (CAST(f.nn AS DOUBLE) - CAST(f.gg AS DOUBLE)))
           / ((CAST(f.nn AS DOUBLE) - CAST(f.n2overn AS DOUBLE))
              / (CAST(f.gg AS DOUBLE) - 1.0)),
           0.0)
         / (greatest(
              (CAST(f.ssb AS DOUBLE) / (CAST(f.gg AS DOUBLE) - 1.0)
               - CAST(f.ssw AS DOUBLE)
                 / (CAST(f.nn AS DOUBLE) - CAST(f.gg AS DOUBLE)))
              / ((CAST(f.nn AS DOUBLE) - CAST(f.n2overn AS DOUBLE))
                 / (CAST(f.gg AS DOUBLE) - 1.0)),
              0.0)
            + CAST(f.ssw AS DOUBLE)
              / (CAST(f.nn AS DOUBLE) - CAST(f.gg AS DOUBLE))
              / CAST(p.n AS DOUBLE)))
        * ((CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE) / 1000000.0)
           - (CAST(f.ts AS DOUBLE) / CAST(f.nn AS DOUBLE) / 1000000.0)),
      6)
  END AS shrunk
FROM per2 p, fit f
ORDER BY user_id ASC
"""

QUERIES["eb_user_value"] = q_eb_user_value
ORACLES["eb_user_value"] = _EB_SQL


def q_event_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional transition entropy (profile.transition_entropy): how
    predictable is a user's NEXT event given the current one?  e6-
    quantized per-cell logs of exact count ratios, order-free integer
    weighted sum, one division — the sequence-predictability number
    behind markov_attribution."""
    from cerebro_spark.operators.profile import transition_entropy

    ev = load_table(spark, "events", sf_dir)
    return transition_entropy(ev)


_TRANSITION_ENTROPY_SQL = """
WITH steps AS (
  SELECT
    lag(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts ASC, event_id ASC) AS prev,
    event_type AS next_t
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
cells AS (
  SELECT prev, next_t, CAST(count(*) AS BIGINT) AS c
  FROM steps WHERE prev IS NOT NULL GROUP BY 1, 2
),
margins AS (SELECT prev, sum(c) AS r FROM cells GROUP BY 1),
terms AS (
  SELECT c, next_t,
    CAST(c AS HUGEINT)
      * CAST(floor(ln(CAST(r AS DOUBLE) / CAST(c AS DOUBLE)) * 1000000.0
                   + 0.5) AS HUGEINT) AS t
  FROM cells JOIN margins USING (prev)
),
agg AS (
  SELECT sum(CAST(c AS HUGEINT)) AS n, sum(t) AS tt,
    CAST(count(DISTINCT next_t) AS BIGINT) AS n_states
  FROM terms
)
SELECT CAST(n AS BIGINT) AS n_transitions, n_states,
  CASE WHEN n > 0 THEN
    round(CAST(tt AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0), 6)
  END AS cond_entropy_nats
FROM agg
"""

QUERIES["event_transition_entropy"] = q_event_transition_entropy
ORACLES["event_transition_entropy"] = _TRANSITION_ENTROPY_SQL


def q_spearman_value_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (profile.spearman_corr): is event value
    MONOTONICALLY associated with hour-of-day?  Midranks from exclusive
    grid cumulatives (2mr = 2c+n+1 exact), exact Pearson-of-ranks
    moments, two sqrts + one division."""
    from cerebro_spark.operators.profile import spearman_corr

    ev = load_table(spark, "events", sf_dir).select(
        "value", F.hour(F.col("ts")).alias("hour")
    )
    return spearman_corr(ev, "value", "hour", quant=100)


_SPEARMAN_SQL = """
WITH base AS (
  SELECT CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS x,
         CAST(floor(CAST(hour(ts) AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
gx AS (
  SELECT x, 2 * COALESCE(sum(count(*)) OVER (ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + count(*) + 1 AS rx
  FROM base GROUP BY x
),
gy AS (
  SELECT y, 2 * COALESCE(sum(count(*)) OVER (ORDER BY y
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + count(*) + 1 AS ry
  FROM base GROUP BY y
),
j AS (
  SELECT rx, ry
  FROM base JOIN gx USING (x) JOIN gy USING (y)
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
    sum(CAST(rx AS HUGEINT)) AS sx, sum(CAST(ry AS HUGEINT)) AS sy,
    sum(CAST(rx AS HUGEINT) * rx) AS sxx,
    sum(CAST(ry AS HUGEINT) * ry) AS syy,
    sum(CAST(rx AS HUGEINT) * ry) AS sxy
  FROM j
)
SELECT m AS n,
  CASE WHEN CAST(m AS HUGEINT) * sxx - sx * sx > 0
        AND CAST(m AS HUGEINT) * syy - sy * sy > 0 THEN
    round(CAST(CAST(m AS HUGEINT) * sxy - sx * sy AS DOUBLE)
          / (sqrt(CAST(CAST(m AS HUGEINT) * sxx - sx * sx AS DOUBLE))
             * sqrt(CAST(CAST(m AS HUGEINT) * syy - sy * sy AS DOUBLE))),
          6)
  END AS spearman
FROM agg
"""

QUERIES["spearman_value_hour"] = q_spearman_value_hour
ORACLES["spearman_value_hour"] = _SPEARMAN_SQL


def q_ips_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation (profile.ips_uniform_value): treating the
    event log as bandit feedback (action = event_type, reward = value),
    what would uniform exploration have earned vs the logged mix, and
    how fragile is the estimate (ESS)?  Order-free per-action integer
    quantized terms, one final division each."""
    from cerebro_spark.operators.profile import ips_uniform_value

    ev = load_table(spark, "events", sf_dir)
    return ips_uniform_value(ev, "event_type", "value")


_IPS_SQL = """
WITH per AS (
  SELECT event_type AS a, CAST(count(*) AS BIGINT) AS n,
    sum(CAST(CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
             AS HUGEINT)) AS s
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
  GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k, sum(CAST(n AS HUGEINT)) AS ntot,
         sum(s) AS stot
  FROM per
),
terms AS (
  SELECT k, ntot, stot,
    (s * CAST(1000000 AS HUGEINT)) // (CAST(k AS HUGEINT) * n) AS tq,
    CAST(1000000000000 AS HUGEINT) // CAST(n AS HUGEINT) AS eq
  FROM per, tot
),
agg AS (
  SELECT k, ntot, stot, sum(tq) AS ips, sum(eq) AS ess
  FROM terms GROUP BY 1, 2, 3
)
SELECT CAST(ntot AS BIGINT) AS n, k AS k_actions,
  round(CAST(stot AS DOUBLE) / CAST(ntot AS DOUBLE) / 1000000.0, 6)
    AS logged_mean,
  round(CAST(ips AS DOUBLE) / 1e12, 6) AS ips_uniform,
  round(CAST(k AS DOUBLE) * CAST(k AS DOUBLE) * 1e12
        / CAST(ess AS DOUBLE), 6) AS ess
FROM agg
"""

QUERIES["ips_event_value"] = q_ips_event_value
ORACLES["ips_event_value"] = _IPS_SQL


def q_qte_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects (profile.quantile_treatment_effect):
    treated = odd user_id (the did_launch_value split) — the arm
    quantile gaps at p = .25/.5/.75/.9.  Quantile selection is an exact
    integer comparison against ceil(p*n) with p carried as a rational;
    no IEEE op touches it."""
    from cerebro_spark.operators.profile import quantile_treatment_effect

    ev = load_table(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull()
    )
    return quantile_treatment_effect(
        ev, "value", F.pmod(F.col("user_id"), F.lit(2)) == 1
    )


_QTE_SQL = """
WITH base AS (
  SELECT CAST(user_id % 2 = 1 AS INTEGER) AS t,
    CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
),
cells AS (SELECT t, v, count(*) AS n FROM base GROUP BY 1, 2),
cum AS (
  SELECT t, v, n,
    sum(n) OVER (PARTITION BY t ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM cells
),
totals AS (SELECT t, CAST(sum(n) AS BIGINT) AS na FROM cells GROUP BY 1),
probs AS (
  SELECT * FROM (VALUES (0.25, 1, 4), (0.5, 1, 2), (0.75, 3, 4),
                        (0.9, 9, 10)) AS pr(p, pn, pd)
),
hit AS (
  SELECT p, cum.t, min(v) AS q, min(na) AS narm
  FROM cum JOIN totals USING (t) CROSS JOIN probs
  WHERE c * pd >= ((na * pn + pd - 1) - (na * pn + pd - 1) % pd)
  GROUP BY 1, 2
),
o AS (
  SELECT p,
    min(CASE WHEN t = 0 THEN narm END) AS n_control,
    min(CASE WHEN t = 1 THEN narm END) AS n_treat,
    min(CASE WHEN t = 0 THEN q END) AS qc,
    min(CASE WHEN t = 1 THEN q END) AS qt
  FROM hit GROUP BY 1
)
SELECT CAST(p AS DOUBLE) AS p, n_control, n_treat,
  round(CAST(qc AS DOUBLE) / 100.0, 6) AS q_control,
  round(CAST(qt AS DOUBLE) / 100.0, 6) AS q_treat,
  CASE WHEN qc IS NOT NULL AND qt IS NOT NULL THEN
    round(CAST(qt - qc AS DOUBLE) / 100.0, 6)
  END AS qte
FROM o
ORDER BY p ASC
"""

QUERIES["qte_value"] = q_qte_value
ORACLES["qte_value"] = _QTE_SQL


def q_paired_t_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired within-user t-test (profile.paired_t_prepost): did each
    user's mean value move across the corpus-midpoint launch?  Each user
    is their own control, so between-user variance cancels; per-user
    diffs are e6-requantized so the cross-user moments are order-free."""
    from cerebro_spark.operators.profile import paired_t_prepost

    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    mid = ev.agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long").alias("__mid")
    )
    base = ev.crossJoin(F.broadcast(mid))
    return paired_t_prepost(
        base, "value", "user_id", F.unix_micros("ts") >= F.col("__mid")
    )


_PAIRED_T_SQL = """
WITH ev AS (
  SELECT user_id AS u, epoch_us(ts) AS t,
    CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
),
mid AS (
  SELECT CAST(floor((min(t) + max(t)) / 2.0) AS BIGINT) AS mid FROM ev
),
per AS (
  SELECT u,
    sum(CASE WHEN t <  mid THEN 1 ELSE 0 END) AS n0,
    sum(CASE WHEN t <  mid THEN CAST(v AS HUGEINT) ELSE 0 END) AS s0,
    sum(CASE WHEN t >= mid THEN 1 ELSE 0 END) AS n1,
    sum(CASE WHEN t >= mid THEN CAST(v AS HUGEINT) ELSE 0 END) AS s1
  FROM ev, mid GROUP BY 1
  HAVING sum(CASE WHEN t < mid THEN 1 ELSE 0 END) > 0
     AND sum(CASE WHEN t >= mid THEN 1 ELSE 0 END) > 0
),
pd AS (
  SELECT n0, s0, n1, s1,
    CAST(floor(CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0 + 0.5)
         AS HUGEINT) AS d
  FROM per
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_units,
    sum(s0) AS ts0, sum(CAST(n0 AS HUGEINT)) AS tn0,
    sum(s1) AS ts1, sum(CAST(n1 AS HUGEINT)) AS tn1,
    sum(d) AS sd, sum(d * d) AS sdd
  FROM pd
)
SELECT n_units,
  round(CAST(ts0 AS DOUBLE) / CAST(tn0 AS DOUBLE) / 1000000.0, 6)
    AS mean_pre,
  round(CAST(ts1 AS DOUBLE) / CAST(tn1 AS DOUBLE) / 1000000.0, 6)
    AS mean_post,
  round(CAST(sd AS DOUBLE) / CAST(n_units AS DOUBLE) / 1000000.0, 6)
    AS mean_diff,
  CASE WHEN n_units > 1
        AND CAST(n_units AS HUGEINT) * sdd - sd * sd > 0 THEN
    round(
      (CAST(sd AS DOUBLE) / CAST(n_units AS DOUBLE) / 1000000.0)
      / (sqrt(CAST(CAST(n_units AS HUGEINT) * sdd - sd * sd AS DOUBLE)
              / CAST(CAST(n_units AS HUGEINT) * (n_units - 1) AS DOUBLE))
         / 1000000.0 / sqrt(CAST(n_units AS DOUBLE))), 6)
  END AS t
FROM agg
"""

QUERIES["paired_t_value"] = q_paired_t_value
ORACLES["paired_t_value"] = _PAIRED_T_SQL

def q_kendall_tau_value_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b (profile.kendall_tau): the pairwise-concordance
    companion of spearman_value_hour on the same (value, hour) pair.
    Exact pair counting on the dense contingency grid via exclusive 2-D
    cumulatives; all pair sums exact DECIMALs."""
    from cerebro_spark.operators.profile import kendall_tau

    ev = load_table(spark, "events", sf_dir).select(
        "value", F.hour(F.col("ts")).alias("hour")
    )
    return kendall_tau(ev, "value", "hour", x_quant=100, y_quant=1)


_KENDALL_SQL = """
WITH base AS (
  SELECT CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS x,
         CAST(hour(ts) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
cells AS (
  SELECT x, y, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY x, y
),
grid AS (
  SELECT xs.x, ys.y, COALESCE(c.c, 0) AS c0
  FROM (SELECT DISTINCT x FROM cells) xs
  CROSS JOIN (SELECT DISTINCT y FROM cells) ys
  LEFT JOIN cells c USING (x, y)
),
gf AS (
  SELECT x, y, c0,
    COALESCE(sum(CAST(c0 AS HUGEINT)) OVER (PARTITION BY y ORDER BY x
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS f
  FROM grid
),
gg AS (
  SELECT x, y, f,
    COALESCE(sum(f) OVER (PARTITION BY x ORDER BY y
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS g,
    sum(f) OVER (PARTITION BY x) AS t
  FROM gf
),
pq AS (
  SELECT sum(CAST(c.c AS HUGEINT) * gg.g) AS p,
         sum(CAST(c.c AS HUGEINT) * (gg.t - gg.f - gg.g)) AS q
  FROM cells c JOIN gg USING (x, y)
),
tx AS (
  SELECT sum(t * (t - 1)) AS n1x2, sum(t) AS n
  FROM (SELECT CAST(sum(c) AS HUGEINT) AS t FROM cells GROUP BY x)
),
ty AS (
  SELECT sum(t * (t - 1)) AS n2x2
  FROM (SELECT CAST(sum(c) AS HUGEINT) AS t FROM cells GROUP BY y)
)
SELECT CAST(n AS BIGINT) AS n,
  CASE WHEN n1x2 < n * (n - 1) AND n2x2 < n * (n - 1) THEN
    round(2.0 * CAST(p - q AS DOUBLE)
          / (sqrt(CAST(n * (n - 1) - n1x2 AS DOUBLE))
             * sqrt(CAST(n * (n - 1) - n2x2 AS DOUBLE))), 6)
  END AS tau_b
FROM pq, tx, ty
"""

QUERIES["kendall_tau_value_hour"] = q_kendall_tau_value_hour
ORACLES["kendall_tau_value_hour"] = _KENDALL_SQL


def q_anova_value_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA (profile.anova_oneway): does event_type explain any
    of value's variance?  Exact e6 moments; floor-division cross-group
    terms; F and eta-squared as fixed IEEE chains."""
    from cerebro_spark.operators.profile import anova_oneway

    return anova_oneway(
        load_table(spark, "events", sf_dir), "event_type", "value"
    )


_ANOVA_SQL = """
WITH per AS (
  SELECT event_type,
    CAST(count(*) AS BIGINT) AS n,
    sum(CAST(CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
             AS HUGEINT)) AS s,
    sum(CAST(CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
             AS HUGEINT)
        * CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))
      AS ss
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
  GROUP BY 1
),
agg AS (
  SELECT sum(CAST(n AS HUGEINT)) AS nn, CAST(count(*) AS BIGINT) AS k,
    sum(s) AS stot, sum(ss) AS sstot,
    sum((s * s) // CAST(n AS HUGEINT)) AS t
  FROM per
),
parts AS (
  SELECT nn, k, sstot, t,
    greatest(t - (stot * stot) // nn, 0) AS ssb,
    greatest(sstot - (stot * stot) // nn, 0) AS sst,
    sstot - t AS ssw
  FROM agg
)
SELECT CAST(nn AS BIGINT) AS n, k AS k_groups,
  CASE WHEN k >= 2 AND nn > CAST(k AS HUGEINT) AND sst > 0 AND ssw > 0 THEN
    round((CAST(ssb AS DOUBLE) / CAST(k - 1 AS DOUBLE))
          / (CAST(ssw AS DOUBLE) / CAST(nn - k AS DOUBLE)), 6)
  END AS f_stat,
  CASE WHEN sst > 0 THEN round(CAST(ssb AS DOUBLE) / CAST(sst AS DOUBLE), 6)
  END AS eta_sq
FROM parts
"""

QUERIES["anova_value_type"] = q_anova_value_type
ORACLES["anova_value_type"] = _ANOVA_SQL


def q_theil_index_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality (profile.theil_index) of positive event values
    within each event_type — the entropy-family companion of
    revenue_gini.  Per-distinct-value log terms as exact integers."""
    from cerebro_spark.operators.profile import theil_index

    return theil_index(
        load_table(spark, "events", sf_dir), "event_type", "value"
    )


_THEIL_SQL = """
WITH cells AS (
  SELECT event_type AS "group",
    CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS v,
    CAST(count(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
    AND CAST(value AS DOUBLE) > 0
    AND CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) > 0
  GROUP BY 1, 2
),
totals AS (
  SELECT "group", sum(CAST(c AS HUGEINT)) AS n,
         sum(CAST(c AS HUGEINT) * v) AS s
  FROM cells GROUP BY 1
),
terms AS (
  SELECT cells."group", n, s,
    CAST(c AS HUGEINT) * v
      * CAST(floor(ln(CAST(v AS DOUBLE) * CAST(n AS DOUBLE)
                      / CAST(s AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
      AS t
  FROM cells JOIN totals USING ("group")
)
SELECT "group", CAST(max(n) AS BIGINT) AS n,
  round(CAST(max(s) AS DOUBLE) / CAST(max(n) AS DOUBLE) / 1000000.0, 6)
    AS mean,
  round(CAST(sum(t) AS DOUBLE) / (CAST(max(s) AS DOUBLE) * 1000000.0), 6)
    AS theil_t
FROM terms GROUP BY 1
"""

QUERIES["theil_index_type"] = q_theil_index_type
ORACLES["theil_index_type"] = _THEIL_SQL


def q_hhi_supplier_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue concentration per nation
    (profile.hhi_concentration): lineitem revenue attributed to the
    supplier's nation; HHI + top-supplier share from exact e4 revenue
    integers.  Constant-size dims broadcast."""
    from cerebro_spark.operators.profile import hhi_concentration

    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    j = li.join(sup, li.l_suppkey == sup.s_suppkey).join(
        F.broadcast(nat), sup.s_nationkey == nat.n_nationkey
    )
    j = j.select(
        F.col("n_name"),
        F.col("s_suppkey"),
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "rev"
        ),
    )
    return hhi_concentration(j, "n_name", "s_suppkey", "rev", quant=10000)


_HHI_SQL = """
WITH firms AS (
  SELECT n_name AS market, s_suppkey,
    sum(CAST(CAST(floor(CAST(l_extendedprice * (1.0 - l_discount) AS DOUBLE)
                        * 10000.0 + 0.5) AS BIGINT) AS HUGEINT)) AS r
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY 1, 2
),
agg AS (
  SELECT market, CAST(count(*) AS BIGINT) AS n_firms,
    sum(r) AS rr_sum, sum(r * r) AS rr_sq, max(r) AS mx
  FROM firms GROUP BY 1
)
SELECT market, n_firms,
  CASE WHEN rr_sum > 0 THEN
    round(CAST(rr_sq AS DOUBLE)
          / (CAST(rr_sum AS DOUBLE) * CAST(rr_sum AS DOUBLE)), 6)
  END AS hhi,
  CASE WHEN rr_sum > 0 THEN
    round(CAST(mx AS DOUBLE) / CAST(rr_sum AS DOUBLE), 6)
  END AS top_share
FROM agg
"""

QUERIES["hhi_supplier_share"] = q_hhi_supplier_share
ORACLES["hhi_supplier_share"] = _HHI_SQL

def _user_lifetimes(spark: SparkSession, sf_dir: str, with_group: bool = False):
    """User lifetimes in days, censored on the corpus' final day — the
    survival_km input frame, shared by the hazard/log-rank queries."""
    ev = load_table(spark, "events", sf_dir)
    corpus_max = ev.agg(F.max(F.col("ts").cast("long")).alias("__cm"))
    aggs = [
        F.min(F.col("ts").cast("long")).alias("__first"),
        F.max(F.col("ts").cast("long")).alias("__last"),
    ]
    lives = (
        ev.groupBy("user_id")
        .agg(*aggs)
        .crossJoin(F.broadcast(corpus_max))
        .select(
            F.col("user_id"),
            F.floor((F.col("__last") - F.col("__first")) / 86400)
            .cast("long")
            .alias("t"),
            (F.col("__last") >= F.col("__cm") - 86400)
            .cast("int")
            .alias("censored"),
        )
    )
    if with_group:
        lives = lives.withColumn("grp", F.pmod(F.col("user_id"), F.lit(2)))
    return lives


def q_nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard (profile.nelson_aalen) over the
    survival_km user lifetimes — exact ⌊d·10¹²/n⌋ increments summed as
    integers over the bounded day grid."""
    from cerebro_spark.operators.profile import nelson_aalen

    return nelson_aalen(_user_lifetimes(spark, sf_dir), "t", "censored")


_NELSON_AALEN_SQL = """
WITH cm AS (SELECT max(floor(epoch(ts))) AS corpus_max FROM events),
lives AS (
  SELECT
    CAST(floor((max(floor(epoch(ts))) - min(floor(epoch(ts)))) / 86400)
         AS BIGINT) AS t,
    CASE WHEN max(floor(epoch(ts))) >= (SELECT corpus_max FROM cm) - 86400
         THEN 1 ELSE 0 END AS censored
  FROM events GROUP BY user_id
),
grid AS (
  SELECT t, CAST(count(*) AS BIGINT) AS ending,
    CAST(sum(1 - censored) AS BIGINT) AS d_events
  FROM lives GROUP BY t
),
staged AS (
  SELECT t, d_events,
    sum(ending) OVER () - coalesce(sum(ending) OVER (
      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS n_at_risk
  FROM grid
),
terms AS (
  SELECT t, n_at_risk, d_events,
    (CAST(d_events AS HUGEINT) * 1000000000000) // CAST(n_at_risk AS HUGEINT)
      AS h12
  FROM staged
)
SELECT t, CAST(n_at_risk AS BIGINT) AS n_at_risk, d_events,
  round(CAST(sum(h12) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS DOUBLE) / 1e12, 9)
    AS cum_hazard
FROM terms
"""

QUERIES["nelson_aalen_hazard"] = q_nelson_aalen_hazard
ORACLES["nelson_aalen_hazard"] = _NELSON_AALEN_SQL


def q_logrank_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test (profile.logrank_test): do odd and even
    user_id cohorts share a lifetime curve?  Hypergeometric expectations
    and variances as staged exact integer floors over the day grid."""
    from cerebro_spark.operators.profile import logrank_test

    return logrank_test(
        _user_lifetimes(spark, sf_dir, with_group=True),
        "t",
        "censored",
        "grp",
    )


_LOGRANK_SQL = """
WITH cm AS (SELECT max(floor(epoch(ts))) AS corpus_max FROM events),
lives AS (
  SELECT user_id % 2 AS g,
    CAST(floor((max(floor(epoch(ts))) - min(floor(epoch(ts)))) / 86400)
         AS BIGINT) AS t,
    CASE WHEN max(floor(epoch(ts))) >= (SELECT corpus_max FROM cm) - 86400
         THEN 1 ELSE 0 END AS censored
  FROM events GROUP BY user_id
),
cells AS (
  SELECT g, t, CAST(count(*) AS BIGINT) AS ending,
    CAST(sum(1 - censored) AS BIGINT) AS d
  FROM lives GROUP BY g, t
),
dense AS (
  SELECT gs.g, ts.t, COALESCE(c.ending, 0) AS ending, COALESCE(c.d, 0) AS d
  FROM (SELECT DISTINCT t FROM cells) ts
  CROSS JOIN (SELECT DISTINCT g FROM cells) gs
  LEFT JOIN cells c USING (g, t)
),
risk AS (
  SELECT g, t, d,
    sum(ending) OVER (PARTITION BY g) - coalesce(sum(ending) OVER (
      PARTITION BY g ORDER BY t
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r
  FROM dense
),
per_t AS (
  SELECT t,
    sum(CASE WHEN g = 1 THEN r ELSE 0 END) AS n1,
    sum(CASE WHEN g = 0 THEN r ELSE 0 END) AS n2,
    sum(CASE WHEN g = 1 THEN d ELSE 0 END) AS d1,
    sum(CASE WHEN g = 0 THEN d ELSE 0 END) AS d2
  FROM risk GROUP BY t
),
staged AS (
  SELECT d1, d2,
    (CAST(d1 + d2 AS HUGEINT) * CAST(n1 AS HUGEINT) * 1000000)
      // CAST(n1 + n2 AS HUGEINT) AS a,
    n1, n2
  FROM per_t WHERE d1 + d2 > 0
),
staged2 AS (
  SELECT d1, d2, a, n1, n2,
    (a * CAST(n2 AS HUGEINT)) // CAST(n1 + n2 AS HUGEINT) AS b
  FROM staged
),
staged3 AS (
  SELECT d1, d2, a,
    CASE WHEN n1 + n2 > 1 THEN
      (b * CAST(n1 + n2 - d1 - d2 AS HUGEINT)) // CAST(n1 + n2 - 1 AS HUGEINT)
    ELSE 0 END AS v
  FROM staged2
),
counts AS (
  SELECT
    CAST(sum(CASE WHEN g = 1 THEN ending ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN g = 0 THEN ending ELSE 0 END) AS BIGINT) AS n2
  FROM cells
),
agg AS (
  SELECT CAST(sum(d1) AS BIGINT) AS o1, CAST(sum(d2) AS BIGINT) AS o2,
    sum(a) AS e1q, sum(CAST(d1 + d2 AS HUGEINT)) AS dd, sum(v) AS vq
  FROM staged3
)
SELECT counts.n1, counts.n2, o1,
  round(CAST(e1q AS DOUBLE) / 1e6, 6) AS e1,
  o2,
  round(CAST(dd AS DOUBLE) - CAST(e1q AS DOUBLE) / 1e6, 6) AS e2,
  CASE WHEN vq > 0 THEN
    round((CAST(o1 AS DOUBLE) - CAST(e1q AS DOUBLE) / 1e6)
          * (CAST(o1 AS DOUBLE) - CAST(e1q AS DOUBLE) / 1e6)
          / (CAST(vq AS DOUBLE) / 1e6), 6)
  END AS chi2
FROM agg, counts
"""

QUERIES["logrank_survival"] = q_logrank_survival
ORACLES["logrank_survival"] = _LOGRANK_SQL


def q_value_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift table (profile.decile_lift): score = each user's
    pre-midpoint total value (exact e6 integer), outcome = any
    post-midpoint purchase — the targeting readout for an RFM-style
    propensity score.  Exact-rank decile boundaries, no global NTILE."""
    from cerebro_spark.operators.profile import decile_lift

    ev = load_table(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull()
    )
    mid = ev.agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long")
        .alias("__mid")
    )
    v6 = F.floor(F.col("value").cast("double") * 1000000.0 + F.lit(0.5)).cast(
        "long"
    )
    pre = F.unix_micros("ts") < F.col("__mid")
    users = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(pre & F.col("value").isNotNull(), v6).otherwise(0)
            )
            .cast("long")
            .alias("score"),
            F.max(
                (~pre & (F.col("event_type") == "purchase")).cast("int")
            ).alias("converted"),
        )
    )
    return decile_lift(users, "score", "converted", quant=1)


_DECILE_LIFT_SQL = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS tus, event_type,
    CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS v6,
    value
  FROM events WHERE user_id IS NOT NULL
),
mid AS (SELECT CAST((min(tus) + max(tus)) / 2 AS BIGINT) AS m FROM ev),
users AS (
  SELECT user_id,
    CAST(sum(CASE WHEN tus < (SELECT m FROM mid) AND value IS NOT NULL
                  THEN v6 ELSE 0 END) AS BIGINT) AS s,
    max(CASE WHEN tus >= (SELECT m FROM mid) AND event_type = 'purchase'
             THEN 1 ELSE 0 END) AS y
  FROM ev GROUP BY user_id
),
qs AS (
  SELECT CAST(floor(CAST(s AS DOUBLE) * 1.0 + 0.5) AS BIGINT) AS s, y
  FROM users
),
grid AS (
  SELECT s, CAST(count(*) AS BIGINT) AS c FROM qs GROUP BY s
),
cumg AS (
  SELECT s, sum(c) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum,
         sum(c) OVER () AS n
  FROM grid
),
bounds AS (
  SELECT
    min(CASE WHEN cum * 10 >= n * 1 THEN s END) AS b1,
    min(CASE WHEN cum * 10 >= n * 2 THEN s END) AS b2,
    min(CASE WHEN cum * 10 >= n * 3 THEN s END) AS b3,
    min(CASE WHEN cum * 10 >= n * 4 THEN s END) AS b4,
    min(CASE WHEN cum * 10 >= n * 5 THEN s END) AS b5,
    min(CASE WHEN cum * 10 >= n * 6 THEN s END) AS b6,
    min(CASE WHEN cum * 10 >= n * 7 THEN s END) AS b7,
    min(CASE WHEN cum * 10 >= n * 8 THEN s END) AS b8,
    min(CASE WHEN cum * 10 >= n * 9 THEN s END) AS b9
  FROM cumg
),
bucketed AS (
  SELECT 1 + CAST(b1 < s AS INT) + CAST(b2 < s AS INT) + CAST(b3 < s AS INT)
           + CAST(b4 < s AS INT) + CAST(b5 < s AS INT) + CAST(b6 < s AS INT)
           + CAST(b7 < s AS INT) + CAST(b8 < s AS INT) + CAST(b9 < s AS INT)
      AS decile, y
  FROM qs, bounds
),
per AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_units,
    CAST(sum(y) AS BIGINT) AS n_pos
  FROM bucketed GROUP BY decile
),
tot AS (
  SELECT decile, n_units, n_pos,
    sum(n_units) OVER () AS nn, sum(n_pos) OVER () AS pp,
    sum(n_pos) OVER (ORDER BY decile DESC ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS cp
  FROM per
)
SELECT decile, n_units, n_pos,
  round(CAST(n_pos AS DOUBLE) / CAST(n_units AS DOUBLE), 6)
    AS response_rate,
  CASE WHEN pp > 0 THEN
    round((CAST(n_pos AS DOUBLE) / CAST(n_units AS DOUBLE))
          / (CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE)), 6)
  END AS lift,
  CASE WHEN pp > 0 THEN
    round(CAST(cp AS DOUBLE) / CAST(pp AS DOUBLE), 6)
  END AS cum_capture
FROM tot
"""

QUERIES["value_decile_lift"] = q_value_decile_lift
ORACLES["value_decile_lift"] = _DECILE_LIFT_SQL

def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition (profile.brier_decomposition) of the
    calibration_events baseline scorer against the purchase label —
    splits Brier into miscalibration (fixable) vs no-discrimination (a
    model problem); exact identity in quantized space."""
    from cerebro_spark.operators.profile import brier_decomposition

    ev = load_table(spark, "events", sf_dir)
    score = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
               16, 10).cast("long") % 1_000_000
    ).cast("double") / 1_000_000.0
    scored = ev.select(
        score.alias("score"),
        (F.col("event_type") == "purchase").alias("label"),
    )
    return brier_decomposition(scored, "score", "label", quant=1000)


def _brier_sql() -> str:
    from cerebro_spark.queries.extensions import _hex2long_sql

    h = _hex2long_sql("md5(CAST(event_id AS VARCHAR))", 8) + " % 1000000"
    return f"""
WITH scored AS (
  SELECT CAST({h} AS DOUBLE) / 1000000.0 AS score,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
per AS (
  SELECT CAST(floor(score * 1000.0 + 0.5) AS BIGINT) AS f,
    CAST(count(*) AS BIGINT) AS nk, CAST(sum(y) AS BIGINT) AS pos
  FROM scored GROUP BY 1
),
tot AS (
  SELECT sum(CAST(nk AS HUGEINT)) AS n, sum(CAST(pos AS HUGEINT)) AS p
  FROM per
),
terms AS (
  SELECT n, p,
    CAST(pos AS HUGEINT) * (f - 1000) * (f - 1000)
      + CAST(nk - pos AS HUGEINT) * f * f AS bq,
    ((CAST(nk AS HUGEINT) * f - 1000 * CAST(pos AS HUGEINT))
     * (CAST(nk AS HUGEINT) * f - 1000 * CAST(pos AS HUGEINT)))
      // CAST(nk AS HUGEINT) AS rq,
    ((CAST(pos AS HUGEINT) * n - p * nk)
     * (CAST(pos AS HUGEINT) * n - p * nk)) // CAST(nk AS HUGEINT) AS sq
  FROM per, tot
),
agg AS (
  SELECT max(n) AS n, max(p) AS p,
    sum(bq) AS b, sum(rq) AS r, sum(sq) AS s
  FROM terms
)
SELECT CAST(n AS BIGINT) AS n,
  round(CAST(b AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0), 6) AS brier,
  round(CAST(r AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0), 6)
    AS reliability,
  round(CAST(s AS DOUBLE)
        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)
    AS resolution,
  round(CAST(p AS DOUBLE) * CAST(n - p AS DOUBLE)
        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS uncertainty
FROM agg
"""


QUERIES["brier_decomposition"] = q_brier_decomposition
ORACLES["brier_decomposition"] = _brier_sql()

def q_mann_whitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (profile.mann_whitney_u): odd vs even user_id value
    distributions — the outlier-immune companion of ab_test_ztest;
    combined-grid midranks, exact tie-corrected variance."""
    from cerebro_spark.operators.profile import mann_whitney_u

    ev = load_table(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull()
    )
    return mann_whitney_u(
        ev, F.pmod(F.col("user_id"), F.lit(2)), "value", quant=100
    )


_MWU_SQL = """
WITH base AS (
  SELECT CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS v,
    CAST(user_id % 2 AS INT) AS g
  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
),
grid AS (
  SELECT v, CAST(count(*) AS BIGINT) AS t, CAST(sum(g) AS BIGINT) AS n1v
  FROM base GROUP BY v
),
mr AS (
  SELECT v, t, n1v,
    2 * COALESCE(sum(t) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1
      AS mr2
  FROM grid
),
agg AS (
  SELECT sum(CAST(t AS HUGEINT)) AS n, sum(CAST(n1v AS HUGEINT)) AS n1,
    sum(CAST(n1v AS HUGEINT) * mr2) AS r1x2,
    sum(CAST(t AS HUGEINT) * t * t - t) AS ties
  FROM mr
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n - n1 AS BIGINT) AS n2,
  round(CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0, 1) AS u1,
  CASE WHEN n1 * (n - n1) * ((n + 1) * n * (n - 1) - ties) > 0 THEN
    round((CAST(r1x2 - n1 * (n1 + 1) - n1 * (n - n1) AS DOUBLE) / 2.0)
          / sqrt(CAST(n1 * (n - n1) * ((n + 1) * n * (n - 1) - ties)
                      AS DOUBLE)
                 / (12.0 * CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))), 6)
  END AS z,
  CASE WHEN n1 > 0 AND n - n1 > 0 THEN
    round(1.0 - CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE)
          / CAST(n1 * (n - n1) AS DOUBLE), 6)
  END AS rank_biserial
FROM agg
"""

QUERIES["mann_whitney_value"] = q_mann_whitney_value
ORACLES["mann_whitney_value"] = _MWU_SQL


def q_kruskal_value_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H (profile.kruskal_wallis) of value across event
    types — the rank-based companion of anova_value_type; combined-grid
    midranks, floor-division cross-group terms, exact tie rational."""
    from cerebro_spark.operators.profile import kruskal_wallis

    return kruskal_wallis(
        load_table(spark, "events", sf_dir), "event_type", "value", quant=100
    )


_KRUSKAL_SQL = """
WITH cells AS (
  SELECT event_type AS g,
    CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS v,
    CAST(count(*) AS BIGINT) AS c
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
grid AS (
  SELECT v, CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY v
),
mr AS (
  SELECT v, t,
    2 * COALESCE(sum(t) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1
      AS mr2
  FROM grid
),
per AS (
  SELECT g, sum(CAST(c AS HUGEINT)) AS ng,
    sum(CAST(c AS HUGEINT) * mr.mr2) AS rgx2
  FROM cells JOIN mr USING (v) GROUP BY g
),
perq AS (SELECT g, ng, (rgx2 * rgx2) // ng AS q FROM per),
ties AS (
  SELECT sum(CAST(t AS HUGEINT) * t * t - t) AS ties FROM grid
),
agg AS (
  SELECT sum(ng) AS n, CAST(count(*) AS BIGINT) AS k, sum(q) AS qq
  FROM perq
)
SELECT CAST(n AS BIGINT) AS n, k AS k_groups,
  CASE WHEN k >= 2 AND n > CAST(k AS HUGEINT)
        AND ties < n * n * n - n THEN
    round((3.0 * CAST(qq AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
           - 3.0 * (CAST(n AS DOUBLE) + 1.0))
          / (1.0 - CAST(ties AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                - CAST(n AS DOUBLE))), 6)
  END AS h_stat,
  CASE WHEN k >= 2 AND n > CAST(k AS HUGEINT)
        AND ties < n * n * n - n THEN
    round(((3.0 * CAST(qq AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
            - 3.0 * (CAST(n AS DOUBLE) + 1.0))
           / (1.0 - CAST(ties AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                 - CAST(n AS DOUBLE)))
           - (CAST(k AS DOUBLE) - 1.0))
          / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)), 6)
  END AS epsilon_sq
FROM agg, ties
"""

QUERIES["kruskal_value_type"] = q_kruskal_value_type
ORACLES["kruskal_value_type"] = _KRUSKAL_SQL


def q_event_study_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study leads/lags (profile.event_study): weekly treated-vs-
    control value gaps around the corpus-midpoint launch, re-based to
    week -1 — DiD's parallel-trends validity gate made visible."""
    from cerebro_spark.operators.profile import event_study

    ev = load_table(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull()
    )
    mid = ev.agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long")
        .alias("__mid")
    )
    base = ev.crossJoin(F.broadcast(mid))
    week = F.floor(
        (F.unix_micros("ts") - F.col("__mid")).cast("double")
        / F.lit(604800.0 * 1e6)
    )
    return event_study(
        base,
        "value",
        F.pmod(F.col("user_id"), F.lit(2)) == 1,
        week,
        base_period=-1,
    )


_EVENT_STUDY_SQL = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t, value,
    CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS v
  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
),
mid AS (SELECT CAST((min(t) + max(t)) / 2 AS BIGINT) AS m FROM ev),
cells AS (
  SELECT
    CAST(floor(CAST(t - (SELECT m FROM mid) AS DOUBLE) / 604800000000.0)
         AS BIGINT) AS period,
    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_treated,
    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_control,
    sum(CASE WHEN user_id % 2 = 1 THEN CAST(v AS HUGEINT) ELSE 0 END) AS st,
    sum(CASE WHEN user_id % 2 = 0 THEN CAST(v AS HUGEINT) ELSE 0 END) AS sc
  FROM ev GROUP BY 1
),
per AS (
  SELECT period, n_treated, n_control,
    CASE WHEN n_treated > 0 THEN
      round(CAST(st AS DOUBLE) / n_treated / 1e6, 6) END AS mean_treated,
    CASE WHEN n_control > 0 THEN
      round(CAST(sc AS DOUBLE) / n_control / 1e6, 6) END AS mean_control,
    CASE WHEN n_treated > 0 AND n_control > 0 THEN
      round(CAST(st AS DOUBLE) / n_treated / 1e6
            - CAST(sc AS DOUBLE) / n_control / 1e6, 6) END AS gap
  FROM cells
),
base AS (
  SELECT max(CASE WHEN period = -1 THEN gap END) AS bg FROM per
)
SELECT period, n_treated, n_control, mean_treated, mean_control, gap,
  round(gap - bg, 6) AS gap_vs_base
FROM per, base
"""

QUERIES["event_study_weekly"] = q_event_study_weekly
ORACLES["event_study_weekly"] = _EVENT_STUDY_SQL

def q_ols_value_hour_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-regressor OLS (profile.ols_two_factor): value ~ hour +
    day-of-week in ONE fit — the partial hour effect with weekday held
    fixed; ten exact DECIMAL moments, Cramer's-rule IEEE chain."""
    from cerebro_spark.operators.profile import ols_two_factor

    ev = load_table(spark, "events", sf_dir)
    return ols_two_factor(
        ev, "value", F.hour(F.col("ts")), F.dayofweek(F.col("ts"))
    )


_OLS2_SQL = """
WITH base AS (
  SELECT CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS y,
    CAST(floor(CAST(hour(ts) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS x1,
    CAST(floor(CAST(dayofweek(ts) + 1 AS DOUBLE) * 1000000.0 + 0.5)
      AS BIGINT) AS x2
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    sum(CAST(x1 AS HUGEINT)) AS s1, sum(CAST(x2 AS HUGEINT)) AS s2,
    sum(CAST(y AS HUGEINT)) AS sy,
    sum(CAST(x1 AS HUGEINT) * x1) AS s11,
    sum(CAST(x2 AS HUGEINT) * x2) AS s22,
    sum(CAST(x1 AS HUGEINT) * x2) AS s12,
    sum(CAST(x1 AS HUGEINT) * y) AS s1y,
    sum(CAST(x2 AS HUGEINT) * y) AS s2y,
    sum(CAST(y AS HUGEINT) * y) AS syy
  FROM base
),
m AS (
  SELECT n,
    CAST(s11 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS a11,
    CAST(s22 AS DOUBLE) * n - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS a22,
    CAST(s12 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS a12,
    CAST(s1y AS DOUBLE) * n - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS c1,
    CAST(s2y AS DOUBLE) * n - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS c2,
    CAST(syy AS DOUBLE) * n - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS syc,
    CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
    CAST(sy AS DOUBLE) AS syd
  FROM agg
),
sol AS (
  SELECT n, a11, a22, a12, c1, c2, syc, s1d, s2d, syd,
    a11 * a22 - a12 * a12 AS det
  FROM m
)
SELECT n,
  CASE WHEN n >= 3 AND det > 0 THEN
    round((syd - ((c1 * a22 - c2 * a12) / det) * s1d
               - ((c2 * a11 - c1 * a12) / det) * s2d)
          / CAST(n AS DOUBLE) / 1000000.0, 6)
  END AS b0,
  CASE WHEN n >= 3 AND det > 0 THEN
    round((c1 * a22 - c2 * a12) / det, 6) END AS b1,
  CASE WHEN n >= 3 AND det > 0 THEN
    round((c2 * a11 - c1 * a12) / det, 6) END AS b2,
  CASE WHEN n >= 3 AND det > 0 AND syc > 0 THEN
    round(1.0 - (syc - ((c1 * a22 - c2 * a12) / det) * c1
                     - ((c2 * a11 - c1 * a12) / det) * c2) / syc, 6)
  END AS r2
FROM sol
"""

QUERIES["ols_value_hour_dow"] = q_ols_value_hour_dow
ORACLES["ols_value_hour_dow"] = _OLS2_SQL


def q_yuen_trimmed_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yuen's trimmed t (profile.yuen_trimmed_t): 20%-trimmed means of
    odd vs even user arms with winsorized variances — whale-immune A/B
    in money units; exact-rank trims over the value grid."""
    from cerebro_spark.operators.profile import yuen_trimmed_t

    ev = load_table(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull()
    )
    return yuen_trimmed_t(
        ev, F.pmod(F.col("user_id"), F.lit(2)), "value", quant=100
    )


_YUEN_SQL = """
WITH grid AS (
  SELECT CAST(user_id % 2 AS INT) AS g,
    CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS q,
    CAST(count(*) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2
),
cum AS (
  SELECT g, q, c,
    sum(c) OVER (PARTITION BY g ORDER BY q
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    sum(c) OVER (PARTITION BY g) AS n
  FROM grid
),
bounds AS (
  SELECT g,
    min(CASE WHEN cum >= (20 * n) // 100 + 1 THEN q END) AS vlo,
    min(CASE WHEN cum >= n - (20 * n) // 100 THEN q END) AS vhi,
    max(n) AS n,
    max((20 * n) // 100 + 1) AS lor,
    max(n - (20 * n) // 100) AS hir
  FROM cum GROUP BY g
),
cells AS (
  SELECT cum.g, q, c, cum, b.n, b.vlo, b.vhi, b.lor, b.hir,
    greatest(CAST(0 AS BIGINT),
      least(cum, b.hir) - greatest(cum - c + 1, b.lor) + 1) AS ov,
    greatest(least(q, b.vhi), b.vlo) AS cl
  FROM cum JOIN bounds b USING (g)
),
per AS (
  SELECT g, max(n) AS n, max(hir) - max(lor) + 1 AS h,
    sum(CAST(ov AS HUGEINT) * q) AS ts,
    sum(CAST(cl AS HUGEINT) * c) AS ws,
    sum(CAST(cl AS HUGEINT) * cl * c) AS wss
  FROM cells GROUP BY g
),
armed AS (
  SELECT
    max(CASE WHEN g = 0 THEN n END) AS n1,
    max(CASE WHEN g = 1 THEN n END) AS n2,
    max(CASE WHEN g = 0 THEN h END) AS h1,
    max(CASE WHEN g = 1 THEN h END) AS h2,
    max(CASE WHEN g = 0 THEN CAST(ts AS DOUBLE) END) AS ts0,
    max(CASE WHEN g = 1 THEN CAST(ts AS DOUBLE) END) AS ts1,
    max(CASE WHEN g = 0 THEN CAST(ws AS DOUBLE) END) AS ws0,
    max(CASE WHEN g = 1 THEN CAST(ws AS DOUBLE) END) AS ws1,
    max(CASE WHEN g = 0 THEN CAST(wss AS DOUBLE) END) AS wss0,
    max(CASE WHEN g = 1 THEN CAST(wss AS DOUBLE) END) AS wss1
  FROM per
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
  CAST(h1 AS BIGINT) AS h1, CAST(h2 AS BIGINT) AS h2,
  round(ts0 / h1 / 100.0, 6) AS tmean1,
  round(ts1 / h2 / 100.0, 6) AS tmean2,
  round(ts1 / h2 / 100.0 - ts0 / h1 / 100.0, 6) AS diff,
  CASE WHEN (wss0 - ws0 * ws0 / n1) / (h1 * (h1 - 1.0)) / 10000.0
          + (wss1 - ws1 * ws1 / n2) / (h2 * (h2 - 1.0)) / 10000.0 > 0 THEN
    round((ts1 / h2 / 100.0 - ts0 / h1 / 100.0)
          / sqrt((wss0 - ws0 * ws0 / n1) / (h1 * (h1 - 1.0)) / 10000.0
                 + (wss1 - ws1 * ws1 / n2) / (h2 * (h2 - 1.0)) / 10000.0),
          6)
  END AS t
FROM armed
"""

QUERIES["yuen_trimmed_value"] = q_yuen_trimmed_value
ORACLES["yuen_trimmed_value"] = _YUEN_SQL

def q_purchase_hour_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend (profile.cochran_armitage): does purchase
    propensity trend monotonically across hour-of-day?  Exact DECIMAL
    moments carried xN; one combinable pass."""
    from cerebro_spark.operators.profile import cochran_armitage

    ev = load_table(spark, "events", sf_dir)
    return cochran_armitage(
        ev,
        F.hour(F.col("ts")),
        (F.col("event_type") == "purchase").cast("int"),
    )


_COCHRAN_SQL = """
WITH per AS (
  SELECT CAST(hour(ts) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      AS r
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
agg AS (
  SELECT sum(CAST(n AS HUGEINT)) AS nn, CAST(count(*) AS BIGINT) AS k,
    sum(CAST(r AS HUGEINT)) AS rr,
    sum(CAST(s AS HUGEINT) * r) AS sr,
    sum(CAST(s AS HUGEINT) * n) AS sn,
    sum(CAST(s AS HUGEINT) * s * n) AS ssn
  FROM per
)
SELECT CAST(nn AS BIGINT) AS n, k AS k_levels,
  round(CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS p_pooled,
  CASE WHEN nn * sr - rr * sn > 0 THEN 1
       WHEN nn * sr - rr * sn < 0 THEN -1 ELSE 0 END AS slope_sign,
  CASE WHEN rr > 0 AND rr < nn AND nn * ssn - sn * sn > 0 THEN
    round(CAST(nn * sr - rr * sn AS DOUBLE) / CAST(nn AS DOUBLE)
          / sqrt((CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
                 * (1.0 - CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
                 * (CAST(nn * ssn - sn * sn AS DOUBLE)
                    / CAST(nn AS DOUBLE))), 6)
  END AS z
FROM agg
"""

QUERIES["purchase_hour_trend"] = q_purchase_hour_trend
ORACLES["purchase_hour_trend"] = _COCHRAN_SQL

def q_revenue_per_event_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-metric A/B (profile.ratio_metric_ztest): revenue-per-event
    (Σ purchase value / Σ events per arm) with delta-method variance
    over per-user (X, Y) — the CTR-style test ab_test_ztest can't do."""
    from cerebro_spark.operators.profile import ratio_metric_ztest

    ev = load_table(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull()
    )
    num = F.when(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull(),
        F.col("value"),
    ).otherwise(F.lit(0.0))
    return ratio_metric_ztest(
        ev, "user_id", num, F.lit(1.0), F.pmod(F.col("user_id"), F.lit(2))
    )


_RATIO_SQL = """
WITH units AS (
  SELECT CAST(user_id % 2 AS INT) AS g, user_id,
    sum(CAST(floor(CAST(CASE WHEN event_type = 'purchase'
                              AND value IS NOT NULL
                         THEN value ELSE 0.0 END AS DOUBLE)
                   * 1000000.0 + 0.5) AS BIGINT)) AS x,
    sum(CAST(1000000 AS BIGINT)) AS y
  FROM events WHERE user_id IS NOT NULL
  GROUP BY 1, 2
),
per AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
    sum(CAST(x AS HUGEINT) * x) AS sxx,
    sum(CAST(y AS HUGEINT) * y) AS syy,
    sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM units GROUP BY g
),
armed AS (
  SELECT
    max(CASE WHEN g = 0 THEN n END) AS n0,
    max(CASE WHEN g = 1 THEN n END) AS n1,
    max(CASE WHEN g = 0 THEN CAST(sx AS DOUBLE) END) AS sx0,
    max(CASE WHEN g = 1 THEN CAST(sx AS DOUBLE) END) AS sx1,
    max(CASE WHEN g = 0 THEN CAST(sy AS DOUBLE) END) AS sy0,
    max(CASE WHEN g = 1 THEN CAST(sy AS DOUBLE) END) AS sy1,
    max(CASE WHEN g = 0 THEN CAST(sxx AS DOUBLE) END) AS sxx0,
    max(CASE WHEN g = 1 THEN CAST(sxx AS DOUBLE) END) AS sxx1,
    max(CASE WHEN g = 0 THEN CAST(syy AS DOUBLE) END) AS syy0,
    max(CASE WHEN g = 1 THEN CAST(syy AS DOUBLE) END) AS syy1,
    max(CASE WHEN g = 0 THEN CAST(sxy AS DOUBLE) END) AS sxy0,
    max(CASE WHEN g = 1 THEN CAST(sxy AS DOUBLE) END) AS sxy1
  FROM per
),
calc AS (
  SELECT n0, n1, sy0, sy1,
    sx0 / sy0 AS r0, sx1 / sy1 AS r1,
    (sxx0 * n0 - sx0 * sx0
     - 2.0 * (sx0 / sy0) * (sxy0 * n0 - sx0 * sy0)
     + (sx0 / sy0) * (sx0 / sy0) * (syy0 * n0 - sy0 * sy0))
      / (n0 * (n0 - 1.0) * n0 * (sy0 / n0) * (sy0 / n0)) AS v0,
    (sxx1 * n1 - sx1 * sx1
     - 2.0 * (sx1 / sy1) * (sxy1 * n1 - sx1 * sy1)
     + (sx1 / sy1) * (sx1 / sy1) * (syy1 * n1 - sy1 * sy1))
      / (n1 * (n1 - 1.0) * n1 * (sy1 / n1) * (sy1 / n1)) AS v1
  FROM armed
)
SELECT n0 AS n1, n1 AS n2,
  CASE WHEN sy0 > 0 THEN round(r0, 6) END AS ratio1,
  CASE WHEN sy1 > 0 THEN round(r1, 6) END AS ratio2,
  CASE WHEN n0 > 1 AND n1 > 1 AND sy0 > 0 AND sy1 > 0 THEN
    round(r1 - r0, 6) END AS diff,
  CASE WHEN n0 > 1 AND n1 > 1 AND sy0 > 0 AND sy1 > 0
        AND v0 + v1 > 0 THEN
    round((r1 - r0) / sqrt(v0 + v1), 6) END AS z
FROM calc
"""

QUERIES["revenue_per_event_ztest"] = q_revenue_per_event_ztest
ORACLES["revenue_per_event_ztest"] = _RATIO_SQL


def q_levene_value_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe equal-variance test (profile.levene_test) of value
    across event types — the assumption gate in front of
    anova_value_type; exact-rank medians, exact DECIMAL deviations."""
    from cerebro_spark.operators.profile import levene_test

    return levene_test(
        load_table(spark, "events", sf_dir), "event_type", "value", quant=100
    )


_LEVENE_SQL = """
WITH cells AS (
  SELECT event_type AS g,
    CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS q,
    CAST(count(*) AS BIGINT) AS c
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
cum AS (
  SELECT g, q, c,
    sum(c) OVER (PARTITION BY g ORDER BY q
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    sum(c) OVER (PARTITION BY g) AS n
  FROM cells
),
med AS (
  SELECT g, min(CASE WHEN cum * 2 >= n THEN q END) AS med FROM cum GROUP BY g
),
dev AS (
  SELECT cells.g, abs(q - med) AS d, c
  FROM cells JOIN med USING (g)
),
per AS (
  SELECT g, CAST(sum(c) AS HUGEINT) AS ng,
    sum(CAST(c AS HUGEINT) * d) AS s,
    sum(CAST(c AS HUGEINT) * d * d) AS ss
  FROM dev GROUP BY g
),
perq AS (SELECT g, ng, s, ss, (s * s) // ng AS tq FROM per),
agg AS (
  SELECT sum(ng) AS n, CAST(count(*) AS BIGINT) AS k,
    sum(s) AS stot, sum(ss) AS sstot, sum(tq) AS t
  FROM perq
)
SELECT CAST(n AS BIGINT) AS n, k AS k_groups,
  CASE WHEN k >= 2 AND n > CAST(k AS HUGEINT)
        AND sstot - t > 0 THEN
    round((CAST(greatest(t - (stot * stot) // n, 0) AS DOUBLE)
           / CAST(k - 1 AS DOUBLE))
          / (CAST(sstot - t AS DOUBLE) / CAST(n - k AS DOUBLE)), 6)
  END AS w_stat
FROM agg
"""

QUERIES["levene_value_type"] = q_levene_value_type
ORACLES["levene_value_type"] = _LEVENE_SQL

def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-Lorenz concentration (profile.concentration_at): how many
    users drive 90% of total event value — exact-rank top-down grid
    cumulative with an integer-ceiling boundary cell."""
    from cerebro_spark.operators.profile import concentration_at

    ev = load_table(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull()
    )
    return concentration_at(ev, "user_id", "value", p_num=90, p_den=100)


_CONCENTRATION_SQL = """
WITH units AS (
  SELECT user_id,
    sum(CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS v
  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
  GROUP BY user_id
),
grid AS (
  SELECT v, CAST(count(*) AS BIGINT) AS c FROM units GROUP BY v
),
g AS (
  SELECT v, c,
    sum(CAST(v AS HUGEINT) * c) OVER (ORDER BY v DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumv,
    sum(c) OVER (ORDER BY v DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
  FROM grid
),
tot AS (
  SELECT max(cumv) AS total, CAST(max(cumc) AS BIGINT) AS n_units FROM g
),
sel AS (
  SELECT g.v, g.c, g.cumv, g.cumc, tot.total, tot.n_units
  FROM g, tot
  WHERE g.cumv * 100 >= tot.total * 90 AND g.v > 0
  ORDER BY g.v DESC LIMIT 1
),
calc AS (
  SELECT n_units, total,
    cumv - CAST(v AS HUGEINT) * c AS above_v,
    CAST(cumc - c AS HUGEINT) AS above_c,
    CAST(v AS HUGEINT) AS vb
  FROM sel
)
SELECT n_units,
  round(CAST(total AS DOUBLE) / 1000000.0, 6) AS total,
  CAST(above_c
       + CASE WHEN total * 90 - above_v * 100 <= 0 THEN 0
              ELSE (total * 90 - above_v * 100 + vb * 100 - 1)
                   // (vb * 100) END AS BIGINT) AS k_units,
  CASE WHEN n_units > 0 THEN
    round(CAST(above_c
               + CASE WHEN total * 90 - above_v * 100 <= 0 THEN 0
                      ELSE (total * 90 - above_v * 100 + vb * 100 - 1)
                           // (vb * 100) END AS DOUBLE)
          / CAST(n_units AS DOUBLE), 6)
  END AS share_of_units
FROM calc
"""

QUERIES["revenue_concentration"] = q_revenue_concentration
ORACLES["revenue_concentration"] = _CONCENTRATION_SQL

def q_rmst_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time (profile.rmst) of the survival_km
    user lifetimes at tau = 14 days — average days-active-within-two-
    weeks, S(14), and the median lifetime; the non-proportional-hazards
    summary the log-rank number can't give."""
    from cerebro_spark.operators.profile import rmst

    return rmst(_user_lifetimes(spark, sf_dir), "t", "censored", tau=14)


_RMST_SQL = """
WITH cm AS (SELECT max(floor(epoch(ts))) AS corpus_max FROM events),
lives AS (
  SELECT
    CAST(floor((max(floor(epoch(ts))) - min(floor(epoch(ts)))) / 86400)
         AS BIGINT) AS t,
    CASE WHEN max(floor(epoch(ts))) >= (SELECT corpus_max FROM cm) - 86400
         THEN 1 ELSE 0 END AS censored
  FROM events GROUP BY user_id
),
grid AS (
  SELECT t, CAST(count(*) AS BIGINT) AS ending,
    CAST(sum(1 - censored) AS BIGINT) AS d
  FROM lives GROUP BY t
),
staged AS (
  SELECT t, d,
    sum(ending) OVER () - coalesce(sum(ending) OVER (
      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS risk,
    sum(ending) OVER () AS n
  FROM grid
),
logs AS (
  SELECT t, n,
    CASE WHEN risk > d
      THEN CAST(floor(ln(CAST(risk - d AS DOUBLE) / risk) * 1e9 + 0.5)
                AS BIGINT)
      ELSE CAST(-1000000000000 AS BIGINT) END AS l9
  FROM staged
),
surv AS (
  SELECT t, n,
    CAST(floor(exp(CAST(sum(l9) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
      PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e9) * 1e9 + 0.5) AS BIGINT)
      AS s9
  FROM logs
),
segs AS (
  SELECT t, n, s9,
    COALESCE(lag(s9) OVER (ORDER BY t), 1000000000) AS prev_s,
    COALESCE(lag(t) OVER (ORDER BY t), 0) AS prev_t
  FROM surv
),
areas AS (
  SELECT n, s9, t,
    CAST(prev_s AS HUGEINT) * (least(t, 14) - least(prev_t, 14)) AS a
  FROM segs
),
agg AS (
  SELECT max(n) AS n, sum(a) AS area,
    max_by(s9, t) AS slast, max(t) AS tlast,
    max_by(s9, CASE WHEN t <= 14 THEN t END) AS stau,
    min(CASE WHEN s9 * 2 <= 1000000000 THEN t END) AS median_t
  FROM areas
)
SELECT CAST(14 AS INT) AS tau, CAST(n AS BIGINT) AS n,
  round(CAST(area + CASE WHEN tlast < 14
                         THEN CAST(slast AS HUGEINT) * (14 - tlast)
                         ELSE 0 END AS DOUBLE) / 1e9, 6) AS rmst,
  round(CAST(COALESCE(stau, 1000000000) AS DOUBLE) / 1e9, 6) AS km_at_tau,
  median_t
FROM agg
"""

QUERIES["rmst_lifetime"] = q_rmst_lifetime
ORACLES["rmst_lifetime"] = _RMST_SQL
