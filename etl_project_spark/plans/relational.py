"""Relational core: joins, aggregations, windows, sorts, set ops.

The reference performs only union+distinct (flows/etl.py:304); the
north star requires the full relational set over the driver corpus
(SURVEY.md §2.5, §7.2 step 2). Every query here is a single declarative
plan — Catalyst handles pushdown/pruning/join selection; comments call
out the intended physical shape at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_project_spark.catalog import read_table
from etl_project_spark.plans.money import charge_s6, disc_price_s4, money_sum
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return read_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q01: TPC-H Q1-style pricing summary — the classic wide aggregate.
# Physical shape: parquet scan with shipdate filter pushed down → partial
# hash agg (map-side) → shuffle on 2 low-cardinality keys → final agg.
# At 100 TB the partial agg collapses ~600 G rows to a few dozen groups
# per task before the shuffle — the shuffle is trivially small.
# --------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                      * (1 - CAST(l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                      * (1 - CAST(l_discount AS DECIMAL(12,4)))
                      * (1 + CAST(l_tax AS DECIMAL(7,4)))), 2) AS DOUBLE) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("agg",),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide groupBy aggregate with filter pushdown (TPC-H Q1 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            money_sum(disc_price_s4(), 4).alias("sum_disc_price"),
            money_sum(charge_s6(), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q03: shipping-priority top-k — 3-way join + agg + deterministic top 10.
# customer filter prunes the build side; orders⋈lineitem shuffles on the
# order key. Top-k is orderBy().limit() → Spark's TakeOrderedAndProject,
# which never materializes a global sort at scale.
# --------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("join", "agg", "topk"),
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + top-10 by revenue (TPC-H Q3 shape)."""
    cutoff = F.lit("1997-06-01 00:00:00").cast("timestamp")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(money_sum(disc_price_s4(), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q05: multi-hop star join — region→nation are tiny dims, broadcast them
# explicitly so the only shuffles are the fact-side joins.
# --------------------------------------------------------------------------
@register(
    "q05_region_revenue",
    oracle="""
SELECT n.n_name,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
    tags=("join", "agg", "broadcast"),
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join through broadcast dims, revenue per nation (Q5 shape)."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dims = F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    cust = c.join(dims, c.c_nationkey == dims.n_nationkey)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .groupBy("n_name")
        .agg(money_sum(disc_price_s4(), 4).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Semi / anti joins — EXISTS / NOT EXISTS without materializing the probe.
# --------------------------------------------------------------------------
@register(
    "q_semi_join_active_suppliers",
    oracle="""
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
)
""",
    tags=("join", "semi"),
)
def q_semi_join_active_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join ≙ EXISTS: suppliers with any high-quantity lineitem."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@register(
    "q_anti_join_idle_customers",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
""",
    tags=("join", "anti"),
)
def q_anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti join ≙ NOT EXISTS: customers with no URGENT orders.

    Filtered on the order side so the fixture yields nonzero rows (the
    round-1 no-orders-at-all variant matched zero customers — every
    customer has orders — making the anti-join semantics untested).
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_broadcast_dim_join",
    oracle="""
SELECT n.n_nationkey, n.n_name, r.r_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
""",
    tags=("join", "broadcast"),
)
def q_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast hint on a tiny dim — zero-shuffle join."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


# --------------------------------------------------------------------------
# Window functions — ranking and running aggregates. Both shuffle once on
# the partition key, then sort within partitions; no global sort.
# --------------------------------------------------------------------------
@register(
    "q_window_top3_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rn
  FROM orders
)
WHERE rn <= 3
""",
    tags=("window", "topk"),
)
def q_window_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number (deterministic tie-break)."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "q_window_running_revenue",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 2) AS running_spend
FROM orders
""",
    tags=("window",),
)
def q_window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend ordered by order date."""
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "q_window_lag_gap_days",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(DATE_DIFF('day',
            LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS INTEGER) AS days_since_prev
FROM orders
""",
    tags=("window", "date"),
)
def q_window_lag_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic: days between consecutive orders per customer."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).alias("days_since_prev"),
    )


# --------------------------------------------------------------------------
# Grouping sets / rollup, distinct aggregates, sort/limit, set ops.
# --------------------------------------------------------------------------
@register(
    "q_rollup_order_status",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    tags=("agg", "rollup"),
)
def q_rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → priority → grand total)."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "q_cube_returnflag_linestatus",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       ROUND(SUM(l_quantity), 2) AS total_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    tags=("agg", "cube"),
)
def q_cube_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dimensions."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
    )


@register(
    "q_distinct_agg_customers_per_status",
    oracle="""
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
    tags=("agg", "distinct"),
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — expands to a two-phase agg under Catalyst."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "q_top10_orders_by_price",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    tags=("sort", "topk"),
)
def q_top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k — TakeOrderedAndProject, not a full sort."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "q_intersect_segments",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
""",
    tags=("setop",),
)
def q_intersect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of two customer segments."""
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000.0).select("c_custkey")
    return a.intersect(b)


@register(
    "q_except_segments",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
""",
    tags=("setop",),
)
def q_except_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) of two customer segments."""
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000.0).select("c_custkey")
    return a.subtract(b)


@register(
    "q_union_all_counts",
    oracle="""
SELECT src, COUNT(*) AS n FROM (
  SELECT 'high_value' AS src FROM orders WHERE o_totalprice > 200000.0
  UNION ALL
  SELECT 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
)
GROUP BY src
""",
    tags=("setop", "agg"),
)
def q_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two derived scans, then aggregate."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 200000.0).select(
        F.lit("high_value").alias("src")
    )
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("urgent").alias("src")
    )
    return a.unionByName(b).groupBy("src").agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# Correlated-style subquery shapes expressed as joins.
# --------------------------------------------------------------------------
@register(
    "q_above_avg_acctbal_per_nation",
    oracle="""
SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
FROM customer c
JOIN (
  SELECT c_nationkey, AVG(c_acctbal) AS nation_avg
  FROM customer GROUP BY c_nationkey
) a ON c.c_nationkey = a.c_nationkey
WHERE c.c_acctbal > a.nation_avg
""",
    tags=("join", "agg", "subquery"),
)
def q_above_avg_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their nation's average balance (decorrelated join)."""
    c = _t(spark, sf_dir, "customer")
    avg = c.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("nation_avg"))
    return (
        c.join(F.broadcast(avg.withColumnRenamed("c_nationkey", "nk")),
               c.c_nationkey == F.col("nk"))
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )


# --------------------------------------------------------------------------
# Outer joins — null-completing sides; full outer on pre-aggregated keys.
# --------------------------------------------------------------------------
@register(
    "q_left_join_customer_order_counts",
    oracle="""
SELECT c.c_custkey,
       COUNT(o.o_orderkey) AS n_orders,
       ROUND(COALESCE(SUM(o.o_totalprice), 0.0), 2) AS total_spend
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
""",
    tags=("join", "outer"),
)
def q_left_join_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping order-less customers at zero counts."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spend"
            ),
        )
    )


@register(
    "q_full_outer_nation_balances",
    oracle="""
WITH s AS (
  SELECT s_nationkey AS nk, ROUND(SUM(s_acctbal), 2) AS supp_bal
  FROM supplier GROUP BY s_nationkey
), c AS (
  SELECT c_nationkey AS nk, ROUND(SUM(c_acctbal), 2) AS cust_bal
  FROM customer GROUP BY c_nationkey
)
SELECT COALESCE(s.nk, c.nk) AS nationkey, s.supp_bal, c.cust_bal
FROM s FULL OUTER JOIN c ON s.nk = c.nk
""",
    tags=("join", "outer"),
)
def q_full_outer_nation_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (nulls where absent)."""
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.round(F.sum("s_acctbal"), 2).alias("supp_bal"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.round(F.sum("c_acctbal"), 2).alias("cust_bal"))
    )
    return s.join(c, s.nk_s == c.nk_c, "full_outer").select(
        F.coalesce("nk_s", "nk_c").alias("nationkey"), "supp_bal", "cust_bal"
    )


@register(
    "q_cross_join_region_matrix",
    oracle="""
SELECT a.r_name AS from_region, b.r_name AS to_region
FROM region a CROSS JOIN region b
WHERE a.r_name <> b.r_name
""",
    tags=("join", "cross"),
)
def q_cross_join_region_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of a tiny dim with itself (route-matrix shape)."""
    a = _t(spark, sf_dir, "region").select(F.col("r_name").alias("from_region"))
    b = _t(spark, sf_dir, "region").select(F.col("r_name").alias("to_region"))
    return a.crossJoin(b).filter(F.col("from_region") != F.col("to_region"))


# --------------------------------------------------------------------------
# Statistical / ordered-set aggregates.
# --------------------------------------------------------------------------
@register(
    "q_stats_lineitem_price",
    oracle="""
SELECT l_returnflag,
       ROUND(STDDEV_SAMP(l_extendedprice), 4) AS price_stddev,
       ROUND(VAR_SAMP(l_discount), 6) AS disc_var,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS qty_price_covar
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "stats"),
)
def q_stats_lineitem_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev/variance/correlation/covariance aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("l_discount"), 6).alias("disc_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
    )


@register(
    "q_percentiles_order_value",
    oracle="""
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
FROM orders
GROUP BY o_orderstatus
""",
    tags=("agg", "percentile"),
)
def q_percentiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile ≙ quantile_cont).

    Exact, not approx_percentile: the oracle compares values, and at
    scale exact percentile is a single-pass sort-based aggregate per
    group — acceptable for low-cardinality groups; use approx for
    high-cardinality monitoring paths.
    """
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
    )


@register(
    "q_approx_percentile_check",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       TRUE AS p50_within_2pct,
       TRUE AS p95_within_2pct
FROM orders
GROUP BY o_orderstatus
""",
    tags=("sketch", "percentile"),
)
def q_approx_percentile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_percentile`` (KLL/GK-style sketch) value-checked against
    the exact percentile in-plan — the same contract as
    `q_approx_distinct_users`: the oracle pins the tolerance booleans
    TRUE, so the hash-compare fails iff the sketch drifts beyond 2%.
    At scale the sketch is the only option for high-cardinality
    groups: fixed memory per group, map-side mergeable, one pass.
    """
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(1000)).alias("_a50"),
        F.percentile_approx("o_totalprice", F.lit(0.95), F.lit(1000)).alias("_a95"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("_e50"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("_e95"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    def _ok(a, e):
        return (F.abs(F.col(a) - F.col(e)) / F.col(e) <= 0.02)
    return agg.select(
        "o_orderstatus",
        "n_orders",
        _ok("_a50", "_e50").alias("p50_within_2pct"),
        _ok("_a95", "_e95").alias("p95_within_2pct"),
    )


@register(
    "q_having_rich_segments",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n, ROUND(AVG(c_acctbal), 2) AS avg_bal
FROM customer
GROUP BY c_mktsegment
HAVING AVG(c_acctbal) > 4400.0
""",
    tags=("agg", "having"),
)
def q_having_rich_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
            F.avg("c_acctbal").alias("_raw_avg"),
        )
        .filter(F.col("_raw_avg") > 4400.0)
        .drop("_raw_avg")
    )


@register(
    "q_dense_rank_parts_by_price",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice, CAST(dr AS INTEGER) AS dr
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS dr
  FROM part
)
WHERE dr <= 2
""",
    tags=("window", "rank"),
)
def q_dense_rank_parts_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank per group — ties share rank, no gaps."""
    p = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return (
        p.withColumn("dr", F.dense_rank().over(w))
        .filter(F.col("dr") <= 2)
        .select("p_brand", "p_partkey", "p_retailprice", "dr")
    )


@register(
    "q_scalar_subquery_max_order",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice = (SELECT MAX(o_totalprice) FROM orders)
""",
    tags=("subquery",),
)
def q_scalar_subquery_max_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: rows at the global max (broadcast 1-row join)."""
    o = _t(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_totalprice").alias("_mx"))
    return (
        o.join(F.broadcast(mx), o.o_totalprice == F.col("_mx"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# Explicit GROUPING SETS + grouping_id, and skew-resistant salted agg.
# --------------------------------------------------------------------------
@register(
    "q_grouping_sets_flag_status",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
       COUNT(*) AS n_items,
       ROUND(SUM(l_extendedprice), 2) AS total_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
    tags=("agg", "grouping-sets"),
)
def q_grouping_sets_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id disambiguation — one
    Expand + single hash aggregate, not a UNION ALL of three scans."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


@register(
    "q_salted_skew_agg",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY o_orderpriority
""",
    tags=("agg", "skew"),
)
def q_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation for heavy-hitter keys.

    Stage 1 groups on (key, salt) so a hot key spreads over 16
    reducers; stage 2 combines the 16 partials per key. Same result as
    a plain GROUP BY (the oracle), but no single-reducer hotspot when
    one key owns a large share of 100 TB. (Partial map-side agg gives
    much of this for free for algebraic aggs; salting is the general
    pattern for holistic aggs and skewed shuffle joins.)
    """
    o = _t(spark, sf_dir, "orders")
    salted = o.withColumn("_salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(16)))
    partial = salted.groupBy("o_orderpriority", "_salt").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("o_totalprice").alias("_s")
    )
    return partial.groupBy("o_orderpriority").agg(
        F.sum("_n").alias("n_orders"),
        F.round(F.sum("_s"), 2).alias("total_price"),
    )


# --------------------------------------------------------------------------
# Sampling & sketches — the downsample/profile stages of a training-data
# pipeline. Not ANSI-expressible bit-for-bit (engine-specific RNG/HLL), so
# rows-only checks here + tight property tests in tests/test_sampling.py.
# --------------------------------------------------------------------------
@register(
    "q_stratified_sample_docs",
    oracle="""
SELECT doc_id, lang, source
FROM (
  SELECT doc_id, lang, source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
  FROM documents
)
WHERE lang IN ('en', 'es', 'fr', 'de')
  AND bucket < CASE lang WHEN 'en' THEN 50 ELSE 25 END
""",
    tags=("sample",),
)
def q_stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: per-language keep fractions via md5-bucket
    thresholds (en 50%, es/fr/de 25%).

    Deterministic hash-stratified sampling — any engine agrees on the
    kept set, so unlike ``sampleBy`` (engine-specific RNG, whose bounds
    tests/test_sampling.py still proves) this IS oracle-checkable. The
    map-side filter never shuffles — at 100 TB the sample is a
    scan-stage projection; per-stratum fractions are how a pipeline
    rebalances a skewed language mix before training.
    """
    d = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 100
    )
    keep_pct = F.when(F.col("lang") == "en", 50).otherwise(25)
    return (
        d.filter(F.col("lang").isin("en", "es", "fr", "de"))
        .filter(bucket < keep_pct)
        .select("doc_id", "lang", "source")
    )


@register(
    "q_approx_distinct_users",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       COUNT(*) AS n_events,
       TRUE AS within_5pct
FROM events
GROUP BY event_type
""",
    tags=("sketch",),
)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user counts per event type, value-checked.

    ``approx_count_distinct`` (rsd 2%) is the scale path for distinct
    counting: a fixed-size sketch merges map-side, so the shuffle
    carries one sketch per group instead of every distinct value.
    Raw sketch estimates are engine-specific, so the oracle contract
    is the RELATIVE ERROR: the plan computes both the HLL estimate and
    the exact count and emits ``within_5pct`` — the oracle hard-codes
    TRUE, so the hash-compare fails iff the sketch drifts beyond 5%.
    The estimate itself stays in the plan (not projected away), making
    this a real value check of the sketch, portable across engines.
    """
    e = _t(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        "n_events",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            / F.col("exact_users")
            <= 0.05
        ).alias("within_5pct"),
    )


# --------------------------------------------------------------------------
# Classic decorrelated-subquery shapes (TPC-H Q2/Q18/Q22 patterns on the
# driver corpus, which has no partsupp — lineitem serves as the fact).
# --------------------------------------------------------------------------
@register(
    "q_argmin_supplier_per_part",
    oracle="""
WITH spend AS (
  SELECT l_partkey, l_suppkey, ROUND(SUM(l_extendedprice), 2) AS total
  FROM lineitem GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey, MIN(total) AS best_total FROM spend GROUP BY l_partkey
)
SELECT s.l_partkey AS partkey,
       MIN(s.l_suppkey) AS suppkey,
       MIN(s.total) AS total_spend
FROM spend s JOIN best b
  ON s.l_partkey = b.l_partkey AND s.total = b.best_total
GROUP BY s.l_partkey
""",
    tags=("join", "subquery", "argmin"),
)
def q_argmin_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin join-back (TPC-H Q2 core): cheapest supplier per part.

    Aggregate → per-key min → join back on (key, min). Both aggregates
    share the (l_partkey, l_suppkey) shuffle; ties break on min
    suppkey so the result is deterministic.
    """
    li = _t(spark, sf_dir, "lineitem")
    spend = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("total")
    )
    best = spend.groupBy("l_partkey").agg(F.min("total").alias("best_total"))
    return (
        spend.join(
            best.withColumnRenamed("l_partkey", "_pk"),
            (spend.l_partkey == F.col("_pk")) & (spend.total == F.col("best_total")),
        )
        .groupBy("l_partkey")
        .agg(F.min("l_suppkey").alias("suppkey"), F.min("total").alias("total_spend"))
        .select(F.col("l_partkey").alias("partkey"), "suppkey", "total_spend")
    )


@register(
    "q_in_subquery_big_orders",
    oracle="""
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
)
""",
    tags=("join", "subquery", "semi"),
)
def q_in_subquery_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-aggregate subquery (TPC-H Q18 shape) as a left-semi join
    against the grouped lineitem — the decorrelation Catalyst would do
    for the SQL form, written directly."""
    o = _t(spark, sf_dir, "orders")
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 150)
    )
    return o.join(big, o.o_orderkey == big.l_orderkey, "left_semi").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "q_idle_rich_customers_by_nation",
    oracle="""
SELECT c.c_nationkey AS nationkey,
       COUNT(*) AS numcust,
       ROUND(SUM(c.c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c.c_nationkey IN (13, 31, 23, 29, 30, 18, 17)
  AND c.c_acctbal > (
    SELECT AVG(c_acctbal) FROM customer
    WHERE c_acctbal > 0.0 AND c_nationkey IN (13, 31, 23, 29, 30, 18, 17)
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-06-01 00:00:00'
  )
GROUP BY c.c_nationkey
""",
    tags=("join", "anti", "subquery", "agg"),
)
def q_idle_rich_customers_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (nation keys standing in for phone prefixes —
    this corpus has no c_phone): IN-list filter + scalar avg subquery
    (broadcast 1-row join, no collect) + anti join against *recent*
    orders (the date filter pushes to the orders scan) + agg."""
    keys = [13, 31, 23, 29, 30, 18, 17]
    c = _t(spark, sf_dir, "customer")
    pool = c.filter(F.col("c_nationkey").isin(keys))
    avg_bal = pool.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_avg")
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-06-01 00:00:00").cast("timestamp")
    )
    return (
        pool.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q_right_join_orders_customers",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
FROM orders o
RIGHT JOIN customer c ON o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
""",
    tags=("join", "outer"),
)
def q_right_join_orders_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join with a join-side predicate: every customer row
    survives; only big orders attach (NULLs otherwise). The non-equi
    condition lives in the join, not a post-filter — semantics differ."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.join(
        c,
        (o.o_custkey == c.c_custkey) & (o.o_totalprice > 300000.0),
        "right",
    ).select("c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice")


@register(
    "q_intersect_all_priorities",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n FROM (
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
  INTERSECT ALL
  SELECT o_orderpriority FROM orders WHERE o_totalprice > 100000.0
) GROUP BY o_orderpriority
""",
    tags=("setop", "multiset"),
)
def q_intersect_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection (min of multiplicities).

    The bag-semantics twin of `q_intersect_segments`: priorities repeat
    heavily, so ALL keeps min(count_a, count_b) copies where DISTINCT
    would keep one. Spark plans this as a count-compare aggregate on
    the value — one shuffle, no join.
    """
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    b = o.filter(F.col("o_totalprice") > 100000.0).select("o_orderpriority")
    return a.intersectAll(b).groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_except_all_priorities",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n FROM (
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
  EXCEPT ALL
  SELECT o_orderpriority FROM orders WHERE o_totalprice > 400000.0
) GROUP BY o_orderpriority
""",
    tags=("setop", "multiset"),
)
def q_except_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (multiplicity subtraction).

    The 400k threshold keeps the subtrahend smaller than the minuend
    per priority so the difference is non-empty — ALL semantics are
    then observable (DISTINCT would collapse them to zero rows here).
    """
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    b = o.filter(F.col("o_totalprice") > 400000.0).select("o_orderpriority")
    return a.exceptAll(b).groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_salted_skew_join",
    oracle="""
WITH dim AS (
  SELECT 'R' AS flag, 2.0 AS mult UNION ALL
  SELECT 'A', 1.5 UNION ALL
  SELECT 'N', 1.0
)
SELECT l.l_returnflag,
       COUNT(*) AS n_lines,
       ROUND(SUM(l.l_quantity * d.mult), 2) AS weighted_qty
FROM lineitem l JOIN dim d ON l.l_returnflag = d.flag
GROUP BY l.l_returnflag
""",
    tags=("join", "skew", "salt"),
)
def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join on a pathologically skewed key (3-value domain).

    Join twin of `q_salted_skew_agg`: a shuffle join keyed on
    l_returnflag would put ~1/3 of 100 TB on one reducer. Salting
    spreads it — the fact side gets salt = hash(row) % 16, the dim
    side is exploded 16× so every (flag, salt) pair exists, and the
    join key becomes (flag, salt): same rows out, 16× the reducers.
    (A small dim would normally broadcast — the `merge` hint forces
    the shuffle path to make the demonstration honest; the pattern is
    for when both sides are too big to broadcast.)
    """
    li = _t(spark, sf_dir, "lineitem")
    dim = spark.createDataFrame(
        [("R", 2.0), ("A", 1.5), ("N", 1.0)], "flag string, mult double"
    )
    n_salt = 16
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    salted_fact = li.withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salt))
    )
    return (
        salted_fact.join(
            salted_dim.hint("merge"),
            (F.col("l_returnflag") == F.col("flag")) & (salted_fact._salt == salted_dim._salt),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_quantity") * F.col("mult")), 2).alias("weighted_qty"),
        )
    )


@register(
    "q_null_safe_join_priorities",
    oracle="""
WITH o AS (
  SELECT NULLIF(o_orderpriority, '5-LOW') AS pri,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
), d AS (
  SELECT DISTINCT NULLIF(o_orderpriority, '5-LOW') AS pri FROM orders
)
SELECT d.pri, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(o.price), 2) AS DOUBLE) AS total_price
FROM o JOIN d ON o.pri IS NOT DISTINCT FROM d.pri
GROUP BY d.pri
""",
    tags=("join", "null-safe"),
)
def q_null_safe_join_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` ≙ IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing, the semantics ETL needs when
    joining on nullable business keys. The '5-LOW' priority is mapped
    to NULL via NULLIF so the fixture actually exercises the NULL
    bucket. ``<=>`` still hash-partitions (NULLs co-locate in one
    bucket) — it stays an equi-join, not a cross+filter.
    """
    o = _t(spark, sf_dir, "orders").select(
        F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).alias("pri"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    d = o.select("pri").distinct()
    return (
        o.join(d.withColumnRenamed("pri", "d_pri"), o.pri.eqNullSafe(F.col("d_pri")))
        .groupBy("d_pri")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("price"), 2).cast("double").alias("total_price"),
        )
        .withColumnRenamed("d_pri", "pri")
    )


@register(
    "q_fuzzy_supplier_name_pairs",
    oracle="""
SELECT a.s_suppkey AS key_a, b.s_suppkey AS key_b,
       CAST(levenshtein(a.s_name, b.s_name) AS INTEGER) AS edit_dist
FROM supplier a
JOIN supplier b
  ON LENGTH(a.s_name) = LENGTH(b.s_name)
 AND a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
""",
    tags=("join", "fuzzy", "levenshtein"),
)
def q_fuzzy_supplier_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL same-length name pairs within edit distance 1, via
    deletion-neighborhood blocking (FastSS family).

    The oracle is deliberately the NAIVE exact n² SQL: the blocking is
    a lossless theorem (two equal-length strings at edit distance ≤ 1
    differ in at most one position, so deleting that position from
    both yields identical strings — they MUST share a
    (position, deleted-variant) key), so the hash check verifies the
    pruning itself, same pattern as `q_jaccard_prefix_filter_pairs`.

    Round-7 scale lesson: the previous (length, 12-char-prefix)
    blocking collapses on real corpora where every name shares the
    prefix — on TPC-H 'Supplier#…' names the "block" was the whole
    table, and the sf1 sweep measured the resulting O(n²) at 290 s.
    Deletion variants cost O(n·len) rows and group by CONTENT, so
    blocks stay near-singleton no matter how alike the prefixes are.
    """
    s = _t(spark, sf_dir, "supplier")
    return fuzzy_blocked_pairs(s, key_col="s_suppkey", name_col="s_name")


def fuzzy_blocked_pairs(df: DataFrame, *, key_col: str, name_col: str) -> DataFrame:
    """Deletion-neighborhood fuzzy self-join → ``(key_a, key_b,
    edit_dist)`` for equal-length pairs at edit distance ≤ 1.

    Each name emits ``len`` variant rows (char ``i`` deleted, keyed by
    ``(i, variant)``); candidates are the variant equi-join, which by
    the pigeonhole argument above contains EVERY qualifying pair and
    essentially nothing else (sharing a variant at position i already
    implies the names differ only at i). The quadratic comparison is
    gone entirely — at 100 TB the shuffle key is the variant string
    (content-hashed, skew-free unless the corpus contains mass-
    duplicate names, which then surface as exact-dup pairs, not a hot
    task), and the join output is proportional to the TRUE pair count.
    The final ``levenshtein`` is a per-pair verify, not a block scan.
    """
    variants = df.select(
        F.col(key_col).alias("key"),
        F.col(name_col).alias("name"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, length({name_col})), "
                f"i -> concat(substring({name_col}, 1, i - 1), "
                f"substring({name_col}, i + 1, length({name_col}))))"
            )
        ).alias("i", "v"),
    )
    a = variants.alias("a")
    b = variants.alias("b")
    return (
        a.join(
            b,
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.length("a.name") == F.length("b.name"))
            & (F.col("a.key") < F.col("b.key")),
        )
        .select(
            F.col("a.key").alias("key_a"),
            F.col("b.key").alias("key_b"),
            F.levenshtein("a.name", "b.name").alias("edit_dist"),
        )
        .distinct()
        .filter(F.col("edit_dist") <= 1)
    )


@register(
    "q_data_quality_audit",
    oracle="""
SELECT 'orders_pk_unique' AS check_name,
       CAST((SELECT COUNT(*) FROM (
          SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
       )) AS BIGINT) AS n_violations
UNION ALL
SELECT 'orders_custkey_not_null',
       CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT)
UNION ALL
SELECT 'orders_orphan_custkey',
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
UNION ALL
SELECT 'orders_status_accepted_values',
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
UNION ALL
SELECT 'orders_totalprice_positive',
       CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) AS BIGINT)
UNION ALL
SELECT 'lineitem_shipped_before_ordered',
       CAST((SELECT COUNT(*) FROM lineitem l JOIN orders o
             ON l.l_orderkey = o.o_orderkey
             WHERE l.l_shipdate < o.o_orderdate) AS BIGINT)
ORDER BY check_name
""",
    tags=("quality", "audit", "constraints"),
)
def q_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit: one row per constraint check.

    The dbt-test / Deequ-style validation suite as a single lazy plan:
    primary-key uniqueness, not-null, referential integrity (orphan
    foreign keys via anti-join), accepted values, a range check, and a
    cross-table temporal consistency check (items shipped before their
    order was placed — the one that actually FIRES on this corpus, so
    the audit demonstrably detects, not just passes) — each check an
    independent aggregate unioned into one result, so one action
    validates the table. Scale shape: the uniqueness check is a hash
    aggregate on the key; the orphan and temporal checks are joins
    that AQE broadcasts when a side fits; the scalar checks are
    map-side conditional sums folded into single-row aggregates.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")

    dup_pk = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("orders_pk_unique").alias("check_name"), "n_violations")
    )
    null_fk = o.agg(
        F.sum(F.col("o_custkey").isNull().cast("bigint")).alias("n_violations")
    ).select(F.lit("orders_custkey_not_null").alias("check_name"), "n_violations")
    orphans = (
        o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("orders_orphan_custkey").alias("check_name"), "n_violations")
    )
    accepted = o.agg(
        F.sum((~F.col("o_orderstatus").isin("O", "F", "P")).cast("bigint")).alias(
            "n_violations"
        )
    ).select(
        F.lit("orders_status_accepted_values").alias("check_name"), "n_violations"
    )
    positive = o.agg(
        F.sum((F.col("o_totalprice") <= 0).cast("bigint")).alias("n_violations")
    ).select(
        F.lit("orders_totalprice_positive").alias("check_name"), "n_violations"
    )
    temporal = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .agg(
            F.sum((F.col("l_shipdate") < F.col("o_orderdate")).cast("bigint")).alias(
                "n_violations"
            )
        )
        .select(
            F.lit("lineitem_shipped_before_ordered").alias("check_name"),
            "n_violations",
        )
    )
    return (
        dup_pk.unionByName(null_fk)
        .unionByName(orphans)
        .unionByName(accepted)
        .unionByName(positive)
        .unionByName(temporal)
        .orderBy("check_name")
    )


@register(
    "q_table_profile_orders",
    oracle="""
SELECT 'o_custkey' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(o_custkey) AS BIGINT) AS n_non_null,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
       CAST(MIN(o_custkey) AS VARCHAR) AS min_val,
       CAST(MAX(o_custkey) AS VARCHAR) AS max_val
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus),
       MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*), COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice),
       CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
FROM orders
ORDER BY col_name
""",
    tags=("quality", "profile", "stats"),
)
def q_table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler: rows / non-null / distinct / min / max per column.

    The schema-drift and data-health snapshot (pandas ``describe`` /
    Deequ profiles) in long form — one row per column with extrema
    cast to string so heterogeneous column types share one schema.
    Each column profiles in its own single-row aggregate over one scan
    branch; count_distinct shuffles only distinct values per column
    (map-side partial dedup), and the union of three 1-row frames is
    free. A 100-column table at 100 TB would profile in one pass with
    grouping-free aggregates — no per-column driver round-trips.
    """
    o = _t(spark, sf_dir, "orders")

    def profile(col: str) -> DataFrame:
        return o.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_non_null"),
            F.count_distinct(F.col(col)).alias("n_distinct"),
            F.min(col).cast("string").alias("min_val"),
            F.max(col).cast("string").alias("max_val"),
        ).select(F.lit(col).alias("col_name"), "*")

    return (
        profile("o_custkey")
        .unionByName(profile("o_orderstatus"))
        .unionByName(profile("o_totalprice"))
        .orderBy("col_name")
    )


@register(
    "q_winsorized_price_stats",
    oracle="""
WITH bounds AS (
  SELECT quantile_cont(o_totalprice, 0.01) AS p01,
         quantile_cont(o_totalprice, 0.99) AS p99
  FROM orders
)
SELECT o.o_orderstatus,
       COUNT(*) AS n_orders,
       ROUND(AVG(o.o_totalprice), 4) AS raw_mean,
       ROUND(AVG(LEAST(GREATEST(o.o_totalprice, b.p01), b.p99)), 4)
         AS winsorized_mean,
       CAST(SUM(CASE WHEN o.o_totalprice < b.p01 OR o.o_totalprice > b.p99
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
FROM orders o CROSS JOIN bounds b
GROUP BY o.o_orderstatus
""",
    tags=("agg", "percentile", "robust-stats"),
)
def q_winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p01/p99-clamped) mean order value per status.

    The robust-statistics step feature pipelines run before training on
    heavy-tailed signals: clamp to global percentile bounds, then
    aggregate. Two passes by necessity (the bounds are a global
    statistic), but the bounds pass reduces to ONE row that re-enters
    the plan as a broadcast — never a driver round-trip — and the
    clamp itself is map-side scalar math on the second scan. Exact
    interpolated percentile (≙ quantile_cont) keeps the oracle
    value-comparable; swap approx_percentile at high cardinality.
    """
    o = _t(spark, sf_dir, "orders")
    bounds = o.agg(
        F.percentile("o_totalprice", F.lit(0.01)).alias("p01"),
        F.percentile("o_totalprice", F.lit(0.99)).alias("p99"),
    )
    clamped = F.least(F.greatest(F.col("o_totalprice"), F.col("p01")), F.col("p99"))
    outlier = (F.col("o_totalprice") < F.col("p01")) | (
        F.col("o_totalprice") > F.col("p99")
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("raw_mean"),
            F.round(F.avg(clamped), 4).alias("winsorized_mean"),
            F.sum(outlier.cast("bigint")).alias("n_clamped"),
        )
    )


@register(
    "q_key_skew_profile",
    oracle="""
WITH per_key AS (
  SELECT l_suppkey AS key, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey
), stats AS (
  SELECT COUNT(*) AS n_keys,
         CAST(SUM(n) AS BIGINT) AS n_rows,
         CAST(MAX(n) AS BIGINT) AS max_rows,
         ROUND(AVG(n), 4) AS avg_rows,
         ROUND(MAX(n) / AVG(n), 4) AS skew_ratio
  FROM per_key
), top_keys AS (
  SELECT key, CAST(n AS BIGINT) AS n,
         ROW_NUMBER() OVER (ORDER BY n DESC, key) AS rnk
  FROM per_key
)
SELECT t.rnk, t.key AS hot_key, t.n AS hot_rows,
       s.n_keys, s.n_rows, s.max_rows, s.avg_rows, s.skew_ratio
FROM top_keys t CROSS JOIN stats s
WHERE t.rnk <= 5
""",
    tags=("diagnostics", "skew", "agg"),
)
def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics: the 5 heaviest join/agg keys plus
    global distribution stats (max/avg skew ratio).

    The pre-flight every large join deserves: before shuffling 100 TB
    on a key, measure whether one key would own a straggler task. One
    hash aggregate per key (map-side combine), a 1-row stats aggregate
    broadcast back, and a top-5 via TakeOrderedAndProject — the
    diagnostic itself never sorts or collects the key space. Feeds the
    salting decision exercised in q_salted_skew_join/q_salted_skew_agg.
    """
    li = _t(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_rows"),
        F.round(F.avg("n"), 4).alias("avg_rows"),
        F.round(F.max("n") / F.avg("n"), 4).alias("skew_ratio"),
    )
    top = (
        per_key.orderBy(F.col("n").desc(), F.col("key"))
        .limit(5)
        .withColumn(
            "rnk",
            F.row_number().over(
                # constant-VALUED, non-foldable partition key: see
                # operators/similarity.py::brute_force_topk
                W.partitionBy(F.pmod(F.col("key"), F.lit(1))).orderBy(
                    F.col("n").desc(), F.col("key")
                )
            ),
        )
    )
    return top.crossJoin(F.broadcast(stats)).select(
        "rnk",
        F.col("key").alias("hot_key"),
        F.col("n").alias("hot_rows"),
        "n_keys",
        "n_rows",
        "max_rows",
        "avg_rows",
        "skew_ratio",
    )


@register(
    "q_cdc_apply_changes",
    oracle="""
WITH log AS (
  SELECT o_orderkey, 1 AS seq, 'I' AS op, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders
  UNION ALL
  SELECT o_orderkey, 2, 'U', o_orderstatus,
         (CAST(ROUND(o_totalprice * 100) AS BIGINT) * 110 + 50) // 100
  FROM orders WHERE o_custkey % 3 = 0
  UNION ALL
  SELECT o_orderkey, 3, 'D', o_orderstatus, CAST(NULL AS BIGINT)
  FROM orders WHERE o_custkey % 7 = 0
),
latest AS (
  SELECT o_orderkey,
         ARG_MAX(op, seq) AS op,
         ARG_MAX(o_orderstatus, seq) AS o_orderstatus,
         ARG_MAX(price_c, seq) AS price_c
  FROM log
  GROUP BY o_orderkey
)
SELECT o_orderstatus,
       COUNT(*) AS n_live,
       CAST(SUM(price_c) AS DOUBLE) / 100.0 AS total_price
FROM latest
WHERE op <> 'D'
GROUP BY o_orderstatus
""",
    tags=("cdc", "merge", "upsert"),
)
def q_cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction: apply an insert/update/delete change stream
    to a snapshot — latest op per key wins, deletes drop the row.

    The log derives deterministically from orders (I for every key,
    U (+10%) for custkey%3, D for custkey%7) so both engines replay
    it. Compaction is ONE argmax hash-aggregate per key — no sort, no
    window, no iterative merge: at 100 TB a day's CDC feed compacts
    with a single shuffle keyed on the primary key, and the same plan
    IS the foreachBatch body of the streaming upsert sink
    (tests/test_streaming.py::test_foreachbatch_incremental_merge).

    ARG_MAX over (op, status, price) picks each column at the same
    max-seq row because seq is unique per key — column-wise argmax is
    row-wise here by construction.
    """
    from etl_project_spark.plans.money import cents

    o = _t(spark, sf_dir, "orders")
    price_c = cents("o_totalprice")
    ins = o.select(
        "o_orderkey",
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
        "o_orderstatus",
        price_c.alias("price_c"),
    )
    # +10% rounded half-up to the cent, in pure long arithmetic — the
    # money.py rule: ROUND(x*1.1, 2) on doubles flips on half-cent
    # boundaries between engines, (c*110 + 50) div 100 never does.
    upd = o.where(F.col("o_custkey") % 3 == 0).select(
        "o_orderkey",
        F.lit(2).alias("seq"),
        F.lit("U").alias("op"),
        "o_orderstatus",
        ((price_c * 110 + 50) / 100).cast("long").alias("price_c"),
    )
    dele = o.where(F.col("o_custkey") % 7 == 0).select(
        "o_orderkey",
        F.lit(3).alias("seq"),
        F.lit("D").alias("op"),
        "o_orderstatus",
        F.lit(None).cast("long").alias("price_c"),
    )
    log = ins.unionByName(upd).unionByName(dele)
    latest = log.groupBy("o_orderkey").agg(
        F.max_by("op", "seq").alias("op"),
        F.max_by("o_orderstatus", "seq").alias("o_orderstatus"),
        F.max_by("price_c", "seq").alias("price_c"),
    )
    return (
        latest.where(F.col("op") != "D")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_live"),
            (F.sum("price_c").cast("double") / 100.0).alias("total_price"),
        )
    )


@register(
    "q_union_schema_evolution",
    oracle="""
WITH legacy AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 2 = 0
),
modern AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 1
),
unified AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         CAST(NULL AS VARCHAR) AS o_orderpriority
  FROM legacy
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority FROM modern
)
SELECT o_orderstatus,
       COALESCE(o_orderpriority, '<pre-schema>') AS priority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM unified
GROUP BY 1, 2
""",
    tags=("union", "schema-evolution"),
)
def q_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: a legacy extract missing a column unions
    with the modern schema via ``unionByName(allowMissingColumns=True)``
    — absent columns NULL-fill instead of erroring or mis-aligning by
    position.

    The lakehouse reality check: snapshots written before a column
    existed must stay queryable next to new data. The split here is
    synthetic (even/odd orderkey) so both engines replay it; the oracle
    states the NULL-fill explicitly since SQL UNION is positional.
    """
    o = _t(spark, sf_dir, "orders")
    legacy = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    modern = o.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    unified = legacy.unionByName(modern, allowMissingColumns=True)
    return unified.groupBy(
        "o_orderstatus",
        F.coalesce("o_orderpriority", F.lit("<pre-schema>")).alias("priority"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )
