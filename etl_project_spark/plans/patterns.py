"""TPC-H pattern wave 2: the remaining classic decision-support shapes
(Q4/Q7/Q14/Q15/Q16/Q17/Q19/Q21 analogues) on the driver corpus.

The reference computes none of these (SURVEY.md §2.5); they complete
the north-star relational inventory started in plans/relational.py
(Q1/Q3/Q5 + Q2/Q18/Q22 patterns live there). The corpus has no
partsupp table, so lineitem serves as the part↔supplier fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_spark.catalog import read_table
from etl_project_spark.plans.money import cents, disc_price_s4, money_sum, money_sum_exact
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return read_table(spark, sf_dir, name)


def _disc_price():
    # built lazily: Column arithmetic needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q_exists_returned_orders",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
""",
    tags=("join", "semi", "exists"),
)
def q_exists_returned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-correlated count per priority (TPC-H Q4 shape).

    The correlated EXISTS decorrelates to a left-semi join — Spark
    never evaluates a per-row subquery. The date filter prunes the
    probe side at the scan; the semi join's build side carries only
    l_orderkey after pushdown of the flag filter, so at 100 TB the
    shuffle moves one bigint per matching lineitem row.
    """
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q_orders_returned_never_audited",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
  AND NOT EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = o.o_orderkey AND l2.l_returnflag = 'A')
GROUP BY o_orderstatus
""",
    tags=("join", "semi", "anti", "exists"),
)
def q_orders_returned_never_audited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + NOT EXISTS double correlation (TPC-H Q21 core).

    Composes a left-semi and a left-anti join against two filtered
    scans of the same fact. Catalyst reuses the lineitem scan
    (ReusedExchange) when the two branches shuffle on the same key —
    the Q21 pattern that separates engines that decorrelate well from
    those that re-scan per subquery.
    """
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    flagged = lambda flag: li.filter(F.col("l_returnflag") == flag).select("l_orderkey")  # noqa: E731
    return (
        o.join(flagged("R"), o.o_orderkey == F.col("l_orderkey"), "left_semi")
        .join(flagged("A"), o.o_orderkey == F.col("l_orderkey"), "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q_promo_revenue_ratio",
    oracle="""
SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0.0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
""",
    tags=("join", "agg", "conditional"),
)
def q_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-revenue ratio (TPC-H Q14): promo share of revenue.

    One broadcast join (part is the dim) + a single-group aggregate of
    two conditional sums — the numerator is a CASE inside SUM, not a
    second scan. The whole query is one stage plus a 1-row reduce.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.round(100.0 * F.sum(promo) / F.sum(_disc_price()), 4).alias("promo_pct"))
    )


@register(
    "q_top_revenue_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(ROUND(r.total_revenue, 2) AS DOUBLE) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    tags=("join", "subquery", "argmax"),
)
def q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-revenue supplier via view + scalar subquery (TPC-H Q15).

    The revenue aggregate is computed once and reused for both the max
    and the join-back (Catalyst caches nothing across actions, but
    within one plan the shared subtree shuffles once under AQE reuse).
    The scalar max broadcasts as a 1-row cross input. Ties would return
    multiple rows, matching the SQL semantics.
    """
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(money_sum_exact(disc_price_s4()).alias("total_revenue_s4"))
    )
    best = revenue.agg(F.max("total_revenue_s4").alias("best"))
    return (
        revenue.join(F.broadcast(best), revenue.total_revenue_s4 == best.best)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue_s4") / F.lit(10**4), 2)
            .cast("double")
            .alias("total_revenue"),
        )
    )


@register(
    "q_nation_pair_volume",
    oracle="""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(YEAR(l.l_shipdate) AS INTEGER) AS ship_year,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS volume
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY sn.n_name, cn.n_name, YEAR(l.l_shipdate)
""",
    tags=("join", "multiway", "agg"),
)
def q_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional nation-pair shipping volume by year (TPC-H Q7).

    Five joins, but only orders↔lineitem is fact-to-fact — supplier,
    customer, and both nation hops broadcast. The disjunctive pair
    predicate applies *after* each side is narrowed to the two nations,
    so the big join's inputs are pre-filtered (selectivity 2/25 each
    side) before the l_orderkey shuffle.
    """
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    supp = (
        s.join(F.broadcast(n.filter(F.col("n_name").isin(*pair))), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        c.join(F.broadcast(n.filter(F.col("n_name").isin(*pair))), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(money_sum(disc_price_s4(), 4).alias("volume"))
    )


@register(
    "q_supplier_counts_excluding",
    oracle="""
SELECT p.p_brand, p.p_type,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type
""",
    tags=("join", "anti", "distinct-agg"),
)
def q_supplier_counts_excluding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per brand/type minus an exclusion list (Q16).

    NOT IN over a non-nullable key decorrelates to a left-anti join
    against the (tiny, broadcast) blacklist. COUNT(DISTINCT) then
    shuffles (brand, type, suppkey) once — Spark expands distinct
    aggregates into a two-phase plan automatically.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(p.filter(F.col("p_brand") != "Brand#1")), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_small_qty_parts_revenue",
    oracle="""
WITH thresholds AS (
  SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN thresholds t ON l.l_partkey = t.l_partkey
WHERE p.p_brand = 'Brand#11' AND l.l_quantity < t.half_avg_qty
""",
    tags=("join", "subquery", "correlated-agg"),
)
def q_small_qty_parts_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated per-part average threshold (TPC-H Q17 shape).

    The correlated AVG subquery becomes aggregate-then-join: one pass
    computes half the mean quantity per part, the fact joins back on
    partkey. Exact cross-engine float parity holds because l_quantity
    is integer-valued — partial sums are exact, so AVG is
    order-insensitive. Brand filter broadcasts; threshold join shuffles
    on l_partkey.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(p.filter(F.col("p_brand") == "Brand#11")), li.l_partkey == p.p_partkey)
        .join(thresholds, li.l_partkey == thresholds.t_partkey)
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q_disjunctive_band_revenue",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#2'  AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
""",
    tags=("join", "disjunctive"),
)
def q_disjunctive_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive multi-band join predicate (TPC-H Q19 shape).

    The OR groups mix build-side (brand/size) and probe-side
    (quantity) columns, so they can't all push below the join — but
    Catalyst derives the common `p_brand IN (...)` prefilter for the
    broadcast side, and the residual OR evaluates post-join inside
    codegen. The classic test that an engine doesn't fall back to a
    cross product on OR predicates.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(band).agg(
        money_sum(disc_price_s4(), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
# TPC-H pattern wave 3: Q8/Q9/Q10/Q12/Q13/Q20 analogues. The corpus lacks
# partsupp, l_shipmode, and commit/receipt dates, so Q9 uses p_retailprice
# as the unit-cost proxy and Q12 defines "late" as shipped > 60 days after
# the order date.
#
# Revenue sums here use EXACT scaled-integer arithmetic (plans/money.py):
# 2-decimal columns become lossless cents-as-BIGINT, products stay in long
# codegen, only the SUM runs in decimal(38,0) for overflow safety, one
# exact divide + ROUND at the end — deterministic like the decimal
# formulation round 2 used, without its per-row BigDecimal multiply.
# --------------------------------------------------------------------------
@register(
    "q_nation_market_share",
    oracle="""
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
       CAST(ROUND(SUM(CASE WHEN sn.n_name = 'NATION_2'
                      THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                           * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                      ELSE 0 END), 2) AS DOUBLE) AS nation_volume,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS total_volume
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
JOIN region r   ON cn.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY EXTRACT(year FROM o.o_orderdate)
""",
    tags=("join", "multiway", "tpch-q8"),
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share inside a region per year (TPC-H Q8 shape).

    Seven-table star join with TWO independent joins to the same dim
    (customer-nation and supplier-nation) — the self-role-playing dim
    pattern. Both nation joins and the region join broadcast; the only
    shuffles are fact⋈fact (lineitem⋈orders) and the final year agg.
    The share is emitted as the two ROUND(SUM)-stable volumes rather
    than their ratio — division after rounding is oracle-safe, the
    unrounded ratio is not (float boundary).
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    s = _t(spark, sf_dir, "supplier")
    cn = n.alias("cn")
    sn = n.alias("sn")
    asia = r.filter(F.col("r_name") == "ASIA")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .join(F.broadcast(asia), F.col("cn.n_regionkey") == asia.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn.n_nationkey"))
    )
    disc = disc_price_s4()
    nation_only = F.when(F.col("sn.n_name") == "NATION_2", disc).otherwise(F.lit(0))
    return vol.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        money_sum(nation_only, 4).alias("nation_volume"),
        money_sum(disc, 4).alias("total_volume"),
    )


@register(
    "q_profit_by_nation_year",
    oracle="""
SELECT sn.n_name AS supp_nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                      - CAST(0.5 AS DECIMAL(2,1))
                        * CAST(p.p_retailprice AS DECIMAL(18,4))
                        * CAST(l.l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY sn.n_name, EXTRACT(year FROM o.o_orderdate)
""",
    tags=("join", "multiway", "tpch-q9"),
)
def q_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-line profit per supplier nation and year (TPC-H Q9 shape,
    p_retailprice/2 standing in for the missing ps_supplycost).

    The p_name LIKE filter prunes part BEFORE the join (pushed to the
    scan), shrinking the build side; profit arithmetic runs inside
    codegen on the joined rows. Shuffles: lineitem⋈orders plus the
    final (nation, year) agg — part/supplier/nation all broadcast.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    # 0.5 * retail * qty as exact longs without assuming integral
    # quantity: both factors go through the lossless cents() view
    # (retail and quantity each carry <= 2 decimals in this corpus), so
    # retail_cents * qty_cents * 50 is the cost at scale 10^6; the
    # discounted price (scale 10^4) lifts by 100 to match.
    cost_s6 = cents("p_retailprice") * cents("l_quantity") * F.lit(50)
    profit_s6 = disc_price_s4() * F.lit(100) - cost_s6
    return j.groupBy(
        F.col("n_name").alias("supp_nation"),
        F.year("o_orderdate").alias("o_year"),
    ).agg(money_sum(profit_s6, 6).alias("profit"))


@register(
    "q_returned_item_revenue",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("join", "topk", "tpch-q10"),
)
def q_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 customers by lost (returned-item) revenue in a half-year
    window (TPC-H Q10 shape).

    Both filters push to their scans (returnflag on lineitem, the date
    band on orders) before the fact⋈fact join; the top-20 compiles to
    TakeOrderedAndProject — per-task heaps, no global sort. Ties break
    on c_custkey so the LIMIT boundary is deterministic across engines.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    j = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .filter(
            (F.col("l_returnflag") == "R")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(money_sum(disc_price_s4(), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q_late_shipment_priority",
    oracle="""
SELECT l.l_linestatus,
       SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY l.l_linestatus
""",
    tags=("join", "conditional-agg", "tpch-q12"),
)
def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-shipment counts split by order priority (TPC-H Q12 shape;
    "late" = shipped > 60 days after the order date — the corpus has
    no commit/receipt dates).

    The lateness predicate references both join sides, so it evaluates
    as a post-join filter inside codegen; the CASE-split double count
    is one pass, map-side-combined. One fact⋈fact shuffle plus the
    tiny linestatus agg.
    """
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q_customer_order_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
    tags=("join", "outer", "histogram", "tpch-q13"),
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer count by number of qualifying orders (TPC-H Q13 shape).

    The non-key join predicate (priority exclusion) must stay IN the
    left-join condition — as a WHERE it would silently turn the outer
    join inner and drop zero-order customers. Two aggregations: the
    per-customer count (shuffle on custkey) then the tiny histogram.
    COUNT(o_orderkey) counts matches only (NULL-safe), giving the
    0-bucket for free.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (F.col("o_orderpriority") != "5-LOW"),
        "left",
    )
    per_cust = j.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q_top_quantity_suppliers",
    oracle="""
SELECT s.s_suppkey, s.s_name, sold.total_qty
FROM supplier s
JOIN (
  SELECT l_suppkey, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  GROUP BY l_suppkey
) sold ON s.s_suppkey = sold.l_suppkey
WHERE sold.total_qty > (
  SELECT 1.05 * AVG(qty) FROM (
    SELECT CAST(SUM(l_quantity) AS BIGINT) AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY l_suppkey
  )
)
""",
    tags=("join", "subquery", "tpch-q20"),
)
def q_top_quantity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers moving outsized recent volume (TPC-H Q20 shape adapted:
    qualification is total quantity > 1.05× the all-supplier average —
    the corpus has no partsupp availability to compare against, and its
    per-supplier volumes are tight enough that 1.05 is the meaningful
    cut; 1.2× selects nobody).

    The per-supplier aggregate computes once and feeds both the join
    and the scalar average (Catalyst reuses the exchange); the scalar
    threshold broadcasts. l_quantity is integral in this corpus, so the
    BIGINT cast keeps both engines in exact integer arithmetic.
    """
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    sold = li.groupBy("l_suppkey").agg(
        F.sum("l_quantity").cast("bigint").alias("total_qty")
    )
    threshold = sold.agg((F.avg("total_qty") * 1.05).alias("t"))
    return (
        s.join(sold, s.s_suppkey == sold.l_suppkey)
        .join(F.broadcast(threshold))
        .filter(F.col("total_qty") > F.col("t"))
        .select("s_suppkey", "s_name", "total_qty")
    )
