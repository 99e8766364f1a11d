"""SQL-text entry point: the same engine driven through ``spark.sql``.

The reference is an imperative pipeline with no query language
(SURVEY.md §3); the north star is a full query engine, and Spark gives
the SQL front-end for free — these queries register the catalog tables
as temp views and submit raw ANSI SQL, which lands in the *same*
Catalyst plans as the DataFrame API. Each query's SQL string doubles as
its DuckDB oracle verbatim, demonstrating the dialect-portable subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_project_spark.catalog import read_table
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session


def _register_views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    tune_session(spark)
    for t in tables:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


#: Shared between spark.sql and the DuckDB oracle — identical text.
_SQL_REGION_PRIORITY = """
SELECT r.r_name,
       o.o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, o.o_orderpriority
"""

_SQL_TOP_PARTS = """
WITH ranked AS (
  SELECT p_brand, p_partkey, p_retailprice,
         RANK() OVER (PARTITION BY p_brand
                      ORDER BY p_retailprice DESC, p_partkey) AS rk
  FROM part
)
SELECT p_brand, p_partkey,
       ROUND(p_retailprice, 2) AS retail_price,
       CAST(rk AS INTEGER) AS rk
FROM ranked
WHERE rk <= 2
"""


@register(
    "q_sql_region_priority_revenue",
    oracle=_SQL_REGION_PRIORITY,
    tags=("sql", "join", "agg"),
)
def q_sql_region_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw SQL through the engine: 4-way join + aggregate.

    One string, two engines: ``spark.sql`` parses it into the identical
    Catalyst plan the DataFrame build would produce (region/nation/
    customer broadcast under AQE, one shuffle on the group keys);
    DuckDB runs the same text as the oracle.
    """
    _register_views(spark, sf_dir, "orders", "customer", "nation", "region")
    return spark.sql(_SQL_REGION_PRIORITY)


@register(
    "q_sql_cte_top_parts_per_brand",
    oracle=_SQL_TOP_PARTS,
    tags=("sql", "cte", "window"),
)
def q_sql_cte_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw SQL with a CTE + window rank filter (top-2 per brand).

    The SQL-text route to `q_window_top3_orders_per_customer`'s shape.
    The unique p_partkey tiebreak in the ORDER BY keeps rank
    assignments deterministic; the CAST pins rank to int32 in both
    dialects (Spark RANK is int32, DuckDB's is int64).
    """
    _register_views(spark, sf_dir, "part")
    return spark.sql(_SQL_TOP_PARTS)


_SQL_FILTERED_AGGS = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
       ROUND(SUM(o_totalprice) FILTER (WHERE o_totalprice > 200000.0), 2)
           AS high_value_total
FROM orders
GROUP BY o_orderstatus
"""


@register(
    "q_sql_filtered_aggs",
    oracle=_SQL_FILTERED_AGGS,
    tags=("sql", "agg", "filter-clause"),
)
def q_sql_filtered_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER clause — per-aggregate predicates in one pass.

    The standard-SQL alternative to CASE-inside-SUM: each aggregate
    carries its own WHERE, evaluated in a single scan + single
    shuffle. Same text runs on both engines.
    """
    _register_views(spark, sf_dir, "orders")
    return spark.sql(_SQL_FILTERED_AGGS)


_SQL_LATERAL_TOP_ORDER = """
SELECT c.c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 2) AS top_price
FROM customer c,
     LATERAL (SELECT o_orderkey, o_totalprice
              FROM orders o
              WHERE o.o_custkey = c.c_custkey
              ORDER BY o_totalprice DESC, o_orderkey
              LIMIT 1) t
WHERE c.c_custkey < 300
"""


@register(
    "q_sql_lateral_top_order",
    oracle=_SQL_LATERAL_TOP_ORDER,
    tags=("sql", "lateral"),
)
def q_sql_lateral_top_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each customer's single priciest
    order — identical text in both engines. Catalyst decorrelates the
    per-row subquery into a ranked join, not an O(rows) loop; the
    deterministic (price, key) ordering pins the LIMIT 1 row.
    """
    _register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_SQL_LATERAL_TOP_ORDER)


_SQL_GROUP_BY_ALL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(MIN(o_orderkey) AS BIGINT) AS first_key
FROM orders
GROUP BY ALL
"""


@register(
    "q_sql_group_by_all",
    oracle=_SQL_GROUP_BY_ALL,
    tags=("sql", "group-by-all"),
)
def q_sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (infer grouping keys from the non-aggregate select
    list) — the modern-SQL convenience both engines implement with the
    same inference rule."""
    _register_views(spark, sf_dir, "orders")
    return spark.sql(_SQL_GROUP_BY_ALL)


#: Spark and DuckDB differ only in the integer-division operator
#: (``div`` vs ``//``); everything else is shared text. Arithmetic is
#: exact BIGINT cents with floor division, so seven levels of
#: recursion stay bit-identical across engines — the same trick as
#: plans/graph.py's integer PageRank.
_SQL_RECURSIVE_BALANCE = """
WITH RECURSIVE growth(c_custkey, period, bal_cents) AS (
  SELECT c_custkey, 0, CAST(ROUND(c_acctbal * 100) AS BIGINT)
  FROM customer WHERE c_acctbal > 0
  UNION ALL
  SELECT c_custkey, period + 1, bal_cents + (bal_cents * 5) {intdiv} 100
  FROM growth WHERE period < 6
)
SELECT CAST(period AS INTEGER) AS period,
       COUNT(*) AS n_accounts,
       CAST(SUM(bal_cents) AS BIGINT) AS total_cents,
       CAST(MAX(bal_cents) AS BIGINT) AS max_cents
FROM growth GROUP BY period
"""


@register(
    "q_sql_recursive_compound_balance",
    oracle=_SQL_RECURSIVE_BALANCE.format(intdiv="//"),
    tags=("sql", "recursive-cte"),
)
def q_sql_recursive_compound_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): six periods of 5%
    compound growth on positive account balances.

    Exercises the engine's genuinely iterative SQL surface — each
    recursion level reads the previous one (UNION ALL semantics; Spark
    does not yet support distinct-UNION recursion). Balances compound
    in exact BIGINT cents with floor division so every level is
    bit-identical in both engines; the anchor's WHERE rides the
    parquet scan, and each level is a map-side projection — no joins,
    state bounded by the 7-level guard.

    Scale note: Spark guards recursive CTEs with a row-count safety
    net (``spark.sql.cteRecursionRowLimit``, default 1M) that this
    bounded recursion outgrows linearly — 7 levels x |customer| blew
    the default at the sf10 sweep's 1.5M customers. The recursion here
    is provably finite (``period < 6``), so the net is resized to
    8x the anchor's upper bound from the parquet footer count (a
    metadata-only job), keeping runaway protection meaningful at any
    corpus size instead of hard-failing at ~143k accounts per level.

    The override is INTENTIONALLY session-lifetime: the returned
    DataFrame is lazy, so the limit must still be raised when the
    caller materializes it later — a save/restore inside this builder
    would put the old ceiling back before the recursion ever runs.
    The setting is monotone (``max`` with the current need, never
    lowered), only weakens a runaway guard rather than changing any
    result, and is sized from this corpus's own footer count, so a
    shared benchmark session keeps protection proportionate to the
    largest corpus it has touched.
    """
    _register_views(spark, sf_dir, "customer")
    n_customer = read_table(spark, sf_dir, "customer").count()
    current = int(spark.conf.get("spark.sql.cteRecursionRowLimit", "1000000"))
    spark.conf.set(
        "spark.sql.cteRecursionRowLimit",
        str(max(current, 1_000_000, 8 * n_customer)),
    )
    return spark.sql(_SQL_RECURSIVE_BALANCE.format(intdiv="div"))


@register(
    "q_sql_pivot_quarterly_revenue",
    oracle="""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
       ROUND(SUM(CASE WHEN EXTRACT(quarter FROM o_orderdate) = 1
                      THEN o_totalprice ELSE 0 END), 2) AS q1,
       ROUND(SUM(CASE WHEN EXTRACT(quarter FROM o_orderdate) = 2
                      THEN o_totalprice ELSE 0 END), 2) AS q2,
       ROUND(SUM(CASE WHEN EXTRACT(quarter FROM o_orderdate) = 3
                      THEN o_totalprice ELSE 0 END), 2) AS q3,
       ROUND(SUM(CASE WHEN EXTRACT(quarter FROM o_orderdate) = 4
                      THEN o_totalprice ELSE 0 END), 2) AS q4
FROM orders
GROUP BY 1
""",
    tags=("sql", "pivot"),
)
def q_sql_pivot_quarterly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark SQL's native PIVOT clause: yearly revenue spread across
    quarter columns.

    The SQL-parser twin of q_event_type_pivot's conditional-agg form —
    Catalyst rewrites PIVOT into exactly that single-pass aggregate
    (fixed IN list, so no distinct-values pre-job); the oracle states
    the rewrite explicitly since DuckDB's PIVOT syntax differs.
    """
    _register_views(spark, sf_dir, "orders")
    return spark.sql("""
        SELECT * FROM (
          SELECT EXTRACT(year FROM o_orderdate) AS order_year,
                 EXTRACT(quarter FROM o_orderdate) AS qtr,
                 o_totalprice
          FROM orders
        )
        PIVOT (
          SUM(o_totalprice)
          FOR qtr IN (1 AS q1, 2 AS q2, 3 AS q3, 4 AS q4)
        )
    """).selectExpr(
        "CAST(order_year AS BIGINT) AS order_year",
        # an empty pivot cell is NULL no matter what the inner aggregate
        # wraps — null-fill AFTER the pivot
        *[f"ROUND(COALESCE(q{i}, 0), 2) AS q{i}" for i in range(1, 5)],
    )
