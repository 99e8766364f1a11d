"""Two-phase (bucketed) replacements for entity-scale global windows.

A global ``ROW_NUMBER() OVER (ORDER BY v)`` or running ``SUM() OVER
(ORDER BY k)`` forces every row through ONE task — fine for a 10-row
decile rollup, a driver-adjacent bottleneck when the frame grows with
the entity count (customers, documents).  The scheme here is the same
one the exact-median plan (`runtime_filters.py:233`) already proves:

1. assign each row a fixed-width BUCKET of the ordering value
   (min/max come from one scalar agg, broadcast);
2. aggregate per-bucket counts/sums — a table of at most ``nb`` rows;
3. run the cumulative window over THAT bounded table (a deliberate
   single partition of <= ``nb`` rows, never entity-scale);
4. broadcast the per-bucket exclusive offsets back and finish with an
   in-bucket window partitioned BY bucket — so no task ever sees more
   than one bucket of rows.

Rows with equal ordering values always share a bucket (the bucket is a
pure function of the value), so in-bucket ordering + the broadcast
offset reproduces the exact global rank / prefix sum, tiebreaks
included.  At 1000 executors the per-bucket stage is an ordinary
shuffled window over ~n/nb rows per task.

Models the concentration/packing statistics of the reference's pandas
post-processing (reference ``flows/etl.py:289-311`` computes
whole-frame derived columns in pandas, which is single-node by
construction); re-expressed Spark-first per SURVEY.md §2.5.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["bucketed_global_rank", "bucketed_prefix_sum", "ntile_from_rank"]


def _non_null_or_raise(col_name: str, fn_name: str) -> Column:
    """Ordering value with an in-data-path NULL trap.

    Both two-phase helpers join rows to bucket offsets on a bucket id
    derived from the ordering value; a NULL value yields a NULL bucket
    id that never matches the inner join, silently DROPPING the row —
    whereas the ROW_NUMBER/SUM window forms they replace rank NULLs
    first. No current call site can produce NULLs (all feed non-null
    aggregates), so rather than pick a NULLS FIRST emulation nobody
    exercises, fail loudly if a future call site violates the contract.
    ``raise_error`` sits inside the bucket expression itself, so
    Catalyst cannot prune it away as an unused check column.
    """
    return F.when(
        F.col(col_name).isNull(),
        F.raise_error(
            F.lit(
                f"{fn_name}: NULL in ordering column '{col_name}' — the "
                "two-phase bucket scheme requires non-null ordering values "
                "(the window form it replaces would rank NULLs first)"
            )
        ),
    ).otherwise(F.col(col_name))


def _bucket_col(v: Column, lo: Column, hi: Column, nb: int, descending: bool) -> Column:
    """Fixed-width bucket id of ``v`` over [lo, hi]; bucket 0 holds the
    FIRST values in the requested order.  Degenerate range (hi == lo)
    collapses to bucket 0."""
    width = (hi - lo) / float(nb)
    offset = (hi - v) if descending else (v - lo)
    return (
        F.when(hi == lo, F.lit(0))
        .otherwise(F.least(F.floor(offset / width), F.lit(nb - 1)))
        .cast("int")
    )


def bucketed_global_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: Sequence[str],
    nb: int = 1024,
    descending: bool = False,
) -> DataFrame:
    """Exact global ``ROW_NUMBER() OVER (ORDER BY value [DESC], *tiebreaks)``
    as column ``i`` (1-based), with no entity-scale single partition.

    ``tiebreak_cols`` must make the total order deterministic (the same
    contract the window form had).  Adds ``i``; preserves input columns.

    ``value_col`` must be non-null: the window form ranks NULLs first,
    but here a NULL bucket id would silently miss the offsets join and
    drop the row. Rather than diverge silently, a NULL ordering value
    fails the job with an explicit error (the guard lives inside the
    bucket expression, so column pruning cannot eliminate it).
    """
    rng = df.agg(F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi"))
    v = _non_null_or_raise(value_col, "bucketed_global_rank")
    bucketed = df.crossJoin(F.broadcast(rng)).withColumn(
        "_bk", _bucket_col(v, F.col("_lo"), F.col("_hi"), nb, descending)
    )
    counts = bucketed.groupBy("_bk").agg(F.count(F.lit(1)).alias("_c"))
    # Cumulative over the <= nb-row bucket table: a bounded single
    # partition by design (same as the exact-median bucket cumulative).
    wcum = W.orderBy("_bk").rowsBetween(W.unboundedPreceding, -1)
    offs = counts.select(
        "_bk", F.coalesce(F.sum("_c").over(wcum), F.lit(0)).alias("_before")
    )
    order = [F.desc(value_col) if descending else F.asc(value_col)]
    order += [F.asc(c) for c in tiebreak_cols]
    win = W.partitionBy("_bk").orderBy(*order)
    return (
        bucketed.join(F.broadcast(offs), "_bk")
        .withColumn("i", F.row_number().over(win) + F.col("_before"))
        .drop("_bk", "_lo", "_hi", "_before")
    )


def bucketed_prefix_sum(
    df: DataFrame,
    order_col: str,
    sum_col: str,
    out_col: str = "off",
    nb: int = 1024,
) -> DataFrame:
    """Exact EXCLUSIVE prefix sum of ``sum_col`` in ``order_col`` order
    (``SUM() OVER (ORDER BY k ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)``)
    as column ``out_col``, without streaming every row through one task.

    ``order_col`` must be a unique, NON-NULL numeric key (doc_id-like);
    equal keys would make the exclusive sum ambiguous in either
    formulation, and a NULL key fails the job explicitly (see
    :func:`_non_null_or_raise`) instead of silently dropping the row.
    """
    rng = df.agg(F.min(order_col).alias("_lo"), F.max(order_col).alias("_hi"))
    bucketed = df.crossJoin(F.broadcast(rng)).withColumn(
        "_bk",
        _bucket_col(
            _non_null_or_raise(order_col, "bucketed_prefix_sum"),
            F.col("_lo"),
            F.col("_hi"),
            nb,
            False,
        ),
    )
    sums = bucketed.groupBy("_bk").agg(F.sum(sum_col).alias("_s"))
    wcum = W.orderBy("_bk").rowsBetween(W.unboundedPreceding, -1)
    offs = sums.select(
        "_bk", F.coalesce(F.sum("_s").over(wcum), F.lit(0)).alias("_before")
    )
    wloc = W.partitionBy("_bk").orderBy(order_col).rowsBetween(
        W.unboundedPreceding, -1
    )
    return (
        bucketed.join(F.broadcast(offs), "_bk")
        .withColumn(
            out_col,
            F.col("_before") + F.coalesce(F.sum(sum_col).over(wloc), F.lit(0)),
        )
        .drop("_bk", "_lo", "_hi", "_before")
    )


def ntile_from_rank(i: Column, n: Column, k: int) -> Column:
    """ANSI ``NTILE(k)`` computed arithmetically from a 1-based global
    rank ``i`` and total count ``n``: the first ``n % k`` tiles take
    ``n/k + 1`` rows, the rest ``n/k`` — exactly the window function's
    contract, with no window."""
    q = F.floor(n / k)
    r = n % k
    big = r * (q + 1)  # rows covered by the oversized leading tiles
    return (
        F.when(i <= big, F.ceil(i / (q + 1)))
        .otherwise(r + F.ceil((i - big) / q))
        .cast("int")
    )
