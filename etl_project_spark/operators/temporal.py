"""Temporal join operators Spark lacks as built-ins: as-of join and
range join, composed from shuffle-friendly primitives.

As-of join (the time-series workhorse): for each left row, the most
recent right row at-or-before its timestamp, per key. Implemented with
the union-window technique — tag both sides, union, one shuffle on the
key, in-partition sort by (time, side), then ``last(value,
ignorenulls=True)`` carries the latest right value forward onto left
rows. Cost: ONE shuffle + in-partition sort, no join explosion, no
per-row probing — the canonical scale-out formulation (same shape as
sessionization). DuckDB validates it via native ``ASOF LEFT JOIN``.

Range join: non-equi interval containment. For a small bands/dim side
Spark plans broadcast-nested-loop — fine (each row scans a handful of
bands). For large×large interval joins, pre-bin both sides on a fixed
grid and equi-join on the bin first (``bin_width`` option) so the
non-equi predicate only runs within grid cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row: columns of the nearest right row within the
    same key — the latest with ``right_time <= left_time``
    (``direction='backward'``, the default) or the earliest with
    ``right_time >= left_time`` (``direction='forward'``); both
    inclusive, matching pandas ``merge_asof`` semantics.

    Right-side ties on (key, time) must be resolved by the caller
    (pre-dedup) — carrying an arbitrary tied row would be
    nondeterministic. ``tolerance``: optional max distance (e.g.
    ``F.expr("INTERVAL 30 DAYS")``); matches farther than it become
    NULL. Either direction is ONE shuffle on the key + a local window
    sort — forward simply runs the carry over a FOLLOWING frame with
    the tie-order flipped (right rows sort after left rows at equal
    timestamps so "at-or-after" stays inclusive).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "asof_join direction must be 'backward', 'forward', or "
            f"'nearest'; got {direction!r}"
        )
    if direction == "nearest":
        return _asof_nearest(
            left, right,
            left_key=left_key, right_key=right_key,
            left_time=left_time, right_time=right_time,
            value_cols=value_cols, tolerance=tolerance,
        )
    lt = F.col("_t")
    carried = [f"_v_{c}" for c in value_cols]

    l_tagged = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left_row"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_left_row"].dataType).alias("_left_row"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )

    if direction == "backward":
        # Sort puts a right row before left rows at the same timestamp →
        # "at-or-before" is inclusive. One shuffle on _k; window sort local.
        w = (
            W.partitionBy("_k")
            .orderBy("_t", "_side")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        carry = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
        match_t = F.last(
            F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True
        ).over(w)
    else:
        # Mirror image: right rows sort AFTER left rows at the same
        # timestamp (side desc) so "at-or-after" is inclusive, and the
        # first right row in the FOLLOWING frame is the match.
        w = (
            W.partitionBy("_k")
            .orderBy("_t", F.col("_side").desc())
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        carry = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
        match_t = F.first(
            F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True
        ).over(w)

    unioned = l_tagged.unionByName(r_tagged)
    with_carry = unioned.select(
        "_k",
        "_t",
        "_side",
        "_left_row",
        *[carry(c).alias(c) for c in carried],
        match_t.alias("_match_t"),
    )
    out = with_carry.filter(F.col("_side") == 1)
    if tolerance is not None:
        stale = (
            F.col("_match_t") < (lt - tolerance)
            if direction == "backward"
            else F.col("_match_t") > (lt + tolerance)
        )
        out = out.select(
            "_k", "_t", "_left_row", "_match_t",
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c) for c in carried],
        )
    return out.select(
        *[F.col(f"_left_row.{c}").alias(c) for c in left.columns],
        *[F.col(f"_v_{c}").alias(c) for c in value_cols],
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tolerance: Column | None = None,
) -> DataFrame:
    """direction='nearest': closest right row on either side, backward
    winning exact-distance ties (so nearest ⊇ backward at tie points —
    a documented, deterministic rule).

    Still ONE shuffle: both carries (trailing last / leading first)
    run over the SAME unioned, key-partitioned sort — Spark evaluates
    the two frames in one WindowExec pair without re-shuffling, then a
    row-local CASE picks the closer side.
    """
    lt = F.col("_t")
    carried = [f"_v_{c}" for c in value_cols]

    l_tagged = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left_row"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_left_row"].dataType).alias("_left_row"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # backward frame: right rows sort before left at equal ts (inclusive)
    wb = (
        W.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # forward frame over the same sort: right rows at the same ts sort
    # BEFORE the left row here too, so the at-or-after match needs the
    # backward frame to win ties — which is exactly the tie rule.
    wf = (
        W.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    right_t = F.when(F.col("_side") == 0, F.col("_t"))
    cols = ["_k", "_t", "_side", "_left_row"]
    proj = unioned.select(
        *cols,
        *[F.last(c, ignorenulls=True).over(wb).alias(f"_b{c}") for c in carried],
        F.last(right_t, ignorenulls=True).over(wb).alias("_bt"),
        *[F.first(c, ignorenulls=True).over(wf).alias(f"_f{c}") for c in carried],
        F.first(right_t, ignorenulls=True).over(wf).alias("_ft"),
    ).filter(F.col("_side") == 1)

    # unix_timestamp handles both LTZ and NTZ event time (a direct
    # cast-to-double is rejected for NTZ — same workaround as the
    # sessionize plans)
    bd = F.unix_timestamp(lt) - F.unix_timestamp(F.col("_bt"))
    fd = F.unix_timestamp(F.col("_ft")) - F.unix_timestamp(lt)
    use_b = F.col("_ft").isNull() | (F.col("_bt").isNotNull() & (bd <= fd))
    picked = proj.select(
        "_k",
        "_t",
        "_left_row",
        F.when(use_b, F.col("_bt")).otherwise(F.col("_ft")).alias("_match_t"),
        *[
            F.when(use_b, F.col(f"_b{c}")).otherwise(F.col(f"_f{c}")).alias(c)
            for c in carried
        ],
    )
    if tolerance is not None:
        # direct interval comparison (same as the backward/forward
        # branches) — an epoch round-trip via unix_timestamp would bake
        # the session timezone into the tolerance width
        far = (F.col("_match_t") < (F.col("_t") - tolerance)) | (
            F.col("_match_t") > (F.col("_t") + tolerance)
        )
        picked = picked.select(
            "_k", "_t", "_left_row", "_match_t",
            *[F.when(far, F.lit(None)).otherwise(F.col(c)).alias(c) for c in carried],
        )
    return picked.select(
        *[F.col(f"_left_row.{c}").alias(c) for c in left.columns],
        *[F.col(f"_v_{c}").alias(c) for c in value_cols],
    )


def range_join(
    facts: DataFrame,
    bands: DataFrame,
    *,
    value_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
) -> DataFrame:
    """Join rows to the band containing their value: ``lo <= v < hi``.

    Small bands side → Spark broadcasts and nested-loop probes a
    handful of bands per row (fine). Disjoint, covering bands are the
    caller's contract — overlapping bands duplicate rows, which is the
    SQL semantics too.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(bands), cond, how)


def dtw_search_kernel(
    query: "list[float]",
    *,
    id_col: str = "user_id",
    seq_col: str = "xs",
    band: int = 4,
    tau: float = 25000.0,
):
    """Banded-DTW range search against one query series — ``(fn,
    out_schema)`` for ``mapInPandas``.

    Two stages inside each Arrow batch, both vectorized ACROSS rows:

    1. **LB_Keogh prune** (Keogh 2002): the query's band-r envelope
       (U, L) is precomputed once; each candidate's lower bound is the
       sum of squared excursions outside the envelope. The theorem
       ``lb ≤ DTW_r`` makes ``lb > τ`` a LOSSLESS reject for the
       ≤ τ range — the registry oracle recomputes exact DTW for EVERY
       candidate, so an unsound bound (or a fat-fingered envelope)
       surfaces as a missing row, not a silent recall loss.
    2. **Exact banded DP** on survivors only: the classic
       ``dp[i][j] = (x_i − q_j)² + min(dp[i−1][j], dp[i][j−1],
       dp[i−1][j−1])`` with ``|i − j| > r`` cells pinned at +inf,
       iterated as n² vectorized numpy ops over the survivor axis —
       per-row work is bounded by the fixed series length, so a batch
       of a million candidates is still one pass.

    Float discipline: the DP is evaluated cell-by-cell in the same
    order as the oracle's recursive fold (one add of cost to a
    3-way LEAST — no reassociation), and the lb accumulates
    left-to-right over j exactly like the oracle's list fold, so both
    outputs are bit-identical pre-ROUND.
    """
    q = np.asarray(query, dtype=np.float64)
    n = len(q)
    U = np.array([q[max(0, j - band): j + band + 1].max() for j in range(n)])
    L = np.array([q[max(0, j - band): j + band + 1].min() for j in range(n)])
    out_schema = f"{id_col} long, lb_keogh double, dtw double"

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            X = np.stack(pdf[seq_col].to_numpy()).astype(np.float64)  # (m, n)
            # LB_Keogh, accumulated left-to-right to match the oracle fold
            lb = np.zeros(len(X))
            for j in range(n):
                xj = X[:, j]
                hi = xj - U[j]
                lo = L[j] - xj
                lb = lb + np.where(
                    xj > U[j], hi * hi, np.where(xj < L[j], lo * lo, 0.0)
                )
            keep = lb <= tau
            rows = {id_col: ids[keep], "lb_keogh": lb[keep]}
            S = X[keep]
            if len(S):
                m = len(S)
                inf = np.inf
                prev = np.full((m, n + 1), inf)
                prev[:, 0] = 0.0
                for i in range(1, n + 1):
                    cur = np.full((m, n + 1), inf)
                    for j in range(max(1, i - band), min(n, i + band) + 1):
                        d = S[:, i - 1] - q[j - 1]
                        cur[:, j] = d * d + np.minimum(
                            np.minimum(prev[:, j], cur[:, j - 1]), prev[:, j - 1]
                        )
                    prev = cur
                rows["dtw"] = prev[:, n]
            else:
                rows["dtw"] = np.array([], dtype=np.float64)
            out = pd.DataFrame(rows)
            yield out[out["dtw"] <= tau]

    return run, out_schema


def dtw_bounds_kernel(
    queries: "dict[int, list[float]]",
    *,
    id_col: str = "user_id",
    seq_col: str = "xs",
    band: int = 4,
):
    """Stage-1 kernel of the top-k DTW join: for every (candidate,
    probe) pair emit BOTH bounds — LB_Keogh below and the diagonal
    path's Euclidean sum above (the i→i alignment is an admissible
    banded path, so ``lb ≤ DTW_r ≤ ub``). Vectorized across rows per
    probe; output is narrow (two doubles per pair).

    The ub accumulates LEFT-TO-RIGHT over j (not ``np.sum``'s pairwise
    blocks): ``q_dtw_similar_users`` derives its radius τ from a ub
    quantile that the SQL oracle replays with a list fold, so the ub
    must be bit-identical across engines — same discipline as the lb.
    (For ``q_dtw_topk_join`` the fold order is output-invariant: its
    oracle DPs every pair and never sees the ub.)"""
    probes = {int(p): np.asarray(q, dtype=np.float64) for p, q in queries.items()}
    n = len(next(iter(probes.values())))
    envs = {}
    for p, q in probes.items():
        U = np.array([q[max(0, j - band): j + band + 1].max() for j in range(n)])
        L = np.array([q[max(0, j - band): j + band + 1].min() for j in range(n)])
        envs[p] = (U, L)
    out_schema = f"probe_id long, {id_col} long, lb double, ub double"

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            X = np.stack(pdf[seq_col].to_numpy()).astype(np.float64)
            frames = []
            for p, q in probes.items():
                U, L = envs[p]
                lb = np.zeros(len(X))
                for j in range(n):
                    xj = X[:, j]
                    hi = xj - U[j]
                    lo = L[j] - xj
                    lb = lb + np.where(
                        xj > U[j], hi * hi, np.where(xj < L[j], lo * lo, 0.0)
                    )
                ub = np.zeros(len(X))
                for j in range(n):
                    dj = X[:, j] - q[j]
                    ub = ub + dj * dj
                frames.append(
                    pd.DataFrame(
                        {"probe_id": p, id_col: ids, "lb": lb, "ub": ub}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return run, out_schema


def dtw_exact_kernel(
    queries: "dict[int, list[float]]",
    *,
    id_col: str = "user_id",
    seq_col: str = "xs",
    band: int = 4,
):
    """Stage-2 kernel: exact banded DP for surviving (candidate,
    probe) pairs — rows arrive already pruned, grouped inside each
    Arrow batch by probe so the DP vectorizes across the candidate
    axis. Identical cell order to :func:`dtw_search_kernel` (and to
    the oracle's recursive fold)."""
    probes = {int(p): np.asarray(q, dtype=np.float64) for p, q in queries.items()}
    n = len(next(iter(probes.values())))
    out_schema = f"probe_id long, {id_col} long, dtw double"

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            for p, grp in pdf.groupby("probe_id"):
                q = probes[int(p)]
                S = np.stack(grp[seq_col].to_numpy()).astype(np.float64)
                m = len(S)
                prev = np.full((m, n + 1), np.inf)
                prev[:, 0] = 0.0
                for i in range(1, n + 1):
                    cur = np.full((m, n + 1), np.inf)
                    for j in range(max(1, i - band), min(n, i + band) + 1):
                        d = S[:, i - 1] - q[j - 1]
                        cur[:, j] = d * d + np.minimum(
                            np.minimum(prev[:, j], cur[:, j - 1]), prev[:, j - 1]
                        )
                    prev = cur
                yield pd.DataFrame(
                    {
                        "probe_id": int(p),
                        id_col: grp[id_col].to_numpy(),
                        "dtw": prev[:, n],
                    }
                )

    return run, out_schema
