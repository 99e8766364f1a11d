"""Unit tests for asof_join direction='nearest': tie rule, one-sided
matches, and the tolerance cutoff — the paths the registry query's
natural data may not exercise every round.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from etl_project_spark.operators.temporal import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, datetime(2024, 1, 1, 12, 0, 0)),   # between errors: 11:00 and 12:30
            (2, 10, datetime(2024, 1, 1, 23, 0, 0)),   # after the last error
            (3, 20, datetime(2024, 1, 1, 6, 0, 0)),    # before the only error
            (4, 30, datetime(2024, 1, 1, 9, 0, 0)),    # key with no right rows
            (5, 40, datetime(2024, 1, 1, 9, 0, 0)),    # EXACT tie: errors at 8:00 and 10:00
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, datetime(2024, 1, 1, 11, 0, 0), 101),
            (10, datetime(2024, 1, 1, 12, 30, 0), 102),
            (20, datetime(2024, 1, 1, 7, 0, 0), 201),
            (40, datetime(2024, 1, 1, 8, 0, 0), 401),
            (40, datetime(2024, 1, 1, 10, 0, 0), 402),
        ],
        "user_id long, err_ts timestamp, err_id long",
    )
    return left, right.select(
        "user_id", "err_ts", F.col("err_id")
    )


def _run(spark, tolerance=None):
    left, right = _frames(spark)
    out = asof_join(
        left,
        right,
        left_key="user_id",
        right_key="user_id",
        left_time="ts",
        right_time="err_ts",
        value_cols=["err_id"],
        direction="nearest",
        tolerance=tolerance,
    )
    return {r.event_id: r.err_id for r in out.collect()}


def test_nearest_picks_closer_side(spark):
    got = _run(spark)
    assert got[1] == 102  # 12:30 is 30min away vs 11:00 an hour away
    assert got[2] == 102  # only backward exists
    assert got[3] == 201  # only forward exists
    assert got[4] is None  # no right rows for the key at all


def test_nearest_tie_prefers_backward(spark):
    got = _run(spark)
    # 9:00 sits exactly 1h from both 8:00 and 10:00 — documented rule:
    # backward wins exact-distance ties
    assert got[5] == 401


def test_nearest_tolerance_nulls_far_matches(spark):
    got = _run(spark, tolerance=F.expr("INTERVAL 45 MINUTES"))
    assert got[1] == 102        # 30 min away — inside tolerance
    assert got[2] is None       # hours away
    assert got[3] is None       # an hour away
    assert got[5] is None       # exactly 60 min > 45 min


def _brute_banded_dtw(x, q, band):
    import numpy as np

    n = len(q)
    inf = np.inf
    prev = np.full(n + 1, inf)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(n + 1, inf)
        for j in range(1, n + 1):
            if abs(i - j) > band:
                continue
            d = x[i - 1] - q[j - 1]
            cur[j] = d * d + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return prev[n]


def test_dtw_kernel_lb_is_lower_bound_and_prune_lossless():
    """LB_Keogh must lower-bound banded DTW on arbitrary series, and
    the kernel's pruned output must equal the brute-force <= tau
    filter exactly (values and membership)."""
    import numpy as np
    import pandas as pd

    from etl_project_spark.operators.temporal import dtw_search_kernel

    rng = np.random.RandomState(11)
    n = 32
    q = list(rng.uniform(0, 100, n))
    X = rng.uniform(0, 100, (60, n))
    tau = float(np.median([_brute_banded_dtw(x, np.asarray(q), 4) for x in X]))
    fn, _ = dtw_search_kernel(q, id_col="user_id", seq_col="xs", band=4, tau=tau)
    pdf = pd.DataFrame({"user_id": np.arange(60), "xs": list(X)})
    out = pd.concat(list(fn(iter([pdf])))).set_index("user_id")
    for i, x in enumerate(X):
        d = _brute_banded_dtw(x, np.asarray(q), 4)
        if d <= tau:
            assert i in out.index, f"lost qualifying row {i} (lb unsound?)"
            assert out.loc[i, "dtw"] == d
            assert out.loc[i, "lb_keogh"] <= d + 1e-9
        else:
            assert i not in out.index


def test_dtw_kernel_band_blocks_far_warping():
    """A series equal to the query but shifted by more than the band
    radius must pay full cost — the band constraint must actually
    constrain (unbanded DTW of a pure shift would be ~0)."""
    import numpy as np
    import pandas as pd

    from etl_project_spark.operators.temporal import dtw_search_kernel

    n = 32
    base = np.sin(np.arange(n + 8) / 2.0) * 50
    q = list(base[:n])
    shifted = base[8 : 8 + n]  # same shape, shift 8 > band 4
    fn, _ = dtw_search_kernel(q, id_col="user_id", seq_col="xs", band=4, tau=1e18)
    pdf = pd.DataFrame({"user_id": [1], "xs": [shifted]})
    out = pd.concat(list(fn(iter([pdf]))))
    assert out.iloc[0]["dtw"] > 100.0  # far from the ~0 of unbanded warping


def test_dtw_topk_join_pruning_is_lossless():
    """The Fagin-style cut (keep lb <= kth-smallest ub) must never
    lose a true top-k neighbor: compare the two-stage kernels' result
    against brute-force DTW over random series, including the
    diagonal-path upper bound's validity (ub >= dtw)."""
    import numpy as np
    import pandas as pd

    from etl_project_spark.operators.temporal import (
        dtw_bounds_kernel,
        dtw_exact_kernel,
    )

    rng = np.random.RandomState(5)
    n, k, band = 32, 3, 4
    queries = {100 + p: list(rng.uniform(0, 50, n)) for p in range(3)}
    X = rng.uniform(0, 50, (40, n))
    pdf = pd.DataFrame({"user_id": np.arange(40), "xs": list(X)})

    fn_a, _ = dtw_bounds_kernel(queries, band=band)
    bounds = pd.concat(list(fn_a(iter([pdf]))))
    for pid, q in queries.items():
        sub = bounds[bounds.probe_id == pid]
        brute = {
            int(i): _brute_banded_dtw(x, np.asarray(q), band)
            for i, x in zip(pdf["user_id"], X)
        }
        for _, r in sub.iterrows():
            assert r.lb <= brute[int(r.user_id)] + 1e-9
            assert r.ub >= brute[int(r.user_id)] - 1e-9
        tau = np.sort(sub["ub"].to_numpy())[k - 1]
        surv = sub[sub.lb <= tau][["probe_id", "user_id"]]
        surv = surv.merge(pdf, on="user_id")
        fn_b, _ = dtw_exact_kernel(queries, band=band)
        exact = pd.concat(list(fn_b(iter([surv]))))
        got = exact.sort_values(["dtw", "user_id"]).head(k)
        want = sorted(brute.items(), key=lambda t: (t[1], t[0]))[:k]
        assert list(got["user_id"]) == [u for u, _ in want]
        assert list(got["dtw"]) == [d for _, d in want]


def test_dtw_topk_join_fewer_than_k_candidates(spark, tmp_path):
    """A probe with fewer than k candidates has no kth ub — the cutoff
    must degrade to +inf (keep everything), not NULL (which silently
    filtered out ALL of that probe's survivors, ADVICE r12). With 5
    eligible users (4 probes + 1 candidate) and k=3, every probe must
    still return its single neighbor."""
    from datetime import datetime, timedelta

    from etl_project_spark.plans.registry import all_specs

    base = datetime(2024, 1, 1)
    rows = [
        (u * 1000 + i, base + timedelta(hours=i), u, "view", float((u * 7 + i * 3) % 50), "{}")
        for u in range(1, 6)
        for i in range(32)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = (
        all_specs()["q_dtw_topk_join"].builder(spark, str(tmp_path)).collect()
    )
    # 4 probes x 1 candidate, rank 1 each
    assert len(out) == 4
    assert {r.rank for r in out} == {1}
    assert {r.user_id for r in out} == {5}
