"""Hypothesis property tests for the pure (driver-side) math the
distributed operators lean on: LSH sizing, hyperplane generation, and
the deterministic stand-in decoder. These functions run on the driver
when plans are BUILT, so a wrong corner case silently mis-sizes an
operator at every scale — property coverage is cheap here (no Spark
session per example) and catches the corners example tests miss.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_project_spark.operators.dedup import (
    _hyperplane_signs,
    hyperplane_tables_for_recall,
)
from etl_project_spark.operators.multimodal import _fake_image_decoder, _fnv1a64


@settings(max_examples=200, deadline=None)
@given(
    threshold=st.floats(min_value=0.05, max_value=0.999),
    planes=st.integers(min_value=1, max_value=24),
    recall=st.floats(min_value=0.5, max_value=0.999),
)
def test_lsh_table_count_achieves_target_recall(threshold, planes, recall):
    """The analytic table count must actually deliver the recall it
    promises: 1 - (1 - p^b)^L >= target, with L positive and not
    absurdly above the minimal count (L-1 tables must NOT suffice)."""
    import math

    L = hyperplane_tables_for_recall(threshold, planes, recall)
    assert L >= 1
    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    p_table = p**planes
    achieved = 1.0 - (1.0 - p_table) ** L
    assert achieved >= recall - 1e-9
    if L > 1:
        short = 1.0 - (1.0 - p_table) ** (L - 1)
        assert short < recall + 1e-9  # minimality: one fewer would miss


@settings(max_examples=100, deadline=None)
@given(
    planes=st.integers(min_value=1, max_value=16),
    recall=st.floats(min_value=0.5, max_value=0.99),
)
def test_lsh_table_count_monotone_in_threshold(planes, recall):
    """Lower similarity thresholds are harder to catch — the table
    count must be non-increasing as the threshold rises."""
    thresholds = [0.3, 0.5, 0.7, 0.9, 0.97]
    counts = [
        hyperplane_tables_for_recall(t, planes, recall) for t in thresholds
    ]
    assert counts == sorted(counts, reverse=True)


@settings(max_examples=50, deadline=None)
@given(
    n_planes=st.integers(min_value=1, max_value=64),
    dim=st.integers(min_value=1, max_value=128),
)
def test_hyperplane_signs_shape_and_determinism(n_planes, dim):
    a = _hyperplane_signs(n_planes, dim)
    b = _hyperplane_signs(n_planes, dim)
    assert a == b  # sha-seeded: identical across processes/executors
    assert len(a) == n_planes and all(len(row) == dim for row in a)
    assert all(v in (-1, 1) for row in a for v in row)


@settings(max_examples=200, deadline=None)
@given(payload=st.binary(min_size=0, max_size=512))
def test_fake_decoder_ranges_for_arbitrary_bytes(payload):
    """The stand-in decoder must emit schema-valid values for ANY
    payload — it runs inside the Arrow batch loop where one bad row
    fails the whole task."""
    d = _fake_image_decoder(payload, "image")
    assert 16 <= d["width"] <= 16 + 1919
    assert 16 <= d["height"] <= 16 + 1079
    assert 1 <= d["n_channels"] <= 4
    assert 0.0 <= d["mean_luma"] <= 1.0
    assert d == _fake_image_decoder(payload, "image")  # deterministic


@settings(max_examples=200, deadline=None)
@given(payload=st.binary(min_size=0, max_size=512))
def test_fnv1a64_is_stable_int64(payload):
    h = _fnv1a64(payload)
    assert h == _fnv1a64(payload)
    assert -(2**63) <= h < 2**63  # fits the Spark LongType column


@settings(max_examples=150, deadline=None)
@given(
    seq=st.lists(st.integers(min_value=0, max_value=7), min_size=1, max_size=400),
)
def test_gif_lzw_roundtrip_arbitrary_sequences(seq):
    """GIF LZW must invert for ANY index sequence — including runs
    that trigger the KwKwK case and lengths that land the final table
    add exactly on a width boundary (the EOI corner)."""
    from etl_project_spark.operators.multimodal import (
        _lzw_decode_gif,
        _lzw_encode_gif,
    )

    mcs = 2 if max(seq) < 4 else 3
    assert _lzw_decode_gif(_lzw_encode_gif(seq, mcs), mcs) == seq


@settings(max_examples=60, deadline=None)
@given(
    data=st.data(),
)
def test_dtw_lb_keogh_is_always_a_lower_bound(data):
    """LB_Keogh <= banded DTW for arbitrary series (the losslessness
    theorem the plan's pruning rests on), via the kernel itself at an
    infinite tau so nothing is pruned."""
    import numpy as np
    import pandas as pd

    from etl_project_spark.operators.temporal import dtw_search_kernel

    n = 16
    q = data.draw(
        st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False),
            min_size=n,
            max_size=n,
        )
    )
    x = data.draw(
        st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False),
            min_size=n,
            max_size=n,
        )
    )
    fn, _ = dtw_search_kernel(q, id_col="i", seq_col="xs", band=3, tau=float("inf"))
    out = pd.concat(list(fn(iter([pd.DataFrame({"i": [0], "xs": [np.array(x)]})]))))
    assert out.iloc[0]["lb_keogh"] <= out.iloc[0]["dtw"] + 1e-9
