"""Unit tests for the retrying enrichment operator — the failure modes
visible in the reference (SURVEY.md §5.5): retry exhaustion, definitive
miss, per-row (not shared) retry budget, guard passthrough.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_project_spark.operators.enrich import (
    deterministic_geocoder,
    enrich_with_service,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, q string, needs boolean")


def test_guarded_rows_enriched_others_null(spark):
    df = _df(spark, [(1, "a", True), (2, "b", False), (3, None, True)])
    out = {
        r.id: r.geo
        for r in enrich_with_service(df, "q", "geo", guard_col="needs").collect()
    }
    assert out[1] == deterministic_geocoder("a")
    assert out[2] is None  # guard False → never called
    assert out[3] is None  # NULL query → never called


def test_transient_failures_retry_per_row(spark):
    """Each row gets its own retry budget (the reference shares one
    counter across rows — flows/etl.py:201 — which this fixes): with
    a service failing twice per distinct query, every row must still
    succeed, which is impossible under a shared budget of 5.
    """
    rows = [(i, f"q{i}", True) for i in range(10)]
    df = _df(spark, rows).repartition(1)

    class Flaky:
        def __init__(self):
            self.fails: dict[str, int] = {}

        def __call__(self, q: str) -> str:
            n = self.fails.get(q, 0)
            if n < 2:
                self.fails[q] = n + 1
                raise TimeoutError("transient")
            return f"ok:{q}"

    out = enrich_with_service(
        df, "q", "geo", Flaky(), guard_col="needs",
        max_attempts=3, sleep=lambda s: None,
    ).collect()
    assert all(r.geo == f"ok:q{r.id}" for r in out)


def test_retry_exhaustion_yields_null(spark):
    df = _df(spark, [(1, "always-fails", True)])

    def broken(q: str) -> str:
        raise ConnectionError("down")

    out = enrich_with_service(
        df, "q", "geo", broken, guard_col="needs",
        max_attempts=3, sleep=lambda s: None,
    ).collect()
    assert out[0].geo is None


def test_definitive_miss_not_retried(spark):
    df = _df(spark, [(1, "nowhere", True)])
    calls = []

    def misser(q: str):
        calls.append(q)
        return None

    out = enrich_with_service(
        df, "q", "geo", misser, guard_col="needs", sleep=lambda s: None
    ).collect()
    assert out[0].geo is None


def test_schema_preserved_plus_out_col(spark):
    df = _df(spark, [(1, "a", True)])
    out = enrich_with_service(df, "q", "geo", guard_col="needs")
    assert [f.name for f in out.schema.fields] == ["id", "q", "needs", "geo"]
