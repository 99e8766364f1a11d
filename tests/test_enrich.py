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


def _geocode_server():
    """Live fixture geocoder: GoogleV3-shaped JSON over real HTTP, with
    per-query scripted failure modes (same harness pattern as the
    HtmlTableFetcher tests in test_sources_sinks.py)."""
    import http.server
    import json
    import threading
    from urllib.parse import parse_qs, urlparse

    calls: dict[str, int] = {}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            q = parse_qs(urlparse(self.path).query).get("q", [""])[0]
            calls[q] = calls.get(q, 0) + 1
            if q == "nowhere":
                self.send_error(404)
                return
            if q.startswith("flaky") and calls[q] == 1:
                self.send_error(503)  # transient: retried per-row
                return
            if q == "empty":
                payload = {"results": []}
            else:
                h = sum(q.encode())
                payload = {
                    "results": [
                        {
                            "geometry": {
                                "location": {
                                    "lat": round(h % 180 - 90 + 0.25, 2),
                                    "lng": round(h % 360 - 180 + 0.5, 2),
                                }
                            }
                        }
                    ]
                }
            raw = json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, calls


def test_http_geocoder_end_to_end_over_real_http(spark):
    """The last T6 seam (round-7 verdict §missing #1): enrichment through
    a REAL http client against a live server — executor-side urllib
    calls, per-row retry on 503, 404 and empty-results as definitive
    misses, packed 'lat,lng' writeback, guard passthrough intact."""
    from etl_project_spark.operators.enrich import HttpGeocoder

    srv, calls = _geocode_server()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/geocode"
        df = _df(
            spark,
            [
                (1, "Plaza Central 123", True),
                (2, "flaky-street 9", True),   # 503 first, then 200
                (3, "nowhere", True),          # 404 → NULL, no retry
                (4, "empty", True),            # zero results → NULL
                (5, "skipped", False),         # guard False → no call
            ],
        ).repartition(2)
        out = {
            r.id: r.geo
            for r in enrich_with_service(
                df, "q", "geo", HttpGeocoder(url, timeout_s=5.0),
                guard_col="needs", max_attempts=3, sleep=lambda s: None,
            ).collect()
        }
        h = sum(b"Plaza Central 123")
        want = f"{round(h % 180 - 90 + 0.25, 2)},{round(h % 360 - 180 + 0.5, 2)}"
        assert out[1] == want
        assert out[2] is not None          # transient 503 recovered by retry
        assert calls["flaky-street 9"] == 2  # exactly one retry over the wire
        assert out[3] is None and calls["nowhere"] == 1  # miss, not retried
        assert out[4] is None
        assert out[5] is None and "skipped" not in calls  # guard short-circuit
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_geocoder_flat_response_shape():
    """Unit: the client accepts the flat {'lat','lng'} body too, and
    treats coordinate-less JSON as a definitive miss."""
    import http.server
    import json
    import threading
    from urllib.parse import parse_qs, urlparse

    from etl_project_spark.operators.enrich import HttpGeocoder

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            q = parse_qs(urlparse(self.path).query).get("q", [""])[0]
            body = {"lat": -34.6, "lng": -58.4} if q == "bsas" else {"status": "?" }
            raw = json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        geo = HttpGeocoder(f"http://127.0.0.1:{srv.server_address[1]}/g")
        assert geo("bsas") == "-34.6,-58.4"
        assert geo("???") is None
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_geocoder_definitive_client_errors_fail_fast():
    """401/403/400 raise GeocoderConfigError through the retry loop
    (one surface, zero backoffs); 404 stays a definitive miss; 429
    stays retryable."""
    import http.server
    import threading
    from urllib.parse import parse_qs, urlparse

    import pytest as _pytest

    from etl_project_spark.operators.enrich import (
        GeocoderConfigError,
        HttpGeocoder,
        _call_with_retry,
    )

    hits = {"n": 0}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            hits["n"] += 1
            q = parse_qs(urlparse(self.path).query).get("q", [""])[0]
            code = {"badkey": 401, "forbidden": 403, "bad": 400,
                    "missing": 404, "ratelimited": 429}.get(q, 500)
            self.send_response(code)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        geo = HttpGeocoder(f"http://127.0.0.1:{srv.server_address[1]}/g")
        for q in ("badkey", "forbidden", "bad"):
            hits["n"] = 0
            with _pytest.raises(GeocoderConfigError):
                _call_with_retry(geo, q, 5, 0.0, lambda s: None)
            assert hits["n"] == 1  # exactly one request, no retries
        assert geo("missing") is None  # 404: miss, no exception
        hits["n"] = 0
        assert _call_with_retry(geo, "ratelimited", 3, 0.0, lambda s: None) is None
        assert hits["n"] == 3  # 429 burned the whole retry budget
    finally:
        srv.shutdown()
        srv.server_close()
