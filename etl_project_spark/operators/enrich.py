"""External-service enrichment operator (retrying, Arrow-batched).

≙ T6, the reference's only UDF-like construct (flows/etl.py:186-242):
rows whose ``Localizar`` column holds the sentinel ``"No disponible"``
are geocoded via an external API with timeout/backoff retry, and the
result is written back as a packed ``"lat,lng"`` string.

Spark-first redesign:
- ``mapInPandas`` over Arrow batches — external calls are batched per
  partition, not issued from a driver-side row loop.
- The service is **pluggable**: a pure deterministic function for
  tests/oracle parity, an HTTP client in production. The operator
  plumbing (guard, retry, writeback) is identical either way.
- Retry budget is **per row** with exponential backoff — the reference
  initializes its ``attempt`` counter once outside the row loop
  (flows/etl.py:201), silently sharing one budget across all rows; we
  deliberately do NOT replicate that bug.
- Failures after exhaustion yield NULL (≙ the reference's ``None``
  writeback at flows/etl.py:212,239) and optionally a rate cap guards
  the external service per partition.

At 100 TB scale: enrichment typically touches a small guarded subset —
the guard is evaluated JVM-side and unguarded rows carry a NULL query,
so they pay only Arrow transfer, never a service call. If the guarded
fraction is tiny and the table is wide, filter-enrich-union beats the
single pass; this operator keeps the reference's single-pass semantics
(all rows flow through, T4's conditional projection).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField

#: service(query: str) -> result string or None; raising = transient failure.
ServiceFn = Callable[[str], Any]


class GeocoderConfigError(RuntimeError):
    """Definitive client-side failure (bad key, malformed URL): raised
    through the retry loop unretried so a config error surfaces once
    instead of costing ``max_attempts`` backoffs on every corpus row."""


def deterministic_geocoder(query: str) -> str:
    """Pure stand-in geocoder: derives stable pseudo-coordinates from the
    md5 of the query text. Mirrorable in ANSI SQL —
    ``CAST('0x' || substr(md5(q),1,8) AS BIGINT)`` then the same modular
    arithmetic — so enrichment plans stay oracle-checkable end to end.
    """
    import hashlib

    h = int(hashlib.md5(query.encode("utf-8")).hexdigest()[:8], 16)
    lat = round(h % 18000 / 100.0 - 90.0, 2)
    lng = round(h % 36000 / 100.0 - 180.0, 2)
    return f"{lat},{lng}"


class HttpGeocoder:
    """Production HTTP geocoder client for :func:`enrich_with_service`.

    ≙ the reference's geopy ``GoogleV3`` client (flows/etl.py:198,218),
    re-expressed stdlib-only (urllib — this container ships no HTTP
    libraries), and shaped for the operator's per-row retry contract:

    - the instance is a picklable plain-attribute callable, so it ships
      inside the ``mapInPandas`` closure to every executor; each call
      opens its own connection (no shared socket state across Arrow
      batches or Spark task retries);
    - request: ``GET {base_url}?q=<urlencoded query>`` with a hard
      per-request ``timeout_s`` (≙ the reference's ``timeout=10``);
    - response: JSON, either the flat ``{"lat": .., "lng": ..}`` shape
      or the GoogleV3 envelope
      ``{"results": [{"geometry": {"location": {"lat","lng"}}}]}``;
    - a definitive miss — HTTP 404, empty ``results``, JSON without
      coordinates — returns ``None`` (no retry, ≙ the reference's
      AttributeError writeback path at flows/etl.py:231-234);
    - transient trouble — network error, timeout, 5xx/429 — RAISES, so
      :func:`_call_with_retry` drives the per-row exponential backoff
      exactly as it does for every other service.

    The result is packed ``"lat,lng"`` (the reference's writeback
    format, flows/etl.py:210) with the server's own precision.
    """

    def __init__(
        self,
        base_url: str,
        *,
        query_param: str = "q",
        timeout_s: float = 10.0,
        headers: dict[str, str] | None = None,
    ) -> None:
        self.base_url = base_url
        self.query_param = query_param
        self.timeout_s = timeout_s
        self.headers = dict(headers or {})

    def __call__(self, query: str) -> str | None:
        import json
        import urllib.error
        import urllib.parse
        import urllib.request

        sep = "&" if "?" in self.base_url else "?"
        url = (
            f"{self.base_url}{sep}"
            f"{urllib.parse.urlencode({self.query_param: query})}"
        )
        req = urllib.request.Request(url, headers=self.headers)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                payload = json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None  # definitive miss — do not retry
            # Definitive client errors (ADVICE r8): a bad API key (401/
            # 403) or malformed request (400 etc.) fails identically on
            # every attempt — burning the exponential-backoff budget on
            # every row of the corpus hides a config error behind
            # max_attempts × rows retries. Only 408 (server timeout)
            # and 429 (rate limit) are retryable client codes.
            if 400 <= e.code < 500 and e.code not in (408, 429):
                raise GeocoderConfigError(
                    f"geocoder returned definitive client error {e.code} "
                    f"for {self.base_url!r} — not retrying"
                ) from e
            raise  # 5xx / 429 / 408 / network: transient, retried
        loc = payload
        if isinstance(payload, dict) and "results" in payload:
            results = payload["results"]
            if not results:
                return None
            loc = results[0].get("geometry", {}).get("location", {})
        if not isinstance(loc, dict) or "lat" not in loc or "lng" not in loc:
            return None
        return f"{loc['lat']},{loc['lng']}"


def enrich_with_service(
    df: DataFrame,
    query_col: str,
    out_col: str,
    service: ServiceFn = deterministic_geocoder,
    *,
    guard_col: str | None = None,
    max_attempts: int = 5,
    base_timeout_s: float = 2.0,
    sleep: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """Enrich guarded rows by calling ``service`` on ``query_col``.

    - ``guard_col``: boolean column name; only True rows are enriched,
      others get NULL in ``out_col`` (≙ the ``== 'No disponible'``
      guard, flows/etl.py:206-208). None = enrich all rows.
    - Retry: per-row budget of ``max_attempts``, backoff doubling from
      ``base_timeout_s`` (≙ flows/etl.py:201-203,215-237, with the
      shared-budget bug fixed).
    - A service call raising an exception counts as a transient failure
      and is retried; returning None is a definitive miss (no retry,
      ≙ the AttributeError path at flows/etl.py:231-234).
    """
    guard = F.col(guard_col) if guard_col else F.lit(True)
    base = df.withColumn("__enrich_query", F.when(guard, F.col(query_col)))
    out_schema = _schema_with(base.schema, out_col)

    def run_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            results: list[str | None] = []
            for q in pdf["__enrich_query"]:
                if q is None or (isinstance(q, float) and pd.isna(q)):
                    results.append(None)
                    continue
                results.append(_call_with_retry(service, q, max_attempts, base_timeout_s, sleep))
            pdf = pdf.copy()
            pdf[out_col] = pd.array(results, dtype=object)
            yield pdf

    enriched = base.mapInPandas(run_batches, schema=out_schema)
    return enriched.drop("__enrich_query")


def _call_with_retry(
    service: ServiceFn,
    query: str,
    max_attempts: int,
    base_timeout_s: float,
    sleep: Callable[[float], None],
) -> str | None:
    """Per-row retry with exponential backoff. NULL on exhaustion/miss."""
    timeout = base_timeout_s
    for attempt in range(max_attempts):
        try:
            result = service(query)
        except GeocoderConfigError:
            raise  # definitive config error: surface ONCE, never retry
        except Exception:
            if attempt == max_attempts - 1:
                return None
            sleep(timeout)
            timeout *= 2  # ≙ flows/etl.py:236 doubling
            continue
        return None if result is None else str(result)
    return None


def _schema_with(schema, out_col: str):
    """Input schema + the enrichment output column (string)."""
    from pyspark.sql.types import StructType

    return StructType(list(schema.fields) + [StructField(out_col, StringType())])
