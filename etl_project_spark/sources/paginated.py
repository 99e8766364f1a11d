"""Paginated-table custom Python Data Source (Spark 4 DataSource API).

Re-expresses the reference's scraping scan (flows/etl.py:67-183) as a
first-class Spark source instead of driver-side imperative code:

| Reference step                      | file:line          | Here |
|-------------------------------------|--------------------|------|
| S1 remote session open + retry      | flows/etl.py:67-90 | per-partition connection in ``read()``; retries via ``spark.task.maxFailures`` |
| S2 header scan → schema discovery   | flows/etl.py:92-114| ``schema()`` asks the fetcher for page-0 headers at plan time |
| S3 cardinality probe                | flows/etl.py:134-135| fetcher reports ``total_rows`` → number of page partitions |
| S4 paginated columnar scan          | flows/etl.py:117-183| one ``InputPartition`` per page range; executors fetch pages in parallel |
| S5 in-source cell extraction        | flows/etl.py:149-159| the fetcher emits final strings (compute pushed into the source) |
| S6 batch materialize                | flows/etl.py:181   | rows yielded per page ≙ one Arrow batch per page |

The browser itself is NOT reproduced — fetching is pluggable via a
``PageFetcher``. The default :class:`SyntheticShopFetcher` is a
deterministic stand-in with the exact shape of the scraped data
(including the ``"lat,lng"`` / ``''`` / ``"No disponible"`` sentinel
convention of flows/etl.py:150-159), so the source is testable offline;
a Selenium/HTTP fetcher drops in without touching the Spark plumbing.

Scale design: pages are input partitions, so a 1000-executor cluster
fetches 1000 pages concurrently — bounded by ``max_concurrency``
(≙ the reference's 2-session browser cap, docker-compose.yml:100-101)
which caps the number of partitions each holding a contiguous page
range fetched sequentially (source-side politeness).
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


# -- pluggable page fetchers ------------------------------------------------

class PageFetcher:
    """Contract for a paginated tabular source.

    Implementations must be picklable (instantiated on the driver,
    shipped to executors inside partitions).
    """

    def headers(self) -> list[str]:
        """Column names (≙ `<th>` scan, flows/etl.py:109-110)."""
        raise NotImplementedError

    def total_rows(self) -> int:
        """Total record count (≙ regex probe, flows/etl.py:134-135)."""
        raise NotImplementedError

    def page_size(self) -> int:
        raise NotImplementedError

    def fetch_page(self, page: int) -> Sequence[tuple]:
        """Return the rows of one page, already extracted to strings."""
        raise NotImplementedError

    def refresh(self) -> None:
        """Invalidate any cached metadata (headers/total_rows).

        The streaming reader calls this once per trigger so a growing
        table's new pages are discovered; fetchers with no cache need
        not override.
        """


@dataclass
class SyntheticShopFetcher(PageFetcher):
    """Deterministic stand-in for the scraped shop table.

    Emits the same 4-column shape the reference scrapes (shop, address,
    locality, packed-coordinate) with the sentinel convention of
    flows/etl.py:150-159: ~70% packed ``"lat,lng"``, ~10% ``''``
    (regex miss), ~20% ``"No disponible"`` (no locate button).
    """

    n_rows: int = 1000
    rows_per_page: int = 100

    _HEADERS = ("Comercio", "Dirección", "Localidad", "Localizar")

    def headers(self) -> list[str]:
        return list(self._HEADERS)

    def total_rows(self) -> int:
        return self.n_rows

    def page_size(self) -> int:
        return self.rows_per_page

    def fetch_page(self, page: int) -> Sequence[tuple]:
        start = page * self.rows_per_page
        end = min(start + self.rows_per_page, self.n_rows)
        rows = []
        for i in range(start, end):
            h = (i * 2654435761) % 2**32  # Knuth multiplicative hash
            bucket = h % 10
            if bucket < 7:
                lat = round(-34.0 - (h % 1000) / 1000.0, 6)
                lng = round(-58.0 - (h % 997) / 997.0, 6)
                locate = f"{lat},{lng}"
            elif bucket < 8:
                locate = ""
            else:
                locate = "No disponible"
            rows.append(
                (
                    f"Shop {i:05d}",
                    f"Street {h % 5000} No. {h % 900 + 100}",
                    f"Locality {h % 50}",
                    locate,
                )
            )
        return rows


@dataclass
class HttpFetcher(PageFetcher):
    """Plain-HTTP JSON pagination — the non-synthetic fetcher (no
    browser; ≙ the reference's Selenium loop, flows/etl.py:117-183,
    for sites that expose the table as an endpoint).

    Endpoint contract (relative to ``base_url``):

    - ``GET {base_url}/meta``    → ``{"headers": [...], "total_rows": N,
      "page_size": M}`` (≙ S2 header scan + S3 cardinality probe)
    - ``GET {base_url}/page/{i}``→ JSON array of row-arrays for page i

    Only ``base_url`` ships to executors (picklable); metadata is
    fetched lazily and memoized per process — the driver hits ``/meta``
    once at plan time, each executor at most once. Per-request retry
    is deliberately left to Spark task retry (``spark.task.maxFailures``)
    — the whole page range replays, which is the correct unit for a
    re-scannable source.
    """

    base_url: str
    timeout_s: float = 10.0

    def _get_json(self, path: str):
        import json
        import urllib.request

        with urllib.request.urlopen(
            f"{self.base_url}{path}", timeout=self.timeout_s
        ) as resp:
            return json.load(resp)

    def _meta(self) -> dict:
        cached = getattr(self, "_meta_doc", None)
        if cached is None:
            cached = self._get_json("/meta")
            object.__setattr__(self, "_meta_doc", cached)
        return cached

    def refresh(self) -> None:
        # Drop the memoized /meta so the next total_rows() re-probes —
        # required by the streaming reader's growing-table contract.
        object.__setattr__(self, "_meta_doc", None)

    def headers(self) -> list[str]:
        return list(self._meta()["headers"])

    def total_rows(self) -> int:
        return int(self._meta()["total_rows"])

    def page_size(self) -> int:
        return int(self._meta()["page_size"])

    def fetch_page(self, page: int) -> Sequence[tuple]:
        return [tuple(row) for row in self._get_json(f"/page/{page}")]


@dataclass
class HtmlTableFetcher(PageFetcher):
    """HTML-table pagination with the reference's exact scraping
    semantics (flows/etl.py:92-183) — no browser, stdlib only:

    - **S2 header scan**: ``<th>`` texts, skipping the first
      ``skip_headers`` (the reference slices ``table_header[4:]``,
      flows/etl.py:110 — its DataTables widget prepends 4 control
      columns).
    - **S3 cardinality probe**: the DataTables info line (element id
      ``table_id_info``, e.g. ``"Mostrando 1 a 100 de 1.234
      registros"``) parsed with the reference's regex ``\\d[\\d\\.]*``,
      LAST match, dots-as-thousands stripped (flows/etl.py:134-135).
    - **S5 cell extraction**: for a cell carrying a ``boton_ir``
      locate button, the packed coordinate comes from the button's
      ``onclick`` via ``\\(([-+]?\\d+\\.\\d+),\\s*([-+]?\\d+\\.\\d+)``
      → ``"lat,lng"``, regex-miss → ``''`` (flows/etl.py:149-159);
      plain cells yield stripped text (so a literal ``No disponible``
      cell survives as the third sentinel).
    - **S4 pagination**: ``GET {base_url}?{page_param}={i}`` — the
      URL-addressable equivalent of the next-button loop
      (flows/etl.py:164-175); politeness is the partition-level
      ``max_concurrency`` cap, same as the reference's 2-session
      browser limit.
    """

    base_url: str
    page_param: str = "page"
    skip_headers: int = 4
    timeout_s: float = 10.0

    _COORD_RE = r"\(([-+]?\d+\.\d+),\s*([-+]?\d+\.\d+)"
    _COUNT_RE = r"\d[\d\.]*"

    def _get_html(self, page: int) -> str:
        import urllib.request

        sep = "&" if "?" in self.base_url else "?"
        url = f"{self.base_url}{sep}{self.page_param}={page}"
        with urllib.request.urlopen(url, timeout=self.timeout_s) as resp:
            return resp.read().decode("utf-8", errors="replace")

    def _parse(self, html: str) -> dict:
        """One-pass stdlib-parser extraction of headers, body rows, and
        the info line. Returns {"headers": [...], "rows": [[cell,...]],
        "info": str}."""
        import re as _re
        from html.parser import HTMLParser

        coord_re = _re.compile(self._COORD_RE)

        class _P(HTMLParser):
            def __init__(self):
                super().__init__()
                self.headers: list[str] = []
                self.rows: list[list[str]] = []
                self.info = ""
                self._stack: list[str] = []
                self._text: list[str] = []
                self._cell: str | None = None
                self._in_info = False
                self._in_tbody = False

            def handle_starttag(self, tag, attrs):
                a = dict(attrs)
                self._stack.append(tag)
                if tag == "th":
                    self._text = []
                elif tag == "tbody":
                    self._in_tbody = True
                elif tag == "tr" and self._in_tbody:
                    self.rows.append([])
                elif tag == "td":
                    self._text = []
                    self._cell = None
                elif a.get("id") == "table_id_info":
                    self._in_info = True
                    self._text = []
                elif "boton_ir" in (a.get("class") or ""):
                    # locate button: coordinate lives in onclick, not text
                    m = coord_re.search(a.get("onclick") or "")
                    self._cell = f"{m.group(1)},{m.group(2)}" if m else ""

            def handle_endtag(self, tag):
                while self._stack and self._stack.pop() != tag:
                    pass
                if tag == "th":
                    self.headers.append("".join(self._text).strip())
                elif tag == "tbody":
                    self._in_tbody = False
                elif tag == "td" and self.rows:
                    self.rows[-1].append(
                        self._cell
                        if self._cell is not None
                        else "".join(self._text).strip()
                    )
                elif tag == "div" and self._in_info:
                    self.info = "".join(self._text)
                    self._in_info = False

            def handle_data(self, data):
                self._text.append(data)

        p = _P()
        p.feed(html)
        return {"headers": p.headers, "rows": [r for r in p.rows if r], "info": p.info}

    def _page0(self) -> dict:
        cached = getattr(self, "_page0_doc", None)
        if cached is None:
            cached = self._parse(self._get_html(0))
            object.__setattr__(self, "_page0_doc", cached)
        return cached

    def refresh(self) -> None:
        object.__setattr__(self, "_page0_doc", None)

    def headers(self) -> list[str]:
        return self._page0()["headers"][self.skip_headers:]

    def total_rows(self) -> int:
        import re as _re

        nums = _re.findall(self._COUNT_RE, self._page0()["info"])
        if not nums:
            raise ValueError(
                "no record count in table_id_info: " + self._page0()["info"][:80]
            )
        return int(nums[-1].replace(".", ""))  # 1.234 → 1234 (es-AR grouping)

    def page_size(self) -> int:
        return max(1, len(self._page0()["rows"]))

    def fetch_page(self, page: int) -> Sequence[tuple]:
        doc = self._page0() if page == 0 else self._parse(self._get_html(page))
        width = len(self.headers())
        # The widget's 4 control columns precede the data columns in the
        # header row only; body rows carry just the data cells.
        out = []
        for i, r in enumerate(doc["rows"]):
            if len(r) < width:
                # A short tuple would surface pages later as an opaque
                # arity mismatch in the Arrow reader (ADVICE r7) — name
                # the page and row at the parse site instead.
                raise ValueError(
                    f"malformed table row: page {page} row {i} has "
                    f"{len(r)} cells, expected at least {width} "
                    f"(headers: {self.headers()})"
                )
            out.append(tuple(r[-width:]))
        return out


# -- the data source --------------------------------------------------------

class _PageRangePartition(InputPartition):
    def __init__(self, fetcher: PageFetcher, first_page: int, last_page: int):
        self.fetcher = fetcher
        self.first_page = first_page
        self.last_page = last_page  # inclusive


class PaginatedTableReader(DataSourceReader):
    def __init__(self, fetcher: PageFetcher, max_concurrency: int):
        self.fetcher = fetcher
        self.max_concurrency = max_concurrency

    def partitions(self) -> Sequence[InputPartition]:
        n_pages = max(1, math.ceil(self.fetcher.total_rows() / self.fetcher.page_size()))
        n_parts = min(self.max_concurrency, n_pages)
        pages_per_part = math.ceil(n_pages / n_parts)
        return [
            _PageRangePartition(
                self.fetcher, first, min(first + pages_per_part - 1, n_pages - 1)
            )
            for first in range(0, n_pages, pages_per_part)
        ]

    def read(self, partition: _PageRangePartition) -> Iterator[tuple]:
        # One connection per partition, pages fetched sequentially within
        # it (politeness); task retry re-reads the whole range, which is
        # safe because fetch_page is required to be deterministic-ish
        # per page (same contract as any re-scannable source).
        for page in range(partition.first_page, partition.last_page + 1):
            yield from partition.fetcher.fetch_page(page)


class PaginatedStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch streaming over the same page protocol: offset = next
    unread page; each trigger consumes up to ``pages_per_trigger``.

    The batch scan treats the table as finished; the stream treats it
    as growing — new pages appear as new micro-batches, which is how a
    live paginated endpoint (append-only listing, audit log, export
    API) is actually consumed. Exhausted ⇒ empty batch at the same
    offset (no busy spin); Spark checkpoints the page offset, so
    restart resumes exactly where the last commit left off.
    """

    def __init__(self, fetcher: PageFetcher, pages_per_trigger: int):
        self.fetcher = fetcher
        self.pages_per_trigger = pages_per_trigger

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict):
        first = int(start["page"])
        self.fetcher.refresh()  # growing table: re-probe the page count
        n_pages = max(
            1, math.ceil(self.fetcher.total_rows() / self.fetcher.page_size())
        )
        # Never move the offset BACKWARD: a refresh may transiently
        # report fewer total rows than already committed (server
        # restart, eventually-consistent listing) — regressing would
        # re-emit committed pages as duplicates on later triggers.
        last = max(first, min(first + self.pages_per_trigger, n_pages))
        rows: list[tuple] = []
        for page in range(first, last):  # empty when n_pages <= first
            rows.extend(self.fetcher.fetch_page(page))
        return iter(rows), {"page": last}

    def readBetweenOffsets(self, start: dict, end: dict):
        # Replay for recovery: deterministic pages make this exact.
        rows: list[tuple] = []
        for page in range(int(start["page"]), int(end["page"])):
            rows.extend(self.fetcher.fetch_page(page))
        return iter(rows)


class PaginatedTableDataSource(DataSource):
    """``spark.read.format("paginated_table")`` — options:

    - ``base_url``: if set, pages come from :class:`HttpFetcher`'s JSON
      endpoint contract; otherwise the synthetic fetcher is used
    - ``n_rows`` / ``rows_per_page``: synthetic fetcher sizing
    - ``max_concurrency``: partition cap (≙ SE_NODE_MAX_SESSIONS)
    """

    @classmethod
    def name(cls) -> str:
        return "paginated_table"

    def _fetcher(self) -> PageFetcher:
        base_url = self.options.get("base_url")
        if base_url and self.options.get("format", "json") == "html":
            return HtmlTableFetcher(
                base_url=base_url,
                page_param=self.options.get("page_param", "page"),
                skip_headers=int(self.options.get("skip_headers", 4)),
            )
        if base_url:
            return HttpFetcher(base_url=base_url)
        return SyntheticShopFetcher(
            n_rows=int(self.options.get("n_rows", 1000)),
            rows_per_page=int(self.options.get("rows_per_page", 100)),
        )

    def schema(self) -> StructType:
        schema = StructType()
        for h in self._fetcher().headers():
            schema = schema.add(h, "string")
        return schema

    def reader(self, schema: StructType) -> DataSourceReader:
        return PaginatedTableReader(
            self._fetcher(), int(self.options.get("max_concurrency", 8))
        )

    def simpleStreamReader(self, schema: StructType) -> PaginatedStreamReader:
        return PaginatedStreamReader(
            self._fetcher(), int(self.options.get("pages_per_trigger", 1))
        )


def register_paginated_source(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(PaginatedTableDataSource)
