"""Cleaning / normalization helpers.

The reference models missing data as sentinel strings — ``"No
disponible"`` when the source had no locate button, ``''`` on a regex
miss (flows/etl.py:150-159) — and packs coordinates as a ``"lat,lng"``
string (flows/etl.py:154,219). Spark-first, those become real NULLs and
typed columns at the ingestion edge ("schema-on-read, cast early",
SURVEY.md §1.2). All helpers are pure column expressions: they compile
into the same Catalyst plan as hand-written selects, cost no Python in
the hot path, and scale with the scan.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Sentinels used by the reference scrape (flows/etl.py:150-159, :208).
DEFAULT_SENTINELS = ("No disponible", "")


def nullify_sentinels(
    df: DataFrame,
    cols: Iterable[str],
    sentinels: Iterable[str] = DEFAULT_SENTINELS,
) -> DataFrame:
    """Replace sentinel strings with real NULL in the given columns.

    ≙ the implicit missing-value convention at flows/etl.py:150-159;
    here it becomes an explicit, tested edge transform.
    """
    sentinels = list(sentinels)
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.when(F.trim(F.col(c)).isin(sentinels), F.lit(None)).otherwise(F.col(c))
        )
    return out


def split_latlng(packed: Column | str) -> tuple[Column, Column]:
    """Unpack a ``"lat,lng"`` string into two double columns.

    ≙ the packed-coordinate format produced at flows/etl.py:154,219.
    Returns NULL doubles for NULL/malformed input rather than raising.
    """
    col = F.col(packed) if isinstance(packed, str) else packed
    lat = F.regexp_extract(col, r"^\s*([-+]?\d+(?:\.\d+)?)\s*,", 1)
    lng = F.regexp_extract(col, r",\s*([-+]?\d+(?:\.\d+)?)\s*$", 1)
    # regexp_extract yields '' on miss; nullif before cast so a miss is
    # NULL, not a cast failure.
    return (
        F.nullif(lat, F.lit("")).cast("double"),
        F.nullif(lng, F.lit("")).cast("double"),
    )


def cast_columns(df: DataFrame, casts: Mapping[str, str]) -> DataFrame:
    """Apply ``{col: type}`` casts in one projection (cast-early edge step)."""
    return df.withColumns({c: F.col(c).cast(t) for c, t in casts.items()})
