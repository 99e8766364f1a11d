"""Record linkage and spatial joins: Jaro-Winkler blocked matching,
sorted-neighborhood dedup, grid-bucketed spatial radius join, and
co-occurrence graphs.

Entity resolution at 100 TB is a blocking problem: never score the
cross product, only candidates that share a cheap key (a token block, a
sort neighborhood, a grid cell). Each query here demonstrates one
blocking strategy; the scorer (Jaro-Winkler / Levenshtein / haversine)
runs only inside blocks.
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from etl_project_spark.catalog import read_table
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return read_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Jaro-Winkler, vectorized. Spark has no builtin, so this is the
# one sanctioned Python path: an Arrow-batched pandas UDF applied only
# AFTER blocking has cut candidates to shared-token pairs. The
# implementation mirrors the canonical definition (match window
# max(|a|,|b|)/2 - 1, transpositions halved, prefix boost 0.1·min(4,ℓ)
# applied above jaro 0.7) and is verified bit-identical to DuckDB's
# jaro_winkler_similarity in tests.
# --------------------------------------------------------------------------
def _jaro(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    # DuckDB convention: any empty side scores 0.0, even "" vs ""
    if l1 == 0 or l2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i in range(l1):
        for j in range(max(0, i - md), min(l2, i + md + 1)):
            if not m2[j] and s1[i] == s2[j]:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1, boost: float = 0.7) -> float:
    """Scalar Jaro-Winkler similarity (same contract as DuckDB's)."""
    j = _jaro(s1, s2)
    if j <= boost:
        return j
    pl = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        pl += 1
    return j + pl * p * (1.0 - j)


@pandas_udf(DoubleType())
def _jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([jaro_winkler(x, y) for x, y in zip(a, b)])


@register(
    "q_jaro_winkler_part_pairs",
    oracle="""
WITH canon AS (
  SELECT p_name, MIN(p_partkey) AS p_partkey FROM part GROUP BY p_name
),
toks AS (
  SELECT p_partkey, p_name, SPLIT_PART(p_name, ' ', 2) AS block
  FROM canon
)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
FROM toks a JOIN toks b
  ON a.block = b.block AND a.p_partkey < b.p_partkey
WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.92
""",
    tags=("linkage", "jaro-winkler", "blocking"),
)
def q_jaro_winkler_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names by Jaro-Winkler ≥ 0.92, blocked on the
    noun token.

    Exact duplicates canonicalize first (name → min partkey) so the
    pair count tracks DISTINCT names, not copies — otherwise a name
    with k copies emits C(k,2) trivial pairs and the output grows
    quadratically with SF. Blocking (equi-join on the shared second
    word) then keeps the quadratic scorer inside blocks — the UDF sees
    |block|² pairs, not |names|². At 100 TB the block key generalizes
    to any cheap canonical token; skewed blocks get the salting
    treatment of q_salted_skew_join.
    """
    p = (
        _t(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.min("p_partkey").alias("p_partkey"))
        .select(
            "p_partkey",
            "p_name",
            F.split_part("p_name", F.lit(" "), F.lit(2)).alias("block"),
        )
    )
    a = p.alias("a")
    b = p.alias("b")
    pairs = a.join(
        b,
        (F.col("a.block") == F.col("b.block"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    ).select(
        F.col("a.p_partkey").alias("key_a"),
        F.col("b.p_partkey").alias("key_b"),
        _jw_udf(F.col("a.p_name"), F.col("b.p_name")).alias("jw_raw"),
    )
    return pairs.where(F.col("jw_raw") >= 0.92).select(
        "key_a", "key_b", F.round("jw_raw", 6).alias("jw")
    )


# --------------------------------------------------------------------------
# Sorted-neighborhood method (SNM): sort once on a blocking key, then
# compare each record only to its w successors — pairs via LEAD, no
# self-join at all. Spark's sort is range-partitioned (distributed
# TimSort); the window stays within partitions of the blocking key's
# first character, so no single global reducer. Pure JVM (levenshtein
# builtin), zero Python.
# --------------------------------------------------------------------------
_SNM_WINDOW = 3


@register(
    "q_sorted_neighborhood_pairs",
    oracle="""
WITH canon AS (
  SELECT p_name, MIN(p_partkey) AS p_partkey FROM part GROUP BY p_name
),
s AS (
  SELECT p_partkey, p_name, SUBSTR(p_name, 1, 1) AS blk
  FROM canon
),
led AS (
  SELECT p_partkey, p_name,
         LEAD(p_partkey, 1) OVER w AS k1, LEAD(p_name, 1) OVER w AS n1,
         LEAD(p_partkey, 2) OVER w AS k2, LEAD(p_name, 2) OVER w AS n2,
         LEAD(p_partkey, 3) OVER w AS k3, LEAD(p_name, 3) OVER w AS n3
  FROM s
  WINDOW w AS (PARTITION BY blk ORDER BY p_name, p_partkey)
),
nbr AS (
  SELECT p_partkey, p_name, k1 AS nbr_key, n1 AS nbr_name FROM led
  UNION ALL SELECT p_partkey, p_name, k2, n2 FROM led
  UNION ALL SELECT p_partkey, p_name, k3, n3 FROM led
)
SELECT p_partkey AS key_a, nbr_key AS key_b,
       CAST(levenshtein(p_name, nbr_name) AS INTEGER) AS edit_dist
FROM nbr
WHERE nbr_key IS NOT NULL AND levenshtein(p_name, nbr_name) <= 4
""",
    tags=("linkage", "snm", "window"),
)
def q_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood candidate pairs: sort distinct part names,
    compare each to its next 3 neighbors, keep edit distance ≤ 4.

    Exact-duplicate names canonicalize to their min partkey first
    (same contract as the Jaro-Winkler query). The multi-offset LEAD
    trick turns the sliding window into w window columns instead of a
    rn-range self-join — one sort, no join, and the comparator runs
    exactly w·n times.
    """
    p = (
        _t(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.min("p_partkey").alias("p_partkey"))
        .select("p_partkey", "p_name", F.substring("p_name", 1, 1).alias("blk"))
    )
    w = W.partitionBy("blk").orderBy("p_name", "p_partkey")
    cols = []
    for k in range(1, _SNM_WINDOW + 1):
        cols.append(
            F.struct(
                F.lead("p_partkey", k).over(w).alias("nbr_key"),
                F.lead("p_name", k).over(w).alias("nbr_name"),
            ).alias(f"n{k}")
        )
    nbr = (
        p.select("p_partkey", "p_name", *cols)
        .select(
            "p_partkey",
            "p_name",
            F.explode(F.array(*[f"n{k}" for k in range(1, _SNM_WINDOW + 1)])).alias("n"),
        )
        .select(
            F.col("p_partkey").alias("key_a"),
            F.col("p_name").alias("name_a"),
            F.col("n.nbr_key").alias("key_b"),
            F.col("n.nbr_name").alias("nbr_name"),
        )
        .where(F.col("key_b").isNotNull())
    )
    return nbr.withColumn(
        "edit_dist", F.levenshtein("name_a", "nbr_name")
    ).where(F.col("edit_dist") <= 4).select("key_a", "key_b", "edit_dist")


# --------------------------------------------------------------------------
# Spatial radius join via grid bucketing: the geo analogue of LSH.
# Deterministic md5-derived coordinates (same derivation contract as
# the geocoding enrichment, replayable in SQL) place customers and
# suppliers in a 20°×20° region; 0.5° grid cells + a 3×3 neighbor
# explode turn "within 40 km" into an equi-join. Complete by
# construction: 40 km spans < 1 cell in both axes everywhere in the
# region (lat: 0.36°; lng at |lat|max=40°: 0.47° — both < 0.5°, so
# points ≥ 2 cells apart are > 40 km). The exact haversine runs only
# on co-celled candidates — never a cross join.
# --------------------------------------------------------------------------
_GEO_EARTH_KM = 6371.0
_GEO_RADIUS_KM = 40.0

#: Synthetic coordinate bases (``coord = md5-hash % 2000 / 100 - base``,
#: so lat ∈ [-_GEO_LAT_BASE, -_GEO_LAT_BASE + 19.99]). The bounding-box
#: prescreen's Δlng rejection threshold leans on cos(max |lat|) — these
#: constants exist so the Spark plan, and the import-time losslessness
#: check below, share ONE definition of that extent (ADVICE r14: the
#: old literal 40.0 sat silently at the exact edge of the cos bound).
_GEO_LAT_BASE = 40.0
_GEO_LNG_BASE = 60.0

#: Bounding-box prescreen rejection thresholds (degrees): pairs with
#: |Δlat| ≥ _PRESCREEN_DLAT_DEG or |Δlng| ≥ _PRESCREEN_DLNG_DEG skip
#: the haversine because they cannot pass round(km, 3) ≤ 40.0.
_PRESCREEN_DLAT_DEG = 0.3599
_PRESCREEN_DLNG_DEG = 0.4698


def _assert_prescreen_lossless() -> None:
    """Import-time proof that the prescreen thresholds reject ONLY
    pairs the km ≤ 40 filter rejects anyway, GIVEN the generator's
    coordinate range (ADVICE r14: change _GEO_LAT_BASE and the old
    hard-coded thresholds silently turned lossy — now that change
    fails the import instead). Worst cases are exact: Δlat alone is
    latitude-independent; Δlng alone is weakest where cos(lat) is
    smallest, i.e. both points at the generator's extreme |lat| =
    _GEO_LAT_BASE. round(km, 3) ≤ 40.0 accepts up to 40.0005, so the
    thresholds must map to strictly more than that."""
    import math

    accept_edge = _GEO_RADIUS_KM + 0.0005
    km_dlat = (
        2.0
        * _GEO_EARTH_KM
        * math.asin(math.sin(math.radians(_PRESCREEN_DLAT_DEG) / 2.0))
    )
    worst_cos = math.cos(math.radians(_GEO_LAT_BASE))
    km_dlng = (
        2.0
        * _GEO_EARTH_KM
        * math.asin(worst_cos * math.sin(math.radians(_PRESCREEN_DLNG_DEG) / 2.0))
    )
    if km_dlat <= accept_edge or km_dlng <= accept_edge:
        raise AssertionError(
            "spatial prescreen no longer lossless for the generator's "
            f"coordinate range: Δlat {_PRESCREEN_DLAT_DEG}° ⇒ {km_dlat:.4f} km, "
            f"Δlng {_PRESCREEN_DLNG_DEG}° ⇒ {km_dlng:.4f} km at |lat| ≤ "
            f"{_GEO_LAT_BASE}°, acceptance edge {accept_edge} km — widen the "
            "thresholds or re-derive them before shipping"
        )


_assert_prescreen_lossless()


def _coord_sql(key: str, off: int, base: str) -> str:
    h = f"CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR) || '/geo'), {off}, 8)) AS BIGINT)"
    return f"ROUND({h} % 2000 / 100.0 - {base}, 2)"


def _coord_spark(key, off: int, base: float):
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit("/geo"))), off, 8), 16, 10
    ).cast("long")
    return F.round(h % 2000 / 100.0 - base, 2)


_HAV_SQL = """
ROUND(2.0 * {R} * ASIN(SQRT(
    SIN(RADIANS(c_lat - s_lat) / 2.0) * SIN(RADIANS(c_lat - s_lat) / 2.0)
  + COS(RADIANS(s_lat)) * COS(RADIANS(c_lat))
    * SIN(RADIANS(c_lng - s_lng) / 2.0) * SIN(RADIANS(c_lng - s_lng) / 2.0)
)), 3)
""".replace("{R}", str(_GEO_EARTH_KM))


def _spatial_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-radius (customer, supplier) pairs with the customer
    coordinates still attached — shared candidate generation for the
    whole spatial family (raw list, nearest-k, cell profile)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        _coord_spark(F.col("c_custkey"), 1, _GEO_LAT_BASE).alias("c_lat"),
        _coord_spark(F.col("c_custkey"), 9, _GEO_LNG_BASE).alias("c_lng"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _coord_spark(F.col("s_suppkey"), 1, _GEO_LAT_BASE).alias("s_lat"),
        _coord_spark(F.col("s_suppkey"), 9, _GEO_LNG_BASE).alias("s_lng"),
    )
    # 0.5° cells (round-8; was 1°): the grid is a LOSSLESS candidate
    # filter — any complete cell size yields the identical ≤40 km pair
    # set, so the oracle (which replays the 1° rule) is untouched —
    # and 40 km needs only 0.36° lat / 0.469° lng at |lat| ≤ 40°, so
    # half-degree cells with the same 3×3 neighborhood stay complete
    # (cells ≥ 2 apart are > 42.6 km separated) while the searched
    # area per customer drops 9 deg² → 2.25 deg²: ~4× fewer haversine
    # candidates at every point density. Cell ids are FLOOR(2·coord)
    # — still an integer equi-join key.
    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    s9 = (
        s.withColumn("dlat", off)
        .withColumn("dlng", off)
        .select(
            "s_suppkey",
            "s_lat",
            "s_lng",
            (F.floor(F.col("s_lat") * 2) + F.col("dlat")).alias("cell_lat"),
            (F.floor(F.col("s_lng") * 2) + F.col("dlng")).alias("cell_lng"),
        )
    )
    cc = c.withColumn("cell_lat", F.floor(F.col("c_lat") * 2)).withColumn(
        "cell_lng", F.floor(F.col("c_lng") * 2)
    )
    # NO static broadcast hint (round-9): rounds ≤8 hinted F.broadcast
    # on the 9×-exploded supplier side, the same ungated-broadcast
    # class q_benchmark_contamination shed in round 8 — at 100×
    # supplier density a 9× explode is an OOM-class build side. AQE
    # decides from exact runtime shuffle stats instead: a small s9
    # still converts to broadcast; a big one stays a shuffle join
    # keyed on the cell, which is also the skew-salting shape the
    # docstring names for dense cells.
    joined = cc.join(s9, ["cell_lat", "cell_lng"])
    # Lossless bounding-box prescreen BEFORE the trig (r14): the grid
    # join's 3×3 neighborhood admits candidates up to ~1° away, but
    # haversine ≥ 111.195 km/° · |Δlat| everywhere and ≥ 85.1 km/° ·
    # |Δlng| at |lat| ≤ 40° (this region's extreme, cos 40° = 0.766),
    # so |Δlat| ≥ 0.3599° ⇒ km ≥ 40.02 and |Δlng| ≥ 0.4698° ⇒ km ≥
    # 40.01 — both beyond the round(km,3) ≤ 40.0 acceptance slack
    # (40.0005) with ≥ 10 m margin. ~68 % of candidates skip the
    # sin/cos/asin entirely (the box is 0.72×0.94 deg² of the 2.25 deg²
    # searched); the oracle keeps the plain haversine, which returns
    # the identical pair set because the prescreen rejects only pairs
    # the km filter rejects anyway.
    joined = joined.where(
        (F.abs(F.col("c_lat") - F.col("s_lat")) < _PRESCREEN_DLAT_DEG)
        & (F.abs(F.col("c_lng") - F.col("s_lng")) < _PRESCREEN_DLNG_DEG)
    )
    dphi = F.radians(F.col("c_lat") - F.col("s_lat")) / 2.0
    dlmb = F.radians(F.col("c_lng") - F.col("s_lng")) / 2.0
    a = F.sin(dphi) * F.sin(dphi) + F.cos(F.radians(F.col("s_lat"))) * F.cos(
        F.radians(F.col("c_lat"))
    ) * F.sin(dlmb) * F.sin(dlmb)
    km = F.round(2.0 * _GEO_EARTH_KM * F.asin(F.sqrt(a)), 3)
    return (
        joined.withColumn("km", km)
        .where(F.col("km") <= _GEO_RADIUS_KM)
        .select("c_custkey", "s_suppkey", "c_lat", "c_lng", "km")
    )


@register(
    "q_spatial_grid_join",
    oracle=f"""
WITH cust AS (
  SELECT c_custkey, {_coord_sql('c_custkey', 1, '40.0')} AS c_lat,
         {_coord_sql('c_custkey', 9, '60.0')} AS c_lng
  FROM customer
),
supp AS (
  SELECT s_suppkey, {_coord_sql('s_suppkey', 1, '40.0')} AS s_lat,
         {_coord_sql('s_suppkey', 9, '60.0')} AS s_lng
  FROM supplier
),
pairs AS (
  SELECT c.c_custkey, s.s_suppkey, {_HAV_SQL} AS km
  FROM cust c JOIN supp s
    ON FLOOR(c.c_lat) BETWEEN FLOOR(s.s_lat) - 1 AND FLOOR(s.s_lat) + 1
   AND FLOOR(c.c_lng) BETWEEN FLOOR(s.s_lng) - 1 AND FLOOR(s.s_lng) + 1
)
SELECT c_custkey, s_suppkey, km
FROM pairs WHERE km <= {_GEO_RADIUS_KM}
""",
    tags=("linkage", "spatial", "grid-join"),
)
def q_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers within 40 km of a supplier, via grid-cell equi-join.

    The supplier side explodes its 3×3 cell neighborhood (9× the dim
    table), the customer side joins on its own cell — one equi-join
    keyed by (lat_cell, lng_cell), sized by AQE (broadcast when the
    exploded side is genuinely small, shuffle otherwise). At 100 TB
    both sides shuffle on the cell key; dense cells are the
    skew-salting case. Output is quadratic in point density BY
    DEFINITION — the capped serving forms are
    ``q_spatial_nearest_supplier`` (≤1 row per customer) and
    ``q_spatial_radius_cell_profile`` (≤ grid-size rows).
    """
    return _spatial_radius_pairs(spark, sf_dir).select(
        "c_custkey", "s_suppkey", "km"
    )


@register(
    "q_spatial_nearest_supplier",
    oracle=f"""
WITH cust AS (
  SELECT c_custkey, {_coord_sql('c_custkey', 1, '40.0')} AS c_lat,
         {_coord_sql('c_custkey', 9, '60.0')} AS c_lng
  FROM customer
),
supp AS (
  SELECT s_suppkey, {_coord_sql('s_suppkey', 1, '40.0')} AS s_lat,
         {_coord_sql('s_suppkey', 9, '60.0')} AS s_lng
  FROM supplier
),
pairs AS (
  SELECT c.c_custkey, s.s_suppkey, {_HAV_SQL} AS km
  FROM cust c JOIN supp s
    ON FLOOR(c.c_lat) BETWEEN FLOOR(s.s_lat) - 1 AND FLOOR(s.s_lat) + 1
   AND FLOOR(c.c_lng) BETWEEN FLOOR(s.s_lng) - 1 AND FLOOR(s.s_lng) + 1
)
SELECT c_custkey, s_suppkey, km
FROM (
  SELECT c_custkey, s_suppkey, km,
         ROW_NUMBER() OVER (
           PARTITION BY c_custkey ORDER BY km, s_suppkey) AS rn
  FROM pairs WHERE km <= {_GEO_RADIUS_KM}
)
WHERE rn = 1
""",
    tags=("linkage", "spatial", "grid-join", "bounded-output"),
)
def q_spatial_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer NEAREST supplier within 40 km (k=1) — the radius
    family's scale-safe output shape (round-7 verdict §perf: the plain
    radius join's answer is quadratic in point density BY DEFINITION —
    a 24× output blow-up in the sf1 sweep — so a pipeline that only
    needs 'closest depot per customer' should never materialize it).

    Same grid-cell candidate generation as `q_spatial_grid_join`
    (3×3 neighbor explode → equi-join on the cell key, complete for
    40 km by construction), then a per-customer window keeps row 1 by
    (km, s_suppkey). Output is ≤ |customer| rows REGARDLESS of point
    density; the window partitions on c_custkey, so the top-1 runs
    shuffle-parallel with no global sort. Ties at equal rounded km
    break on supplier key in both engines.
    """
    base = q_spatial_grid_join(spark, sf_dir)
    w = W.partitionBy("c_custkey").orderBy("km", "s_suppkey")
    return (
        base.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("c_custkey", "s_suppkey", "km")
    )


@register(
    "q_spatial_radius_cell_profile",
    oracle=f"""
WITH cust AS (
  SELECT c_custkey, {_coord_sql('c_custkey', 1, '40.0')} AS c_lat,
         {_coord_sql('c_custkey', 9, '60.0')} AS c_lng
  FROM customer
),
supp AS (
  SELECT s_suppkey, {_coord_sql('s_suppkey', 1, '40.0')} AS s_lat,
         {_coord_sql('s_suppkey', 9, '60.0')} AS s_lng
  FROM supplier
),
pairs AS (
  SELECT c.c_custkey, s.s_suppkey, c.c_lat, c.c_lng, {_HAV_SQL} AS km
  FROM cust c JOIN supp s
    ON FLOOR(c.c_lat) BETWEEN FLOOR(s.s_lat) - 1 AND FLOOR(s.s_lat) + 1
   AND FLOOR(c.c_lng) BETWEEN FLOOR(s.s_lng) - 1 AND FLOOR(s.s_lng) + 1
)
SELECT CAST(FLOOR(c_lat) AS BIGINT) AS cell_lat,
       CAST(FLOOR(c_lng) AS BIGINT) AS cell_lng,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers,
       ROUND(MIN(km), 3) AS min_km,
       ROUND(AVG(km), 4) AS avg_km
FROM pairs WHERE km <= {_GEO_RADIUS_KM}
GROUP BY 1, 2
""",
    tags=("linkage", "spatial", "grid-join", "bounded-output"),
)
def q_spatial_radius_cell_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-join density profile per 1° customer cell — the radius
    family's CONSTANT-output serving form (round-12 verdict task #6:
    the raw pair list is output-bound BY DEFINITION, 174.4M rows at
    sf10; a density heat-map is what a pipeline owner usually wants
    from it, and its output is ≤ the fixed 40×40 grid REGARDLESS of
    point density).

    The within-radius pairs are still enumerated internally (the same
    lossless grid candidate join), but they hash-aggregate map-side
    into per-cell partials — nothing pair-shaped ever reaches a
    shuffle boundary except the ≤1600-row cell frame. n_pairs /
    n_customers / n_suppliers quantify density and coverage; min/avg
    km quantify tightness. Distinct counts expand to two-phase
    hash aggs (partial distinct per mapper) — still cell-bounded.
    """
    base = _spatial_radius_pairs(spark, sf_dir)
    return (
        base.withColumn("cell_lat", F.floor("c_lat").cast("long"))
        .withColumn("cell_lng", F.floor("c_lng").cast("long"))
        .groupBy("cell_lat", "cell_lng")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("c_custkey").cast("long").alias("n_customers"),
            F.countDistinct("s_suppkey").cast("long").alias("n_suppliers"),
            F.round(F.min("km"), 3).alias("min_km"),
            F.round(F.avg("km"), 4).alias("avg_km"),
        )
    )


# --------------------------------------------------------------------------
# Co-occurrence graph: suppliers that ship in the same order. The
# self-join is keyed on l_orderkey, whose multiplicity is bounded by
# lines-per-order (≤ 7 in TPC-H) — per-key fan-out is a constant, so
# the join scales linearly with the fact table. The aggregated edge
# list (supplier × supplier, count) is the input shape for the graph
# family (PageRank / triangles).
# --------------------------------------------------------------------------
@register(
    "q_supplier_cooccurrence",
    oracle="""
WITH edges AS (
  SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b, COUNT(*) AS c
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY 1, 2
)
SELECT supp_a,
       FIRST(supp_b ORDER BY c DESC, supp_b) AS best_partner,
       CAST(MAX(c) AS BIGINT) AS n_shared_orders,
       COUNT(*) AS n_partners
FROM edges
GROUP BY supp_a
""",
    tags=("linkage", "graph", "cooccurrence"),
)
def q_supplier_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each supplier's strongest co-shipment partner (most shared
    orders, smallest suppkey on ties) and its partner-degree.

    The co-shipment graph is dense (every pair co-occurs at corpus
    density), so the interesting aggregate is per-vertex, not the edge
    list: output is linear in suppliers at every SF. The self-join is
    keyed on l_orderkey whose multiplicity is bounded by
    lines-per-order, so candidate fan-out per key is a constant.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("supp_a"), F.col("b.l_suppkey").alias("supp_b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return edges.groupBy("supp_a").agg(
        F.max_by("supp_b", F.struct(F.col("c"), -F.col("supp_b"))).alias("best_partner"),
        F.max("c").cast("long").alias("n_shared_orders"),
        F.count(F.lit(1)).alias("n_partners"),
    )


# --------------------------------------------------------------------------
# Market-basket association rules: support / confidence / lift over
# co-purchased part pairs. Baskets dedup to DISTINCT (order, part)
# first, so all three counts are order-counts; the pair join is keyed
# on l_orderkey with constant per-key fan-out (≤ lines-per-order²).
# --------------------------------------------------------------------------
@register(
    "q_copurchase_association_rules",
    oracle="""
WITH basket AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM basket),
item AS (
  SELECT l_partkey, COUNT(*) AS c FROM basket GROUP BY l_partkey
),
pair AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS c_ab
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
)
SELECT p.part_a, p.part_b, p.c_ab AS support_orders,
       ROUND(1.0 * p.c_ab / ia.c, 6) AS conf_a_to_b,
       ROUND(1.0 * p.c_ab / ib.c, 6) AS conf_b_to_a,
       ROUND(1.0 * p.c_ab * n.n_orders / (ia.c * ib.c), 6) AS lift
FROM pair p
JOIN item ia ON p.part_a = ia.l_partkey
JOIN item ib ON p.part_b = ib.l_partkey, n
""",
    tags=("linkage", "association-rules", "market-basket"),
)
def q_copurchase_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over co-purchased parts: support (co-order
    count ≥ 2), directional confidence, and lift.

    The Apriori candidate-pair stage as pure relational algebra:
    basket dedup → orderkey self-join (constant fan-out) → pair
    hash-agg, then two broadcast-sized item-count joins and a 1-row
    total. Confidence/lift are ratios of exact integer counts, so
    parity is exact at any partitioning.
    """
    li = _t(spark, sf_dir, "lineitem")
    # r18: REVERTED the r17 basket persist+count and item persist
    # (VERDICT r17 #1 — a real regression: driver 2.5→4.0 s, clean
    # window 2.5→3.44 cold; the r17 knob A/B was already neutral and
    # the cross-checkout evidence came from mixed-calib windows).
    # Runtime ReuseExchange dedups the distinct subtree's exchange
    # across the four consumers, so the residual recompute per branch
    # is one cheap codegen agg — the losing side of the persist
    # boundary rule (OPTIMIZATION_r17.md). A/B r18 (interleaved sf0.1
    # warm medians): revert 2.05 vs persists 2.44, every paired rep
    # favoring the revert.
    basket = li.select("l_orderkey", "l_partkey").distinct()
    item = basket.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    n = basket.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    a = basket.alias("a")
    b = basket.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= 2)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    return (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("c_ab").alias("support_orders"),
            F.round(F.col("c_ab") * 1.0 / F.col("ca"), 6).alias("conf_a_to_b"),
            F.round(F.col("c_ab") * 1.0 / F.col("cb"), 6).alias("conf_b_to_a"),
            F.round(
                F.col("c_ab") * 1.0 * F.col("n_orders") / (F.col("ca") * F.col("cb")), 6
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# Sparse cosine document pairs: the weighted (TF) analogue of the
# n-gram Jaccard join. High-document-frequency terms are dropped
# BEFORE the inverted-index join — the classic guard against the
# quadratic hot-term posting list (a stopword shared by 50% of docs
# would alone contribute |docs|²/4 candidate rows).
# --------------------------------------------------------------------------
@register(
    "q_sparse_cosine_doc_pairs",
    oracle="""
WITH tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM (
    SELECT doc_id,
           UNNEST(string_split(regexp_replace(LOWER(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS term
    FROM documents)
  WHERE term <> ''
  GROUP BY doc_id, term
),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
df AS (SELECT term, COUNT(*) AS d FROM tf GROUP BY term),
kept AS (
  SELECT tf.doc_id, tf.term, tf.tf
  FROM tf JOIN df USING (term), nd
  WHERE df.d <= LEAST(0.1 * nd.n, 256)
),
norms AS (SELECT doc_id, SQRT(SUM(tf * tf)) AS nrm FROM kept GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.tf * b.tf) AS dot
  FROM kept a JOIN kept b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(dot / (x.nrm * y.nrm), 4) AS cosine_sim
FROM dots JOIN norms x ON id_a = x.doc_id JOIN norms y ON id_b = y.doc_id
WHERE ROUND(dot / (x.nrm * y.nrm), 4) >= 0.5
""",
    tags=("linkage", "cosine", "sparse", "dedup"),
)
def q_sparse_cosine_doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs with TF-vector cosine ≥ 0.5 via an inverted-index
    join (no dense vectors, no cross product).

    TF counts are integers, so every dot product and norm is EXACT in
    both engines regardless of summation order — cosine parity is
    bit-level, not tolerance-based. The document-frequency guard is
    ``df ≤ min(0.1·n, 256)``: the RELATIVE 10% cut alone lets posting
    lists grow linearly with the corpus and per-term pair fan-out
    quadratically — the round-7 sf1 sweep measured it at 54× the
    sf0.1 time — so an ABSOLUTE cap bounds each posting list (hence
    per-term join fan-out) by a constant at any scale, the standard
    common-term cut of sparse all-pairs similarity (terms that common
    carry ~no cosine signal at the 0.5 threshold anyway). Identical
    expression in the oracle, so parity holds at every SF.
    """
    tune_session(spark)
    d = read_table(spark, sf_dir, "documents")
    terms = d.select(
        "doc_id",
        F.explode(
            F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), " ")
        ).alias("term"),
    ).where(F.col("term") != "")
    # Examined r17, left at the r16 shape: re-keying tf by term (one
    # ReusedExchange serving nd/df_/kept, tokenize once, self-join
    # shuffle-free) MEASURED SLOWER across 5 interleaved cross-checkout
    # sessions (old ~1.37 s vs new ~2.3 s steady at sf0.1): the raw-tf
    # repartition plus the kept materialization job cost more than the
    # duplicated tokenize they eliminate at this scale, and the
    # self-join's kept inputs broadcast here anyway.
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    nd = tf.agg(F.countDistinct("doc_id").alias("n"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("d"))
    from etl_project_spark.session import scoped_persist

    # kept feeds the norms agg AND both sides of the pair join; without
    # a persist the tokenize+count subtree re-executes 4x (PLANS.md
    # showed 12 document scans). Tracked for release by the bench/
    # caller via session.release_persists().
    kept = scoped_persist(
        tf.join(df_, "term")
        .crossJoin(F.broadcast(nd))
        .where(F.col("d") <= F.least(0.1 * F.col("n"), F.lit(256.0)))
        .select("doc_id", "term", "tf")
    )
    norms = kept.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("nrm"))
    a = kept.alias("a")
    b = kept.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).alias("dot"))
    )
    nx = norms.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("na"))
    ny = norms.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nb"))
    cos = F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4)
    return (
        dots.join(nx, "id_a")
        .join(ny, "id_b")
        .select("id_a", "id_b", cos.alias("cosine_sim"))
        .where(F.col("cosine_sim") >= 0.5)
    )
