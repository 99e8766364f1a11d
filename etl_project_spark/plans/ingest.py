"""Ingestion + enrichment queries — the reference's distinctive surface
(SURVEY.md §7.2 step 4) run end to end through the engine:

    paginated custom source → sentinel handling → guarded retrying
    enrichment (mapInPandas) → typed coordinate extraction

Both queries are fully oracle-checked even though no corpus table is
involved: the synthetic fetcher and the stand-in geocoder are
deterministic arithmetic (Knuth multiplicative hash / md5), so the
DuckDB oracle regenerates the identical source rows with
``generate_series`` and mirrors the enrichment hash in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_spark.cleaning import split_latlng
from etl_project_spark.operators.enrich import deterministic_geocoder, enrich_with_service
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session
from etl_project_spark.sources.paginated import register_paginated_source

#: Fixed sizing so Spark and the oracle agree (sf-independent surface).
N_ROWS = 2000
ROWS_PER_PAGE = 128

#: DuckDB CTE regenerating SyntheticShopFetcher's rows exactly.
_SRC_CTE = f"""
src AS (
  SELECT i,
         'Shop ' || lpad(CAST(i AS VARCHAR), 5, '0') AS shop,
         (i * 2654435761) % 4294967296 AS h
  FROM generate_series(0, {N_ROWS - 1}) t(i)
),
rows_ AS (
  SELECT shop,
         'Street ' || CAST(h % 5000 AS VARCHAR) || ' No. ' || CAST(h % 900 + 100 AS VARCHAR) AS direccion,
         'Locality ' || CAST(h % 50 AS VARCHAR) AS localidad,
         h % 10 AS bucket,
         ROUND(-34.0 - (h % 1000) / 1000.0, 6) AS src_lat,
         ROUND(-58.0 - (h % 997) / 997.0, 6) AS src_lng
  FROM src
)
"""


def _scan(spark: SparkSession) -> DataFrame:
    tune_session(spark)
    register_paginated_source(spark)
    return (
        spark.read.format("paginated_table")
        .option("n_rows", N_ROWS)
        .option("rows_per_page", ROWS_PER_PAGE)
        .option("max_concurrency", 8)
        .load()
    )


@register(
    "q_source_paginated_scan",
    oracle=f"""
WITH {_SRC_CTE}
SELECT CASE WHEN bucket < 7 THEN 'packed'
            WHEN bucket < 8 THEN 'regex_miss'
            ELSE 'no_button' END AS coord_status,
       COUNT(*) AS n_shops,
       CAST(COUNT(DISTINCT localidad) AS BIGINT) AS n_localities
FROM rows_
GROUP BY 1
""",
    tags=("source", "custom-datasource"),
)
def q_source_paginated_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the paginated custom source; profile the sentinel mix.

    ≙ S1-S6 (flows/etl.py:67-183): the whole scraped-table scan as a
    parallel Spark source — pages are partitions, the sentinel
    convention of :150-159 arrives intact and is classified here.
    """
    df = _scan(spark)
    status = (
        F.when(F.col("Localizar") == "No disponible", "no_button")
        .when(F.col("Localizar") == "", "regex_miss")
        .otherwise("packed")
    )
    return df.groupBy(status.alias("coord_status")).agg(
        F.count(F.lit(1)).alias("n_shops"),
        F.countDistinct("Localidad").alias("n_localities"),
    )


@register(
    "q_enrich_missing_coords",
    oracle=f"""
WITH {_SRC_CTE},
geo AS (
  SELECT shop,
         bucket,
         src_lat,
         src_lng,
         CAST(concat('0x', substr(md5(direccion || ', ' || localidad || ', ARGENTINA'), 1, 8)) AS BIGINT) AS gh
  FROM rows_
)
SELECT shop,
       CASE WHEN bucket < 7 THEN src_lat
            WHEN bucket < 8 THEN NULL
            ELSE ROUND(gh % 18000 / 100.0 - 90.0, 2) END AS lat,
       CASE WHEN bucket < 7 THEN src_lng
            WHEN bucket < 8 THEN NULL
            ELSE ROUND(gh % 36000 / 100.0 - 180.0, 2) END AS lng,
       bucket >= 8 AS was_enriched
FROM geo
""",
    tags=("enrich", "mapInPandas", "pipeline"),
)
def q_enrich_missing_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → guarded enrichment → typed coordinates, end to end.

    ≙ the reference's extract→transform spine (flows/etl.py:289-306):
    only ``"No disponible"`` rows are geocoded (T4 guard, :206-208) via
    the retrying mapInPandas operator (T6, :186-242); regex-miss ``''``
    rows stay NULL exactly as the reference leaves them unenriched.
    """
    df = _scan(spark)
    df = df.withColumn("needs_geo", F.col("Localizar") == "No disponible")
    df = df.withColumn(
        "__q",
        F.concat_ws(", ", F.col("Dirección"), F.col("Localidad"), F.lit("ARGENTINA")),
    )
    enriched = enrich_with_service(
        df, "__q", "geo", deterministic_geocoder, guard_col="needs_geo"
    )
    packed = F.when(F.col("needs_geo"), F.col("geo")).otherwise(
        F.nullif(F.col("Localizar"), F.lit(""))
    )
    lat, lng = split_latlng(packed)
    return enriched.select(
        F.col("Comercio").alias("shop"),
        lat.alias("lat"),
        lng.alias("lng"),
        F.col("needs_geo").alias("was_enriched"),
    )


@register(
    "q_merge_upsert_orders",
    oracle="""
WITH changes AS (
  SELECT o_orderkey, ROUND(o_totalprice + 1000.0, 2) AS new_price
  FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey + 100000000 AS o_orderkey,
         ROUND(o_totalprice - 500.0, 2) AS new_price
  FROM orders WHERE o_orderkey % 1000 = 0
)
SELECT COALESCE(o.o_orderkey, c.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
            WHEN c.o_orderkey IS NULL THEN 'kept'
            ELSE 'updated' END AS merge_action,
       COALESCE(c.new_price, ROUND(o.o_totalprice, 2)) AS final_price
FROM orders o FULL OUTER JOIN changes c ON o.o_orderkey = c.o_orderkey
""",
    tags=("merge", "upsert", "etl"),
)
def q_merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert as a declarative plan: apply a changes feed to a base.

    The lakehouse MERGE INTO (update-matched / insert-unmatched)
    expressed as one full outer join + coalesce — the engine-portable
    upsert the reference approximates with ``if_exists='replace'`` +
    append chunks (flows/etl.py:256-286). The changes feed here is
    derived deterministically from the base (repriced every-3rd key by
    an exact-in-binary additive delta — multiplicative reprices land on
    half-cent ROUND boundaries where Spark and DuckDB disagree,
    plus synthetic new keys) so the oracle reproduces it exactly. At
    scale the join shuffles on the merge key — or goes shuffle-free on
    bucketed layouts (see the bucketed-join test).
    """
    from etl_project_spark.catalog import read_table

    tune_session(spark)
    o = read_table(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", F.round(F.col("o_totalprice") + 1000.0, 2).alias("new_price")
    )
    inserts = o.filter(F.col("o_orderkey") % 1000 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.round(F.col("o_totalprice") - 500.0, 2).alias("new_price"),
    )
    changes = updates.unionByName(inserts)
    base = o.select("o_orderkey", "o_totalprice")
    j = base.alias("o").join(
        changes.alias("c"),
        F.col("o.o_orderkey") == F.col("c.o_orderkey"),
        "full_outer",
    )
    return j.select(
        F.coalesce(F.col("o.o_orderkey"), F.col("c.o_orderkey")).alias("o_orderkey"),
        F.when(F.col("o.o_orderkey").isNull(), F.lit("inserted"))
        .when(F.col("c.o_orderkey").isNull(), F.lit("kept"))
        .otherwise(F.lit("updated"))
        .alias("merge_action"),
        F.coalesce(F.col("c.new_price"), F.round(F.col("o.o_totalprice"), 2)).alias(
            "final_price"
        ),
    )


#: Buenos Aires city center — the reference geocodes Argentine shops
#: (flows/etl.py:218 appends ", ARGENTINA" to every query).
_BA_LAT, _BA_LNG = -34.6037, -58.3816
_EARTH_KM = 6371.0


@register(
    "q_haversine_distance_bands",
    oracle=f"""
WITH {_SRC_CTE},
geo AS (
  SELECT shop, bucket, src_lat, src_lng,
         CAST(concat('0x', substr(md5(direccion || ', ' || localidad || ', ARGENTINA'), 1, 8)) AS BIGINT) AS gh
  FROM rows_
), coords AS (
  SELECT shop,
         CASE WHEN bucket < 7 THEN src_lat
              WHEN bucket < 8 THEN NULL
              ELSE ROUND(gh % 18000 / 100.0 - 90.0, 2) END AS lat,
         CASE WHEN bucket < 7 THEN src_lng
              WHEN bucket < 8 THEN NULL
              ELSE ROUND(gh % 36000 / 100.0 - 180.0, 2) END AS lng
  FROM geo
), dist AS (
  SELECT shop,
         ROUND(2.0 * {_EARTH_KM} * ASIN(SQRT(
             SIN(RADIANS(lat - ({_BA_LAT})) / 2.0) * SIN(RADIANS(lat - ({_BA_LAT})) / 2.0)
           + COS(RADIANS({_BA_LAT})) * COS(RADIANS(lat))
             * SIN(RADIANS(lng - ({_BA_LNG})) / 2.0) * SIN(RADIANS(lng - ({_BA_LNG})) / 2.0)
         )), 1) AS km
  FROM coords WHERE lat IS NOT NULL
)
SELECT CAST(FLOOR(km / 2000.0) AS BIGINT) AS band_2000km,
       COUNT(*) AS n_shops,
       MIN(km) AS min_km,
       MAX(km) AS max_km
FROM dist GROUP BY 1
""",
    tags=("enrich", "geo", "haversine"),
)
def q_haversine_distance_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle distance profile of geocoded shops around Buenos
    Aires, in 2000-km bands.

    The analytical follow-on to the reference's geocoding stage: typed
    (lat, lng) feed the haversine formula as pure codegen scalar math
    (sin/cos/asin — no UDF), then a coarse hash aggregate. Distances
    round to 0.1 km before banding/extrema so both engines compare the
    same discretized values; band boundaries sit ~9 orders of
    magnitude away from any ulp-level libm divergence. Map-side
    expression + tiny aggregate — scale-free.
    """
    df = _scan(spark)
    df = df.withColumn("needs_geo", F.col("Localizar") == "No disponible")
    df = df.withColumn(
        "__q",
        F.concat_ws(", ", F.col("Dirección"), F.col("Localidad"), F.lit("ARGENTINA")),
    )
    enriched = enrich_with_service(
        df, "__q", "geo", deterministic_geocoder, guard_col="needs_geo"
    )
    packed = F.when(F.col("needs_geo"), F.col("geo")).otherwise(
        F.nullif(F.col("Localizar"), F.lit(""))
    )
    lat, lng = split_latlng(packed)
    with_coords = enriched.select(lat.alias("lat"), lng.alias("lng")).filter(
        F.col("lat").isNotNull()
    )
    dphi = F.radians(F.col("lat") - F.lit(_BA_LAT)) / 2.0
    dlmb = F.radians(F.col("lng") - F.lit(_BA_LNG)) / 2.0
    a = F.sin(dphi) * F.sin(dphi) + F.cos(F.radians(F.lit(_BA_LAT))) * F.cos(
        F.radians(F.col("lat"))
    ) * F.sin(dlmb) * F.sin(dlmb)
    km = F.round(2.0 * _EARTH_KM * F.asin(F.sqrt(a)), 1)
    return (
        with_coords.select(km.alias("km"))
        .groupBy(F.floor(F.col("km") / 2000.0).cast("bigint").alias("band_2000km"))
        .agg(
            F.count(F.lit(1)).alias("n_shops"),
            F.min("km").alias("min_km"),
            F.max("km").alias("max_km"),
        )
    )
