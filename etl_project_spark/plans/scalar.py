"""Scalar-function layer: string/regex, date, JSON, array functions.

Mirrors the reference's idioms (SURVEY.md §7.2 step 3): regexp
extraction ≙ S3/S5 (flows/etl.py:134-135,149-159), concat_ws ≙ T5
(:218), when/otherwise ≙ T4 (:206-208) — applied to the driver corpus
so each is oracle-checkable. All JVM-side expressions inside the scan
stage; nothing here shuffles except the final demo aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_spark.catalog import read_table
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return read_table(spark, sf_dir, name)


@register(
    "q_string_funcs_part",
    oracle="""
SELECT p_partkey,
       UPPER(p_brand) AS brand_upper,
       CAST(LENGTH(p_name) AS INTEGER) AS name_len,
       regexp_extract(p_type, '([A-Z]+)$', 1) AS type_last_word,
       CONCAT(p_brand, '/', p_type) AS brand_type
FROM part
WHERE p_type LIKE '%AR%'
""",
    tags=("string",),
)
def q_string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE filter + upper/length/regexp_extract/concat (≙ S3/S5 idioms).

    Predicate '%AR%' matches the fixture corpus (STANDARD, LARGE) so
    the projected expressions are value-checked on real rows — the
    round-1 '%BRASS%' predicate matched zero rows and the oracle
    comparison passed vacuously.
    """
    p = _t(spark, sf_dir, "part")
    return p.filter(F.col("p_type").like("%AR%")).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("type_last_word"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
    )


@register(
    "q_conditional_projection",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 5000 THEN 'standard'
            ELSE 'premium' END AS balance_band,
       CONCAT_WS(', ', c_name, c_mktsegment, 'ACTIVE') AS display_label
FROM customer
""",
    tags=("string", "conditional"),
)
def q_conditional_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise + concat_ws (≙ T4 guard + T5 query building)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("balance_band"),
        F.concat_ws(", ", F.col("c_name"), F.col("c_mktsegment"), F.lit("ACTIVE")).alias(
            "display_label"
        ),
    )


@register(
    "q_date_funcs_monthly_orders",
    oracle="""
SELECT DATE_TRUNC('month', o_orderdate) AS order_month,
       EXTRACT(year FROM o_orderdate) AS order_year,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS monthly_revenue
FROM orders
GROUP BY DATE_TRUNC('month', o_orderdate), EXTRACT(year FROM o_orderdate)
""",
    tags=("date", "agg"),
)
def q_date_funcs_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc/extract + monthly aggregate."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("monthly_revenue"),
        )
    )


@register(
    "q_json_extract_events",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events
GROUP BY event_type
""",
    tags=("json", "agg"),
)
def q_json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction (≙ events.props → typed column) + aggregate."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "q_variant_event_props",
    oracle="""
SELECT event_type,
       SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS sum_k,
       COUNT(CASE WHEN json_extract_string(props, '$.missing') IS NOT NULL
                  THEN 1 END) AS n_missing_field
FROM events
GROUP BY event_type
""",
    tags=("json", "variant"),
)
def q_variant_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via the VARIANT type (Spark 4).

    ``parse_json`` builds a binary-encoded variant once per row;
    ``variant_get`` / ``try_variant_get`` then extract typed fields
    without re-parsing — at scale this beats repeated
    ``get_json_object`` calls, which each re-parse the string. The
    missing-path probe checks ``try_variant_get`` null semantics
    (absent field → NULL, counted as 0 matches — same as the oracle's
    json_extract_string on a missing key).
    """
    e = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_type",
        F.variant_get(v, "$.k", "int").alias("_k"),
        F.try_variant_get(v, "$.missing", "string").alias("_m"),
    ).groupBy("event_type").agg(
        F.sum("_k").alias("sum_k"),
        F.count("_m").alias("n_missing_field"),
    )


@register(
    "q_array_funcs_embeddings",
    oracle="""
SELECT vec_id,
       label,
       CAST(len(embedding) AS INTEGER) AS dim,
       ROUND(SQRT(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 4) AS l2_norm,
       ROUND(list_sum(CAST(embedding AS DOUBLE[])) / len(embedding), 4) AS mean_component
FROM embeddings
""",
    tags=("array",),
)
def q_array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: per-vector dim, L2 norm, mean."""
    emb = _t(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    sq_sum = F.aggregate(
        F.transform(as_double, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    total = F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x)
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
        F.round(total / F.size("embedding"), 4).alias("mean_component"),
    )


@register(
    "q_packed_latlng_roundtrip",
    oracle="""
SELECT c_custkey,
       CAST(regexp_extract(packed, '^\\s*([-+]?\\d+(\\.\\d+)?)\\s*,', 1) AS DOUBLE) AS lat,
       CAST(regexp_extract(packed, ',\\s*([-+]?\\d+(\\.\\d+)?)\\s*$', 1) AS DOUBLE) AS lng
FROM (
  SELECT c_custkey,
         CONCAT(CAST(ROUND(c_acctbal / 100.0, 4) AS VARCHAR), ',',
                CAST(c_nationkey AS VARCHAR)) AS packed
  FROM customer
)
""",
    tags=("string", "cast"),
)
def q_packed_latlng_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack + unpack a ``"lat,lng"`` string (≙ flows/etl.py:154,219).

    Builds a packed coordinate string from numeric columns, then splits
    it back into typed doubles with the cleaning helper — round-trip
    proves the sentinel-free path of the packed-string contract.
    """
    from etl_project_spark.cleaning import split_latlng

    c = _t(spark, sf_dir, "customer")
    packed = F.concat(
        F.round(F.col("c_acctbal") / 100.0, 4).cast("string"),
        F.lit(","),
        F.col("c_nationkey").cast("string"),
    )
    lat, lng = split_latlng(packed)
    return c.select("c_custkey", lat.alias("lat"), lng.alias("lng"))


@register(
    "q_limit0_schema_only",
    oracle="""
SELECT c_custkey, c_name, c_acctbal FROM customer LIMIT 0
""",
    tags=("limit", "schema"),
)
def q_limit0_schema_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-only projection (zero rows).

    ≙ T7, the reference's ``df.head(n=0)`` used to emit DDL without
    data (flows/etl.py:257) — in Spark a ``limit(0)`` plan whose schema
    drives ``write.jdbc(mode='overwrite')`` DDL generation.
    """
    c = _t(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_name", "c_acctbal").limit(0)


@register(
    "q_from_json_typed_events",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50) AS BIGINT) AS n_high_k,
       MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k
FROM events
GROUP BY event_type
""",
    tags=("json", "struct"),
)
def q_from_json_typed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_json`` into a typed struct column (schema-on-read for the
    JSON props payload), then filter/aggregate on the typed field —
    the struct projection stays JVM-side, no string re-parsing per use.
    """
    from pyspark.sql import types as T

    e = _t(spark, sf_dir, "events")
    props_schema = T.StructType([T.StructField("k", T.IntegerType())])
    typed = e.withColumn("p", F.from_json("props", props_schema))
    return typed.groupBy("event_type").agg(
        F.count(F.when(F.col("p.k") > 50, 1)).alias("n_high_k"),
        F.min("p.k").alias("min_k"),
    )


@register(
    "q_posexplode_embedding",
    oracle="""
SELECT vec_id,
       CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
       ROUND(CAST(UNNEST(embedding) AS DOUBLE), 4) AS val
FROM embeddings
WHERE vec_id < 64
""",
    tags=("array", "explode"),
)
def q_posexplode_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array → (position, value) rows. The generator runs
    inside codegen; the vec_id predicate is pushed below the explode to
    the parquet scan so only matching row groups inflate 64×."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 64)
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", "pos", F.round(F.col("val").cast("double"), 4).alias("val"))


@register(
    "q_math_funcs_lineitem",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(SQRT(l_extendedprice), 4) AS price_sqrt,
       ROUND(LN(l_extendedprice + 1.0), 6) AS price_ln,
       ROUND(POW(1.0 + l_discount, l_quantity), 4) AS compound,
       ABS(l_quantity - 25.0) AS qty_dev,
       CAST(CEIL(l_extendedprice / 1000.0) AS BIGINT) AS price_k_ceil,
       CAST(FLOOR(l_tax * 100.0) AS BIGINT) AS tax_pct_floor
FROM lineitem
WHERE l_orderkey < 1000
""",
    tags=("scalar", "math"),
)
def q_math_funcs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function surface: sqrt/ln/pow/abs/ceil/floor — all codegen
    scalar expressions evaluated inside the scan stage."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("price_ln"),
        F.round(F.pow(F.col("l_discount") + 1.0, F.col("l_quantity")), 4).alias(
            "compound"
        ),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.ceil(F.col("l_extendedprice") / 1000.0).cast("bigint").alias("price_k_ceil"),
        F.floor(F.col("l_tax") * 100.0).cast("bigint").alias("tax_pct_floor"),
    )


@register(
    "q_null_handling_funcs",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN NULLIF(c_mktsegment, 'BUILDING') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_building,
       ROUND(SUM(COALESCE(CASE WHEN c_acctbal > 0 THEN c_acctbal END, 0.0)), 2)
           AS positive_bal
FROM customer
GROUP BY c_mktsegment
""",
    tags=("scalar", "null"),
)
def q_null_handling_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-production and NULL-elimination idioms (nullif/coalesce/when).

    The engine's NULL discipline in one query: NULLIF manufactures
    NULLs from sentinels (the reference's 'No disponible' pattern,
    flows/etl.py:208, inverted), a guarded CASE yields NULL on the
    else-branch, and COALESCE restores a neutral element before SUM.
    """
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).isNull(), 1).otherwise(0)
        ).alias("n_building"),
        F.round(
            F.sum(F.coalesce(F.when(F.col("c_acctbal") > 0, F.col("c_acctbal")), F.lit(0.0))), 2
        ).alias("positive_bal"),
    )


@register(
    "q_string_shaping_funcs",
    oracle="""
SELECT p_partkey,
       LPAD(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
       TRANSLATE(p_brand, '#', '-') AS brand_slug,
       REVERSE(p_name) AS rev_name,
       REPEAT(LEFT(p_type, 2), 2) AS type_tag,
       CAST(STRPOS(p_name, 'a') AS INTEGER) AS first_a
FROM part
""",
    tags=("scalar", "string"),
)
def q_string_shaping_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String shaping breadth: pad/translate/reverse/repeat/position.

    Pure projections — zero shuffles, fully codegen; the formatting
    layer of an export/interchange stage.
    """
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.translate("p_brand", "#", "-").alias("brand_slug"),
        F.reverse("p_name").alias("rev_name"),
        F.repeat(F.substring("p_type", 1, 2), 2).alias("type_tag"),
        F.instr("p_name", "a").alias("first_a"),
    )


@register(
    "q_bitwise_agg_orders",
    oracle="""
SELECT o_orderstatus,
       BIT_AND(o_orderkey) AS key_and,
       BIT_OR(o_orderkey) AS key_or,
       BIT_XOR(o_orderkey) AS key_xor
FROM orders
GROUP BY o_orderstatus
""",
    tags=("scalar", "bitwise", "agg"),
)
def q_bitwise_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates — order-insensitive by algebra,
    so no float-style parity caveats; used for key-coverage masks and
    checksum-style reconciliation."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_orderkey").alias("key_and"),
        F.bit_or("o_orderkey").alias("key_or"),
        F.bit_xor("o_orderkey").alias("key_xor"),
    )


@register(
    "q_datetime_extract_breadth",
    oracle="""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS q,
       CAST(EXTRACT(isodow FROM o_orderdate) AS INTEGER) AS iso_dow,
       COUNT(*) AS n_orders
FROM orders
GROUP BY EXTRACT(year FROM o_orderdate),
         EXTRACT(quarter FROM o_orderdate),
         EXTRACT(isodow FROM o_orderdate)
""",
    tags=("scalar", "datetime", "agg"),
)
def q_datetime_extract_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-field extraction breadth: year/quarter/ISO weekday.

    ISO weekday is the cross-engine-stable choice (Monday=1..Sunday=7);
    Spark's ``dayofweek`` is Sunday=1, so ``weekday()+1`` is the
    portable mapping. Grouping on extracted fields still pushes the
    scan projection down to the one date column.
    """
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("y"),
        F.quarter("o_orderdate").alias("q"),
        (F.weekday("o_orderdate") + 1).alias("iso_dow"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "q_url_parse_docs",
    oracle="""
SELECT doc_id,
       source || '.example.com' AS host,
       '/docs/' || CAST(doc_id AS VARCHAR) AS path,
       lang AS lang_param
FROM documents
WHERE doc_id < 200
""",
    tags=("string", "url"),
)
def q_url_parse_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse_url`` decomposition (HOST / PATH / QUERY param).

    URLs are constructed from document fields, so the oracle states the
    expected decomposition directly — the check is that parse_url
    inverts the construction exactly (Hive-compatible URL grammar).
    """
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "q_safe_arithmetic",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) - COUNT(CASE WHEN o_orderkey % 10 <> 0 THEN 1 END) AS n_div_null,
       COUNT(*) - COUNT(CASE WHEN o_orderkey % 2 = 0 THEN 1 END) AS n_bad_ts,
       ROUND(SUM(o_orderkey / 4.0), 2) AS qtr_key_sum
FROM orders
GROUP BY o_orderstatus
""",
    tags=("scalar", "try", "ansi"),
)
def q_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe ``try_*`` family under ANSI mode (Spark 4 default).

    ``try_divide`` by zero and ``try_to_timestamp`` of malformed input
    yield NULL instead of failing the job — the behavior a 100 TB batch
    needs when one poisoned row must not kill a 6-hour run. NULL counts
    and an exact-quarters sum (binary-exact, no rounding boundary) are
    the oracle contract; the divisors/timestamps are derived from
    orderkey parity so both engines see identical inputs.
    """
    o = _t(spark, sf_dir, "orders")
    div = F.try_divide(
        F.col("o_totalprice"),
        F.when(F.col("o_orderkey") % 10 == 0, 0.0).otherwise(2.0),
    )
    ts = F.try_to_timestamp(
        F.when(F.col("o_orderkey") % 2 == 0, "2024-01-01").otherwise("not-a-date")
    )
    return o.groupBy("o_orderstatus").agg(
        (F.count(F.lit(1)) - F.count(div)).alias("n_div_null"),
        (F.count(F.lit(1)) - F.count(ts)).alias("n_bad_ts"),
        F.round(F.sum(F.try_divide(F.col("o_orderkey"), F.lit(4))), 2).alias(
            "qtr_key_sum"
        ),
    )


@register(
    "q_binary_hash_funcs",
    oracle="""
SELECT doc_id,
       hex(encode(substr(text, 1, 8))) AS head_hex,
       to_base64(encode(substr(text, 1, 8))) AS head_b64,
       sha256(text) AS text_sha256,
       md5(text) AS text_md5
FROM documents
WHERE doc_id < 100
""",
    tags=("binary", "hash"),
)
def q_binary_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encode/hex/base64 + cryptographic digests — the
    content-addressing toolkit (cache keys, content ids, shard-stable
    fingerprints). Both engines agree byte-for-byte on UTF-8 encode,
    hex case, base64 alphabet, SHA-256 and MD5 hex digests.
    """
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    head = F.encode(F.substring("text", 1, 8), "UTF-8")
    return d.select(
        "doc_id",
        F.hex(head).alias("head_hex"),
        F.base64(head).alias("head_b64"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5("text").alias("text_md5"),
    )


@register(
    "q_hof_embedding_audit",
    oracle="""
SELECT vec_id,
       CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS INTEGER)
           AS n_positive,
       len(list_filter(CAST(embedding AS DOUBLE[]), x -> ABS(x) > 0.45)) > 0
           AS has_extreme,
       len(list_filter(CAST(embedding AS DOUBLE[]), x -> ABS(x) > 10.0)) = 0
           AS all_bounded,
       ROUND(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> ABS(x))), 4)
           AS l1_norm
FROM embeddings
""",
    tags=("scalar", "higher-order", "array"),
)
def q_hof_embedding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function breadth over embeddings: filter
    (positive-component count), exists (any extreme component), forall
    (bounded check), and an aggregate fold (L1 norm) — all evaluated
    in-row inside codegen, no explode.

    The HOF quartet is the idiomatic replacement for exploding a
    vector to rows when the consumer only needs a per-row scalar: zero
    fan-out, zero shuffle. Folds run left-to-right in both engines, so
    the L1 sum is bit-identical before rounding.
    """
    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    emb = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        F.exists(emb, lambda x: F.abs(x) > 0.45).alias("has_extreme"),
        F.forall(emb, lambda x: F.abs(x) <= 10.0).alias("all_bounded"),
        F.round(
            F.aggregate(
                F.transform(emb, lambda x: F.abs(x)), F.lit(0.0), lambda a, x: a + x
            ),
            4,
        ).alias("l1_norm"),
    )


@register(
    "q_explode_outer_token_audit",
    oracle="""
WITH toks AS (
  SELECT d.doc_id, d.lang,
         CASE WHEN d.text IS NULL
                OR len(regexp_extract_all(LOWER(d.text), '[a-z]{6,}')) = 0
              THEN [NULL]
              ELSE regexp_extract_all(LOWER(d.text), '[a-z]{6,}') END AS ts
  FROM documents d
),
rows_ AS (SELECT doc_id, lang, UNNEST(ts) AS tok FROM toks)
SELECT lang,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tokenless_docs,
       COUNT(tok) AS n_tokens
FROM rows_
GROUP BY lang
""",
    tags=("scalar", "explode-outer", "null-handling"),
)
def q_explode_outer_token_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer semantics: documents whose token array is empty
    survive as a single NULL-token row instead of vanishing — the
    difference between 'docs with no 6+-letter words' being countable
    and silently dropped. The 6-letter threshold is chosen so the
    outer path actually FIRES on the fixtures (5 tokenless docs at
    every SF) — with a looser regex the query could not distinguish
    explode_outer from plain explode.

    The oracle emulates outer-explode with a CASE-to-[NULL] since
    DuckDB's UNNEST is inner-only (NULL text included in the CASE —
    explode_outer(NULL array) also emits the NULL-token row); Spark
    uses the real ``explode_outer`` generator.
    """
    tune_session(spark)
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.regexp_extract_all(F.lower("text"), F.lit("[a-z]{6,}"), F.lit(0)).alias("ts"),
    )
    rows = toks.select("lang", F.explode_outer("ts").alias("tok"))
    return rows.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("tok").isNull(), 1).otherwise(0)).cast("long").alias(
            "n_tokenless_docs"
        ),
        F.count("tok").alias("n_tokens"),
    )
