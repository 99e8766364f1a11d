"""Multimodal plumbing tests: real byte-level features validated against
driver-side recomputation; the decode stub both raises honestly and
runs end to end with the deterministic fake decoder.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_project_spark.catalog import read_table
from etl_project_spark.operators import multimodal as MM
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def mm_table(spark):
    docs = read_table(spark, SF_ORACLE, "documents")
    return MM.make_multimodal_table(docs).cache()


def test_features_match_local_recompute(spark, mm_table):
    sample = mm_table.limit(20).collect()
    feats = {
        r.id: r
        for r in MM.extract_features(mm_table.limit(20)).collect()
    }
    assert len(feats) == len(sample)
    for row in sample:
        f = feats[row.id]
        assert f.n_bytes == len(row.payload)
        assert f.sniffed_type == MM.sniff_type(bytes(row.payload))
        assert abs(f.byte_entropy - MM.byte_entropy(bytes(row.payload))) < 1e-9
        assert f.payload_hash == MM._fnv1a64(bytes(row.payload))
        assert 0.0 <= f.byte_entropy <= 8.0


def test_payload_never_reaches_feature_output(spark, mm_table):
    feats = MM.extract_features(mm_table)
    assert "payload" not in feats.columns
    assert all(f.dataType.typeName() != "binary" for f in feats.schema.fields)


def test_decode_stub_raises_honestly(spark, mm_table):
    with pytest.raises(Exception, match="codec"):
        MM.decode_images(mm_table.limit(1)).collect()


def test_fake_decoder_deterministic_end_to_end(spark, mm_table):
    sample = mm_table.filter(F.col("modality") == "image").limit(10)
    decoded = {r.id: r for r in MM.decode_images(sample, decoder=MM._fake_image_decoder).collect()}
    for row in sample.collect():
        want = MM._fake_image_decoder(bytes(row.payload), row.modality)
        got = decoded[row.id]
        assert (got.width, got.height, got.n_channels) == (
            want["width"], want["height"], want["n_channels"]
        )
        assert abs(got.mean_luma - want["mean_luma"]) < 1e-9


def test_metadata_filter_prunes_payload_from_scan(spark):
    """Filtering on metadata only must not carry the payload column
    through the plan (scale guarantee: no blob deserialization).
    Cleared cache first: cache substitution would swap the cached
    all-column InMemoryRelation into the matching subplan."""
    spark.catalog.clearCache()
    docs = read_table(spark, SF_ORACLE, "documents")
    fresh = MM.make_multimodal_table(docs)
    pruned = fresh.filter(F.col("meta.n_chars") > 100).select("id", "meta")
    plan = pruned._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan


def test_resize_plumbing_schema_and_pruning(spark, mm_table):
    from etl_project_spark.operators import multimodal as MM

    imgs = mm_table.filter("modality = 'image'")
    out = MM.resize_images(imgs, out_width=32, out_height=32,
                           decoder=MM._fake_image_decoder)
    assert [f.name for f in out.schema.fields] == [
        "id", "width", "height", "out_width", "out_height", "resized_md5"]
    rows = out.collect()
    assert len(rows) == imgs.count()
    assert all(r.out_width == 32 and r.out_height == 32 for r in rows)
    assert "payload" not in out.columns


def test_frame_sample_counts_match_length_arithmetic(spark, mm_table):
    from pyspark.sql import functions as F

    from etl_project_spark.operators import multimodal as MM

    vids = mm_table.filter("modality = 'video'")
    out = MM.sample_frames(vids, frame_bytes=256, stride=4)
    got = {r.id: r.n for r in out.groupBy("id").agg(F.count(F.lit(1)).alias("n")).collect()}
    want = {
        r.id: (((r.nb + 255) // 256) + 3) // 4  # ceil(n_frames / stride)
        for r in vids.select("id", F.octet_length("payload").alias("nb")).collect()
    }
    assert got == want
