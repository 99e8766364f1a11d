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
    df = MM.make_multimodal_table(docs).cache()
    yield df
    df.unpersist()


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


def test_bmp_decode_real_roundtrip(spark):
    """The BMP path is REAL decode: genuine header/pixel bytes in, and
    the parser must invert the encoding exactly — including the 4-byte
    row padding and bottom-up row order a naive slicer would get wrong."""
    import math

    import numpy as np

    # width 3 → stride 12 (padding exercised); asymmetric h
    px = (np.arange(5 * 3 * 3).reshape(5, 3, 3) % 256).astype(np.uint8)
    payload = MM.encode_bmp(px)
    assert payload[:2] == b"BM"
    got = MM.decode_bmp(payload)
    luma = (
        299 * px[:, :, 2].astype(int)
        + 587 * px[:, :, 1].astype(int)
        + 114 * px[:, :, 0].astype(int)
    ) // 1000
    want_mean = math.floor(luma.sum() / luma.size * 1e4 + 0.5) / 1e4
    assert got == {"width": 3, "height": 5, "n_channels": 3, "mean_luma": want_mean}
    # dispatch: decode_payload routes BM magic to the real decoder
    assert MM.decode_payload(payload, "image") == got


def test_bmp_table_decodes_through_spark(spark):
    """make_bmp_table → decode_images(decode_payload) end to end: the
    decoded stats must equal the pixel-generation arithmetic for every
    image doc (the same claim the q_bmp_decoded_stats oracle hashes)."""
    import math

    import numpy as np

    docs = read_table(spark, SF_ORACLE, "documents")
    bmp = MM.make_bmp_table(docs)
    decoded = {r.id: r for r in MM.decode_images(bmp, decoder=MM.decode_payload).collect()}
    ids = [r.doc_id for r in docs.filter("doc_id % 4 = 0").select("doc_id").collect()]
    assert sorted(decoded) == sorted(ids)
    for doc_id in ids[:20]:
        w = 4 + doc_id % 13
        h = 4 + (3 * doc_id) % 11
        y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        base = doc_id + 7 * y + 3 * x
        luma = (
            299 * ((base + 22) % 256) + 587 * ((base + 11) % 256) + 114 * (base % 256)
        ) // 1000
        want = math.floor(luma.sum() / (w * h) * 1e4 + 0.5) / 1e4
        r = decoded[doc_id]
        assert (r.width, r.height, r.n_channels) == (w, h, 3)
        assert r.mean_luma == want


def test_audio_stats_skip_empty_payloads(spark):
    """Empty/NULL audio payloads emit NO row (round-5 advice): the
    contract must hold on a corpus that HAS empties, not by luck."""
    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, bytearray(b"")), (3, None)],
        "id long, payload binary",
    )
    rows = MM.audio_waveform_stats(df).collect()
    assert [r.id for r in rows] == [1]
    assert rows[0].n_samples == 3 and rows[0].peak_level == ord("c")


def test_wav_decode_real_roundtrip(spark):
    """RIFF/WAVE parse is REAL: chunk walk (including skipping an
    unknown odd-sized chunk with word-alignment padding), fmt field
    parse, PCM sample extraction — against genuine container bytes."""
    import math
    import struct

    import numpy as np

    s = (5 * 9 + 11 * np.arange(59)) % 256
    payload = MM.encode_wav(s, 8250)
    got = MM.decode_wav(payload)
    a = s.astype(float)
    r4 = lambda x: math.floor(x * 1e4 + 0.5) / 1e4  # noqa: E731
    assert got == {
        "sample_rate": 8250,
        "n_channels": 1,
        "bits_per_sample": 8,
        "n_samples": 59,
        "mean_level": r4(a.mean()),
        "peak_level": int(a.max()),
        "rms": r4(float(np.sqrt((a**2).mean()))),
    }
    # odd-sized unknown chunk between fmt and data must be skipped
    extra = b"LIST" + struct.pack("<I", 5) + b"abcde" + b"\x00"
    hacked = payload[:36] + extra + payload[36:]
    hacked = hacked[:4] + struct.pack("<I", len(hacked) - 8) + hacked[8:]
    assert MM.decode_wav(hacked) == got
    # 16-bit signed path
    s16 = np.array([-32768, 0, 32767, 100], dtype="<i2")
    w16 = (
        b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
        + b"data" + struct.pack("<I", 8) + s16.tobytes()
    )
    d16 = MM.decode_wav(w16)
    assert (d16["bits_per_sample"], d16["n_samples"], d16["peak_level"]) == (16, 4, 32768)


def test_wav_table_decodes_through_spark(spark):
    """make_wav_table → decode_audio end to end matches the sample-rule
    arithmetic (the q_wav_decoded_stats oracle's claim)."""
    import math

    import numpy as np

    docs = read_table(spark, SF_ORACLE, "documents")
    decoded = {r.id: r for r in MM.decode_audio(MM.make_wav_table(docs)).collect()}
    ids = [r.doc_id for r in docs.filter("doc_id % 4 = 1").select("doc_id").collect()]
    assert sorted(decoded) == sorted(ids)
    for doc_id in ids[:15]:
        n = 32 + (3 * doc_id) % 57
        a = ((5 * doc_id + 11 * np.arange(n)) % 256).astype(float)
        r = decoded[doc_id]
        assert (r.sample_rate, r.n_channels, r.bits_per_sample, r.n_samples) == (
            8000 + 250 * (doc_id % 4), 1, 8, n,
        )
        assert r.mean_level == math.floor(a.mean() * 1e4 + 0.5) / 1e4
        assert r.peak_level == int(a.max())


def test_png_decode_real_roundtrip():
    """encode_png → png_rgb_grid recovers exact pixels; decode_png's
    luma matches the integer BT.601 rule; corrupted CRC is rejected."""
    import math

    import numpy as np
    import pytest as _pytest

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    payload = MM.encode_png(px)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    assert (MM.png_rgb_grid(payload) == px).all()
    d = MM.decode_png(payload)
    luma = (
        299 * px[:, :, 0].astype(int)
        + 587 * px[:, :, 1].astype(int)
        + 114 * px[:, :, 2].astype(int)
    ) // 1000
    want = math.floor(luma.sum() / luma.size * 1e4 + 0.5) / 1e4
    assert (d["width"], d["height"], d["mean_luma"]) == (5, 6, want)
    corrupted = payload[:20] + bytes([payload[20] ^ 0xFF]) + payload[21:]
    with _pytest.raises(ValueError, match="CRC"):
        MM.png_rgb_grid(corrupted)


def test_png_decoder_handles_all_filter_types():
    """The decoder is a real PNG decoder, not an inverse of our
    encoder: rows filtered with Sub/Up/Average/Paeth all unfilter
    back to the original pixels."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.default_rng(5)
    h, w = 5, 4
    stride = w * 3
    rows = rng.integers(0, 256, (h, stride), dtype=np.uint8)

    def filt(y, ftype):
        line = rows[y].astype(int)
        prev = rows[y - 1].astype(int) if y > 0 else np.zeros(stride, int)
        out = []
        for i in range(stride):
            a = int(rows[y][i - 3]) if i >= 3 else 0
            b = int(prev[i])
            c = int(prev[i - 3]) if (i >= 3 and y > 0) else 0
            if ftype == 0:
                v = line[i]
            elif ftype == 1:
                v = line[i] - a
            elif ftype == 2:
                v = line[i] - b
            elif ftype == 3:
                v = line[i] - (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = line[i] - pred
            out.append(v % 256)
        return bytes([ftype]) + bytes(out)

    raw = b"".join(filt(y, y % 5) for y in range(h))

    def chunk(tag, data):
        body = tag + data
        return (
            struct.pack("!I", len(data))
            + body
            + struct.pack("!I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack("!IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (MM.png_rgb_grid(png).reshape(h, stride) == rows).all()


def test_png_table_decodes_through_spark(spark):
    """make_png_table → decode_images end to end matches the pixel-rule
    arithmetic (the q_png_decoded_stats oracle's claim)."""
    docs = read_table(spark, SF_ORACLE, "documents")
    decoded = {r.id: r for r in
               MM.decode_images(MM.make_png_table(docs),
                                decoder=MM.decode_payload).collect()}
    ids = [r.doc_id for r in
           docs.filter("doc_id % 4 = 0").select("doc_id").collect()]
    assert sorted(decoded) == sorted(ids)
    for doc_id in ids[:10]:
        r = decoded[doc_id]
        assert (r.width, r.height) == (4 + doc_id % 11, 4 + (5 * doc_id) % 9)


# --- JPEG codec (operators/jpeg.py) ---------------------------------------

def test_jpeg_block_constant_roundtrip_is_exact():
    """The oracle family's exactness claim: block-constant even-valued
    grayscale survives the lossy codec bit-for-bit."""
    import numpy as np

    from etl_project_spark.operators import jpeg as J

    for doc_id in (1, 5, 13, 21, 101):
        wb, hb = 1 + doc_id % 3, 1 + (doc_id // 3) % 3
        by, bx = np.meshgrid(np.arange(hb), np.arange(wb), indexing="ij")
        v = (2 * ((3 * doc_id + 7 * bx + 11 * by) % 128)).astype(np.uint8)
        px = np.kron(v, np.ones((8, 8), dtype=np.uint8))
        out = J.decode_jpeg_grid(J.encode_jpeg(px))
        assert out.shape == px.shape
        assert np.array_equal(out, px)


def test_jpeg_roundtrip_error_bounds_general():
    """General images (AC coefficients, DC prediction, color transform,
    edge padding on non-multiple-of-8 dims) roundtrip within lossy
    bounds: near-exact on smooth content, sane on noise."""
    import numpy as np

    from etl_project_spark.operators import jpeg as J

    y, x = np.meshgrid(np.arange(32), np.arange(48), indexing="ij")
    smooth = ((x * 3 + y * 2) % 256).astype(np.uint8)
    err = np.abs(
        J.decode_jpeg_grid(J.encode_jpeg(smooth)).astype(int) - smooth.astype(int)
    )
    assert err.max() <= 8

    color = np.stack(
        [(x * 2 + y) % 256, (x + y * 2) % 256, (255 - x) % 256], axis=-1
    ).astype(np.uint8)
    out = J.decode_jpeg_grid(J.encode_jpeg(color))
    assert out.shape == color.shape == (32, 48, 3)
    err = np.abs(out.astype(int) - color.astype(int))
    assert err.max() <= 24 and err.mean() <= 4

    rng = np.random.default_rng(11)
    noisy = rng.integers(0, 256, size=(13, 21, 3), dtype=np.uint8)
    out = J.decode_jpeg_grid(J.encode_jpeg(noisy))
    assert out.shape == (13, 21, 3)  # original dims, not padded


def test_jpeg_decoder_rejects_unsupported_streams():
    """The decoder raises on out-of-scope streams, never guesses."""
    import numpy as np
    import pytest as _pytest

    from etl_project_spark.operators import jpeg as J

    px = np.full((8, 8), 100, dtype=np.uint8)
    good = bytearray(J.encode_jpeg(px))
    with _pytest.raises(ValueError):
        J.decode_jpeg_grid(b"\x00\x01not a jpeg")
    # flip SOF0 (FFC0) to SOF2 (FFC2) = progressive
    i = bytes(good).find(b"\xff\xc0")
    prog = bytes(good[:i]) + b"\xff\xc2" + bytes(good[i + 2:])
    with _pytest.raises(NotImplementedError):
        J.decode_jpeg_grid(prog)
    # corrupt a sampling factor to 4:2:0
    sof = bytes(good).find(b"\xff\xc0")
    sub = bytearray(good)
    sub[sof + 11] = 0x22  # component 1 sampling 2x2
    with _pytest.raises(NotImplementedError):
        J.decode_jpeg_grid(bytes(sub))


def test_jpeg_table_decodes_through_spark(spark):
    """make_jpeg_table → decode_images end to end matches the pixel
    rule (the q_jpeg_decoded_stats oracle's claim)."""
    docs = read_table(spark, SF_ORACLE, "documents")
    decoded = {r.id: r for r in
               MM.decode_images(MM.make_jpeg_table(docs),
                                decoder=MM.decode_payload).collect()}
    ids = [r.doc_id for r in
           docs.filter("doc_id % 4 = 1").select("doc_id").collect()]
    assert sorted(decoded) == sorted(ids)
    for doc_id in ids[:10]:
        r = decoded[doc_id]
        assert (r.width, r.height) == (
            8 * (1 + doc_id % 3), 8 * (1 + (doc_id // 3) % 3))
        assert r.n_channels == 1


def test_gif_lzw_roundtrip_and_corners():
    """LZW codec: KwKwK sequences, width growth, and the
    end-of-stream boundary where the decoder's final table add widens
    the EOI read (11 emissions at min code size 2)."""
    import numpy as np

    from etl_project_spark.operators.multimodal import (
        _lzw_decode_gif,
        _lzw_encode_gif,
    )

    rng = np.random.RandomState(7)
    cases = [
        [1, 1, 1, 1, 1, 1, 1],  # KwKwK
        [0, 1, 2, 3, 3, 0, 1, 2, 2, 3, 0, 1, 1, 2, 3, 0],  # EOI boundary
        list(rng.randint(0, 4, 5000)),  # several width bumps
        list(rng.randint(0, 7, 3000)),
        [0],
    ]
    for L in range(1, 120):
        cases.append(list(rng.randint(0, 4, L)))
    for seq in cases:
        mcs = 2 if max(seq) < 4 else 3
        enc = _lzw_encode_gif(seq, mcs)
        assert _lzw_decode_gif(enc, mcs) == [int(v) for v in seq]


def test_gif_known_byte_stream():
    """Hand-computed LZW bytes for [1,1,0,0] at min code size 2 —
    guards against symmetric encoder/decoder bugs (e.g. MSB-first
    packing on both sides) that a roundtrip test cannot see."""
    from etl_project_spark.operators.multimodal import _lzw_encode_gif

    # codes: CLEAR(100) 1(001) 1(001) 0(000) at 3 bits, then 0(0000)
    # EOI(0101) at 4 bits, packed LSB-first → 0x4C 0x00 0x05
    assert _lzw_encode_gif([1, 1, 0, 0], 2) == bytes([0x4C, 0x00, 0x05])


def test_gif_decode_real_roundtrip_and_dispatch():
    """encode_gif → gif_index_grid recovers indices AND palette; the
    decode_payload dispatcher routes GIF87a/89a signatures; extension
    blocks are skipped; interlace/LCT flags raise the documented
    NotImplementedError."""
    import numpy as np
    import pytest as _pt

    from etl_project_spark.operators.multimodal import (
        decode_payload,
        encode_gif,
        gif_index_grid,
    )

    idx = np.arange(30, dtype=np.uint8).reshape(5, 6) % 5
    pal = [(10 * c, 20 * c, 30 * c) for c in range(5)]
    payload = encode_gif(idx, pal)
    grid, palette = gif_index_grid(payload)
    assert (grid == idx).all()
    assert (palette[:5] == np.array(pal)).all()
    d = decode_payload(payload, "image")
    assert (d["width"], d["height"], d["n_channels"]) == (6, 5, 3)

    # splice a graphic-control extension before the image descriptor
    sep = payload.index(b"\x2c")
    ext = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    with_ext = payload[:sep] + ext + payload[sep:]
    grid2, _ = gif_index_grid(with_ext)
    assert (grid2 == idx).all()

    # interlace flag set → documented boundary
    interlaced = bytearray(payload)
    interlaced[sep + 9] |= 0x40
    with _pt.raises(NotImplementedError):
        gif_index_grid(bytes(interlaced))


def test_gif_table_decodes_through_spark(spark):
    """make_gif_table payloads decode through the Spark mapInPandas
    path to the doc_id-arithmetic dimensions."""
    from pyspark.sql import functions as F

    from etl_project_spark.catalog import read_table
    from etl_project_spark.operators import multimodal as MM
    from tests.conftest import SF_ORACLE

    docs = read_table(spark, SF_ORACLE, "documents").filter(F.col("doc_id") < 60)
    out = MM.decode_images(
        MM.make_gif_table(docs), decoder=MM.decode_payload
    ).collect()
    assert out
    for r in out:
        assert r.width == 4 + r.id % 10
        assert r.height == 4 + (7 * r.id) % 8
        assert r.n_channels == 3
        assert 0.0 <= r.mean_luma <= 255.0


def test_lzw_encode_empty_sequence_is_contract_error():
    """A zero-area grid must fail with an explicit ValueError, not a
    bare IndexError from seq[0] (ADVICE r12)."""
    import pytest as _pytest

    from etl_project_spark.operators.multimodal import _lzw_encode_gif

    with _pytest.raises(ValueError, match="empty index sequence"):
        _lzw_encode_gif([], 2)
