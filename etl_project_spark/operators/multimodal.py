"""Multimodal column operators: images/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Python stages.

The reference is text-only; this is north-star surface for an LLM
training-data pipeline at 100 TB:

- A multimodal table is ``(id, modality, payload binary, meta struct)``.
  Payloads stay opaque to Catalyst — only metadata columns participate
  in pruning/filtering, so a filter on ``meta.width`` never deserializes
  a payload.
- Byte-level feature extraction (size, entropy, magic-number sniffing)
  is REAL and runs vectorized over Arrow batches via ``mapInPandas``.
- Image decode (BMP, PNG, baseline JPEG) and PCM WAV decode are REAL
  — pure stdlib/numpy parsers and codecs, no imaging library. Video
  (and non-baseline JPEG / non-PCM WAV) stay behind clearly-marked
  ``NotImplementedError`` seams in :func:`decode_payload` — the
  Spark-side contract (schema, batching, partition shape) is
  identical for a plugged-in codec.

Scale notes: payload work is embarrassingly parallel — no shuffle at
all; ``maxPartitionBytes`` governs batch size. Feature extraction emits
narrow rows (drop the payload as early as possible so downstream
stages never shuffle binary blobs).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Magic numbers for payload sniffing (public file-format signatures).
_MAGIC = (
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"RIFF", "audio/wav-or-avi"),
    (b"ID3", "audio/mp3"),
    (b"\x1aE\xdf\xa3", "video/webm-or-mkv"),
    (b"%PDF", "application/pdf"),
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sniffed_type", T.StringType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("payload_hash", T.LongType()),
    ]
)


def sniff_type(payload: bytes | None) -> str:
    if not payload:
        return "empty"
    for magic, name in _MAGIC:
        if payload.startswith(magic):
            return name
    return "unknown"


def byte_entropy(payload: bytes | None) -> float:
    """Shannon entropy of the byte histogram (0.0–8.0 bits)."""
    if not payload:
        return 0.0
    counts: dict[int, int] = {}
    for b in payload:
        counts[b] = counts.get(b, 0) + 1
    n = len(payload)
    return -sum(c / n * math.log2(c / n) for c in counts.values())


def extract_features(df: DataFrame, *, id_col: str = "id",
                     modality_col: str = "modality",
                     payload_col: str = "payload") -> DataFrame:
    """Vectorized byte-level features per payload (real, no decode).

    Emits narrow rows only — the binary column does not survive this
    operator, so downstream shuffles never move blobs.
    """
    cols = [id_col, modality_col, payload_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "modality": pdf[modality_col],
                    "n_bytes": payloads.map(lambda p: 0 if p is None else len(p)).astype("int64"),
                    "sniffed_type": payloads.map(sniff_type),
                    "byte_entropy": payloads.map(byte_entropy),
                    "payload_hash": payloads.map(
                        lambda p: _fnv1a64(p) if p is not None else 0
                    ).astype("int64"),
                }
            )

    return df.select(*cols).mapInPandas(run, schema=FEATURE_SCHEMA)


def _fnv1a64(data: bytes) -> int:
    """FNV-1a 64-bit — deterministic content hash for exact payload dedup."""
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) % 2**64
    return h - 2**64 if h >= 2**63 else h  # wrap to signed long


DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def decode_payload(payload: bytes, modality: str):
    """Media decode seam: REAL for every image format this engine
    emits, honest stub for the rest.

    BMP (``BM`` magic) decodes for real via :func:`decode_bmp` — pure
    byte arithmetic, no imaging library. PNG decodes for real via
    :func:`decode_png` — stdlib ``zlib`` inflate plus full spec
    unfiltering (filters 0–4 incl. Paeth). Baseline JPEG decodes for
    real via :mod:`operators.jpeg` — marker walk, stream-declared
    Huffman tables, entropy decode with DC prediction, dequant, float
    IDCT, YCbCr→RGB (progressive/subsampled streams raise there).
    Video decode requires codec libraries not present in this
    environment and raises; plug a real codec into
    ``decode_images(decoder=...)`` — the Spark plumbing is identical.
    """
    if payload is not None and payload[:2] == b"BM":
        return decode_bmp(payload, modality)
    if payload is not None and payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload, modality)
    if payload is not None and payload[:3] == b"\xff\xd8\xff":
        from etl_project_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload, modality)
    if payload is not None and payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload, modality)
    raise NotImplementedError(
        "video decode requires codec libraries; BMP, PNG, GIF, and "
        "baseline JPEG decode natively — plug other decoders into "
        "decode_images(decoder=...)"
    )


def encode_bmp(pixels) -> bytes:
    """Encode an ``(h, w, 3) uint8`` BGR array as a real uncompressed
    24-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, 4-byte-padded
    bottom-up rows) — the standard Windows DIB layout.

    Used by the fixture side of the BMP pipeline so the decoder is
    exercised against genuine format bytes, not a fake.
    """
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px.reshape(h, w * 3)
    body = rows[::-1].tobytes()  # bottom-up row order
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + len(body), 0, 0, 54,            # file header
        40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0,  # info header
    )
    return header + body


def decode_bmp(payload: bytes, modality: str = "image") -> dict:
    """REAL image decoder for uncompressed 24-bit BMP — pure byte
    arithmetic (struct header parse + numpy pixel math), no codec lib.

    Parses the BITMAPFILEHEADER/BITMAPINFOHEADER fields it depends on
    (pixel-array offset, signed width/height, bit depth, compression),
    honors bottom-up vs top-down row order and 4-byte row padding, and
    computes mean luma over the ACTUAL pixel bytes with the integer
    ITU-R BT.601 weights ``(299·R + 587·G + 114·B) div 1000`` — exact
    arithmetic, so an SQL oracle that knows the pixel-generation rule
    replays the decoded stats bit-for-bit. Returns the
    :func:`decode_images` decoder contract.
    """
    # single parser: bmp_luma_grid owns the byte-level decode (header,
    # stride, row order, BT.601); this wrapper only adds the stats
    luma = bmp_luma_grid(payload)
    h, w = luma.shape
    mean = int(luma.sum()) / (h * w)
    return {
        "width": w,
        "height": h,
        "n_channels": 3,
        # half-up at 4 decimals (SQL ROUND semantics, not banker's)
        "mean_luma": math.floor(mean * 10_000 + 0.5) / 10_000,
    }


def _fake_image_decoder(payload: bytes, modality: str) -> dict:
    """Deterministic stand-in decoder used to exercise the plumbing:
    derives plausible dimensions/stats from payload bytes alone.

    md5-based (not fnv) so an ANSI-SQL oracle can replay it exactly —
    the two digest halves read as big-endian uint64s match DuckDB's
    ``CAST('0x' || substr(md5(x), 1|17, 16) AS UBIGINT)``.
    """
    import hashlib

    d = hashlib.md5(payload or b"").digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big")
    return {
        "width": 16 + h1 % 1920,
        "height": 16 + (h1 >> 11) % 1080,
        "n_channels": 1 + h2 % 4,
        "mean_luma": round((h2 >> 11) % 256 / 255.0, 6),
    }


def decode_images(
    df: DataFrame,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    modality_col: str = "modality",
    decoder=None,
) -> DataFrame:
    """Decode image payloads to typed metadata rows (Arrow-batched).

    ``decoder=None`` uses :func:`decode_payload` (raises — the honest
    stub); tests pass the deterministic fake to exercise the batching,
    schema, and partition behavior that a real decoder would use.
    """
    decode = decoder or decode_payload

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, p, m in zip(pdf[id_col], pdf[payload_col], pdf[modality_col]):
                d = decode(p, m)
                out.append(
                    {
                        "id": int(i),
                        "width": d["width"],
                        "height": d["height"],
                        "n_channels": d["n_channels"],
                        "mean_luma": d["mean_luma"],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_IMAGE_SCHEMA.fields])

    return df.select(id_col, payload_col, modality_col).mapInPandas(
        run, schema=DECODED_IMAGE_SCHEMA
    )


def make_multimodal_table(docs: DataFrame) -> DataFrame:
    """Derive a multimodal-shaped table from the documents corpus.

    The corpus has no binary media; payloads here are the UTF-8 bytes of
    each document (deterministic, oracle-mirrorable via ``encode()``),
    with modality assigned round-robin — enough to exercise every
    operator in this module with verifiable results.
    """
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video"), F.lit("text")),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("id"),
        modality.alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("n_chars").alias("n_chars"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def make_bmp_table(docs: DataFrame) -> DataFrame:
    """Derive an image table with REAL BMP payloads from the documents
    corpus: one ``(id, payload)`` row per image-modality doc
    (``doc_id % 4 = 0``), each payload a genuine 24-bit BMP built by
    :func:`encode_bmp`.

    Dimensions and pixels are pure ``doc_id`` arithmetic so an SQL
    oracle can replay the decoded stats without parsing bytes:
    ``w = 4 + doc_id % 13``, ``h = 4 + (3·doc_id) % 11``, and channel
    ``c ∈ {0:B, 1:G, 2:R}`` of pixel ``(x, y)`` is
    ``(doc_id + 7·y + 3·x + 11·c) mod 256``. The BYTES are real —
    the decoder must parse the actual header and pixel array (padding,
    bottom-up rows) to recover these values.
    """
    from collections.abc import Iterator as _It

    import numpy as np

    def build(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 4 + doc_id % 13
                h = 4 + (3 * doc_id) % 11
                y, x, c = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                px = ((doc_id + 7 * y + 3 * x + 11 * c) % 256).astype(np.uint8)
                ids.append(doc_id)
                payloads.append(encode_bmp(px))
            yield pd.DataFrame(
                {"id": ids, "payload": payloads, "modality": "image"}
            )

    return (
        docs.filter((F.col("doc_id") % 4) == 0)
        .select("doc_id")
        .mapInPandas(build, schema="id long, payload binary, modality string")
    )


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("resized_md5", T.StringType()),
    ]
)


def resize_images(
    df: DataFrame,
    *,
    out_width: int = 64,
    out_height: int = 64,
    decoder=None,
    id_col: str = "id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize stage plumbing: image rows → resized-image metadata rows.

    Same seam as :func:`decode_images` — Arrow-batched ``mapInPandas``,
    payload consumed inside the stage and dropped from the output so
    the blob never shuffles. A real implementation swaps ``decoder``
    for PIL decode+resize (stubbed here: the container has no imaging
    libs — :func:`decode_payload` raises ``NotImplementedError``); the
    deterministic fake keeps the batch shape, schema, and pruning
    testable. ``resized_md5`` stands in for the output payload hash.
    """
    import hashlib

    decoder = decoder or decode_payload
    cols = [id_col, payload_col]

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            # NULL payloads (e.g. NULL source text) decode as empty —
            # same contract as extract_features; bytes(None) would kill
            # the whole Arrow batch task otherwise.
            payloads = [b"" if p is None else bytes(p) for p in pdf[payload_col]]
            meta = [decoder(p, "image") for p in payloads]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "out_width": out_width,
                    "out_height": out_height,
                    "resized_md5": [
                        hashlib.md5(
                            p + f"{out_width}x{out_height}".encode()
                        ).hexdigest()
                        for p in payloads
                    ],
                }
            )

    return df.select(*cols).mapInPandas(run, schema=RESIZED_IMAGE_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_offset_s", T.DoubleType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    *,
    frame_bytes: int = 256,
    stride: int = 4,
    fps: float = 24.0,
    id_col: str = "id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing: video rows → one row per sampled frame.

    The fake "codec" treats each ``frame_bytes`` slice of the payload
    as one frame (a real implementation swaps the slicer for pyav/
    ffmpeg frame decode — not in this container). Every sampled frame
    emits typed metadata (index, timestamp at ``fps``) plus the md5 of
    its bytes; rows multiply ~len/(frame_bytes·stride) per video while
    the payload itself stays stage-local.
    """
    import hashlib

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            ids, idxs, offs, fps_out = [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                raw = b"" if p is None else bytes(p)  # NULL payload → no frames
                n_frames = (len(raw) + frame_bytes - 1) // frame_bytes
                for k in range(0, n_frames, stride):
                    ids.append(i)
                    idxs.append(k)
                    offs.append(round(k / fps, 6))
                    fps_out.append(
                        hashlib.md5(raw[k * frame_bytes:(k + 1) * frame_bytes]).hexdigest()
                    )
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "ts_offset_s": offs, "frame_md5": fps_out}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def encode_wav(samples, sample_rate: int) -> bytes:
    """Encode mono 8-bit unsigned PCM as a real RIFF/WAVE file
    (``RIFF`` header, ``fmt `` chunk, ``data`` chunk) — the standard
    canonical-WAV layout, no audio library involved.
    """
    import struct

    import numpy as np

    data = np.asarray(samples, dtype=np.uint8).tobytes()
    channels, bits = 1, 8
    byte_rate = sample_rate * channels * bits // 8
    block_align = channels * bits // 8
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, block_align, bits
        )
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def wav_pcm_samples(payload: bytes):
    """Single RIFF/WAVE parser: walk the chunk list (word-aligned,
    unknown chunks skipped), parse ``fmt ``, and return
    ``(sample_rate, channels, bits, samples_f64)``. Both the stats
    decoder and the spectral operator consume THIS — one parser, the
    BMP lesson applied to audio."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    off = 12
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        (size,) = struct.unpack_from("<I", payload, off + 4)
        body = payload[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only uncompressed PCM 8/16-bit WAV supported "
            f"(format={audio_format}, bits={bits})"
        )
    if bits == 8:
        a = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
    else:
        a = np.frombuffer(data, dtype="<i2").astype(np.float64)
    return int(sample_rate), int(channels), int(bits), a


def decode_wav(payload: bytes, modality: str = "audio") -> dict:
    """REAL audio container decoder for uncompressed PCM WAV — walks
    the RIFF chunk list (skipping unknown chunks with even-byte
    padding, as the format requires), parses the ``fmt `` fields, and
    computes waveform stats over the ``data`` chunk's actual samples.

    Supports PCM (format 1) at 8-bit unsigned and 16-bit signed LE —
    the two canonical raw encodings; anything compressed raises. Level
    stats use the same half-up 4-decimal rounding as
    :func:`audio_waveform_stats` so an SQL oracle that knows the
    sample-generation rule replays them exactly.
    """
    import numpy as np

    sample_rate, channels, bits, a = wav_pcm_samples(payload)
    n = a.size // max(channels, 1)

    def round4(x: float) -> float:
        return math.floor(x * 10_000 + 0.5) / 10_000

    return {
        "sample_rate": int(sample_rate),
        "n_channels": int(channels),
        "bits_per_sample": int(bits),
        "n_samples": int(n),
        "mean_level": round4(float(a.mean())) if a.size else 0.0,
        "peak_level": int(np.abs(a).max()) if a.size else 0,
        "rms": round4(float(np.sqrt((a**2).mean()))) if a.size else 0.0,
    }


WAV_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("mean_level", T.DoubleType()),
        T.StructField("peak_level", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def decode_audio(
    df: DataFrame,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    decoder=decode_wav,
) -> DataFrame:
    """Decode audio containers to typed waveform rows (Arrow-batched
    ``mapInPandas`` — the audio twin of :func:`decode_images`).
    Payloads are consumed inside the stage; only narrow rows shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                d = decoder(bytes(p) if p is not None else None, "audio")
                d = {"id": int(i), **d}
                out.append(d)
            yield pd.DataFrame(
                out, columns=[f.name for f in WAV_DECODED_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=WAV_DECODED_SCHEMA)


def make_wav_table(docs: DataFrame) -> DataFrame:
    """Audio table with REAL WAV payloads, one per audio-modality doc
    (``doc_id % 4 = 1``): mono 8-bit PCM built by :func:`encode_wav`.

    Sample values and rate are pure ``doc_id`` arithmetic so an SQL
    oracle replays the decoded stats without parsing bytes:
    ``n = 32 + (3·doc_id) % 57``, ``rate = 8000 + 250·(doc_id % 4)``,
    ``sample[i] = (5·doc_id + 11·i) mod 256``. The bytes are real —
    the decoder must walk the chunk list and parse ``fmt `` to recover
    them.
    """
    from collections.abc import Iterator as _It

    import numpy as np

    def build(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 32 + (3 * doc_id) % 57
                rate = 8000 + 250 * (doc_id % 4)
                samples = (5 * doc_id + 11 * np.arange(n)) % 256
                ids.append(doc_id)
                payloads.append(encode_wav(samples, rate))
            yield pd.DataFrame(
                {"id": ids, "payload": payloads, "modality": "audio"}
            )

    return (
        docs.filter((F.col("doc_id") % 4) == 1)
        .select("doc_id")
        .mapInPandas(build, schema="id long, payload binary, modality string")
    )


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("mean_level", T.DoubleType()),
        T.StructField("peak_level", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_waveform_stats(
    df: DataFrame, *, id_col: str = "id", payload_col: str = "payload"
) -> DataFrame:
    """Waveform-level stats per audio payload, treating bytes as u8 PCM
    samples: sample count, mean level, peak, RMS.

    The audio twin of :func:`extract_features` — real DSP-shaped work
    (numpy ``frombuffer`` → vectorized mean/max/RMS over the whole
    Arrow batch), no codec needed: level statistics are
    representation-agnostic, so unlike decode this path is NOT a stub.
    Emits narrow rows only; payloads never shuffle.

    Empty/NULL payloads emit NO row (there is no waveform to profile):
    this matches the per-sample aggregation an SQL twin performs — a
    GROUP BY over zero samples produces zero groups — so the contract
    is corpus-independent instead of relying on the corpus having no
    empty audio (round-5 advice). Upstream profiling of empties is
    :func:`extract_features`' job (``n_bytes = 0`` rows).
    """
    import math

    import numpy as np

    def round4(x: float) -> float:
        # HALF-UP, not Python's banker's rounding: a byte mean like
        # 93.90625 is an exact decimal tie, and SQL ROUND (the oracle)
        # rounds it up while round() would round to even.
        return math.floor(x * 10_000 + 0.5) / 10_000

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            ids, ns, means, peaks, rms_out = [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                a = np.frombuffer(
                    b"" if p is None else bytes(p), dtype=np.uint8
                ).astype(np.float64)
                if not a.size:
                    continue  # no waveform → no row (see docstring)
                ids.append(i)
                ns.append(a.size)
                means.append(round4(float(a.mean())))
                peaks.append(int(a.max()))
                rms_out.append(round4(float(np.sqrt((a**2).mean()))))
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "mean_level": means,
                    "peak_level": pd.Series(peaks, dtype="int32"),
                    "rms": rms_out,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=AUDIO_STATS_SCHEMA)


# --------------------------------------------------------------------------
# Perceptual hashing over REAL decoded pixels: 16-bit average-hash.
# --------------------------------------------------------------------------
def bmp_luma_grid(payload: bytes):
    """Parse a 24-bit BMP payload to its ``(h, w)`` integer-luma array
    (same header/stride/row-order handling as :func:`decode_bmp`)."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_off,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = height < 0
    h, w = abs(height), width
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=pixel_off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    bgr = rows.astype(np.int64)
    return (299 * bgr[:, :, 2] + 587 * bgr[:, :, 1] + 114 * bgr[:, :, 0]) // 1000


def ahash16(payload: bytes) -> int:
    """16-bit average-hash of a BMP image: block-average the luma plane
    onto a 4×4 grid, set bit ``cy·4 + cx`` iff that cell's mean luma
    exceeds the image's global mean.

    All-integer decision rule (``cell_sum · n_pixels > total_sum ·
    cell_n`` — cross-multiplied, no floats), so an SQL oracle that
    knows the pixel rule reproduces the hash exactly. Pixel ``(x, y)``
    maps to cell ``((y·4)//h, (x·4)//w)`` — every cell is non-empty for
    the fixture's w, h ≥ 4.
    """
    import numpy as np

    luma = bmp_luma_grid(payload)
    h, w = luma.shape
    cy = (np.arange(h) * 4) // h
    cx = (np.arange(w) * 4) // w
    cell = cy[:, None] * 4 + cx[None, :]
    cs = np.bincount(cell.ravel(), weights=luma.ravel(), minlength=16).astype(np.int64)
    cn = np.bincount(cell.ravel(), minlength=16).astype(np.int64)
    ts = int(luma.sum())
    tn = h * w
    bits = cs * tn > ts * cn
    return int(sum(1 << j for j in range(16) if bits[j]))


PHASH_SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("phash", T.LongType())]
)


def phash_images(
    df: DataFrame, *, id_col: str = "id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched perceptual-hash stage: ``(id, phash)`` per image."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": [int(i) for i in pdf[id_col]],
                    "phash": [ahash16(p) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=PHASH_SCHEMA)


WAV_SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("power_bin1", T.DoubleType()),
        T.StructField("power_bin2", T.DoubleType()),
        T.StructField("power_bin3", T.DoubleType()),
    ]
)


def wav_spectral_power(
    df: DataFrame, *, id_col: str = "id", payload_col: str = "payload", bins=(1, 2, 3)
) -> DataFrame:
    """DFT power at low frequency bins over REAL decoded WAV samples:
    ``P_k = (Σ x̃_i·cos(2πki/n))² + (Σ x̃_i·sin(2πki/n))²`` with the
    mean-removed signal x̃ — explicit Goertzel-style sums (not an FFT
    library call) so an SQL oracle that knows the sample rule can
    replay the identical arithmetic term by term.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                _rate, _ch, _bits, a = wav_pcm_samples(
                    bytes(p) if p is not None else None
                )
                n = a.size
                x = a - a.mean() if n else a
                row = {"id": int(i), "n_samples": int(n)}
                idx = np.arange(n, dtype=np.float64)
                for k in bins:
                    ang = 2.0 * np.pi * k * idx / n if n else idx
                    re = float((x * np.cos(ang)).sum())
                    im = float((x * np.sin(ang)).sum())
                    row[f"power_bin{k}"] = re * re + im * im
                out.append(row)
            yield pd.DataFrame(
                out, columns=[f.name for f in WAV_SPECTRAL_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=WAV_SPECTRAL_SCHEMA)


def encode_png(pixels, compress_level: int = 6) -> bytes:
    """Build a REAL non-interlaced 8-bit RGB PNG from an (h, w, 3)
    uint8 array — stdlib only: struct chunk framing, zlib IDAT,
    CRC-32 per chunk. Rows are emitted with filter type 0; the
    decoder nevertheless implements the full filter set, so it is a
    decoder for PNGs generally, not just an inverse of this encoder.
    """
    import struct
    import zlib

    h, w, _ = pixels.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return (
            struct.pack("!I", len(data))
            + body
            + struct.pack("!I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack("!IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, RGB
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, compress_level))
        + chunk(b"IEND", b"")
    )


def png_rgb_grid(payload: bytes):
    """REAL PNG decoder for 8-bit RGB non-interlaced images: chunk
    walk with CRC verification, zlib inflate, and full scanline
    unfiltering (types 0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth).
    Returns an (h, w, 3) uint8 numpy array.
    """
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos, w = 8, None
    idat = b""
    while pos < len(payload):
        (ln,) = struct.unpack("!I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack("!I", payload[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                "!IIBBBBB", data
            )
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit RGB non-interlaced PNG supported"
                )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("no IHDR chunk")
    raw = zlib.decompress(idat)
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) % 256
        else:  # Sub / Average / Paeth need the left neighbor serially
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - 3] if i >= 3 else 0  # left (same channel)
                b = int(prev[i])                 # up
                if ftype == 1:
                    cur[i] = (line[i] + a) % 256
                elif ftype == 3:
                    cur[i] = (line[i] + (a + b) // 2) % 256
                elif ftype == 4:
                    c = int(prev[i - 3]) if i >= 3 else 0  # upper-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (line[i] + pred) % 256
                else:
                    raise ValueError(f"bad filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out.reshape(h, w, 3)


def decode_png(payload: bytes, modality: str = "image") -> dict:
    """REAL PNG decode to the :func:`decode_images` contract: inflate +
    unfilter via :func:`png_rgb_grid`, integer BT.601 luma
    ``(299·R + 587·G + 114·B) div 1000`` (RGB sample order per the PNG
    spec — the opposite byte order from BMP's BGR), mean at 4 decimals
    half-up (SQL ROUND semantics).
    """
    import numpy as np

    px = png_rgb_grid(payload).astype(np.int64)
    h, w, _ = px.shape
    luma = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
    mean = int(luma.sum()) / (h * w)
    return {
        "width": w,
        "height": h,
        "n_channels": 3,
        "mean_luma": math.floor(mean * 10_000 + 0.5) / 10_000,
    }


def make_png_table(docs: DataFrame) -> DataFrame:
    """Image table with REAL PNG payloads from the documents corpus
    (``doc_id % 4 = 0``), dimensions/pixels pure doc_id arithmetic so
    SQL can replay the decoded stats: ``w = 4 + doc_id % 11``,
    ``h = 4 + (5·doc_id) % 9``, channel ``c ∈ {0:R, 1:G, 2:B}`` of
    pixel (x, y) is ``(2·doc_id + 5·y + 3·x + 13·c) mod 256`` —
    deliberately different constants and channel order from
    :func:`make_bmp_table` so a BGR/RGB mix-up in either decoder
    cannot cancel out.
    """
    from collections.abc import Iterator as _It

    import numpy as np

    def build(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 4 + doc_id % 11
                h = 4 + (5 * doc_id) % 9
                y, x, c = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                px = ((2 * doc_id + 5 * y + 3 * x + 13 * c) % 256).astype(
                    np.uint8
                )
                ids.append(doc_id)
                payloads.append(encode_png(px))
            yield pd.DataFrame(
                {"id": ids, "payload": payloads, "modality": "image"}
            )

    return (
        docs.filter((F.col("doc_id") % 4) == 0)
        .select("doc_id")
        .mapInPandas(build, schema="id long, payload binary, modality string")
    )


def make_jpeg_table(docs: DataFrame) -> DataFrame:
    """Image table with REAL baseline-JPEG payloads (``doc_id % 4 = 1``
    — disjoint from the PNG family's ``% 4 = 0``), built by the full
    encoder (DCT, Annex-K quantization, Huffman entropy coding, byte
    stuffing).

    The pixel rule is chosen so the LOSSY codec is bit-exact and SQL
    can replay decoded stats: grayscale, constant per 8×8 block, block
    (bx, by) value ``2·((3·doc_id + 7·bx + 11·by) mod 128)``. Constant
    blocks make every AC coefficient exactly 0 and the DC coefficient
    ``16·(v−128)/2``; even values put the /16 quantization ≥0.5 from
    every rounding boundary, so encode→decode returns the input pixels
    exactly (proven by test_jpeg_block_constant_roundtrip_is_exact).
    Dims: ``w = 8·(1 + doc_id mod 3)``, ``h = 8·(1 + (doc_id div 3)
    mod 3)`` — multi-block both ways, so Huffman DC PREDICTION across
    blocks is exercised, not just single-block streams.
    """
    from collections.abc import Iterator as _It

    import numpy as np

    from etl_project_spark.operators.jpeg import encode_jpeg

    def build(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                wb = 1 + doc_id % 3
                hb = 1 + (doc_id // 3) % 3
                by, bx = np.meshgrid(np.arange(hb), np.arange(wb), indexing="ij")
                v = (2 * ((3 * doc_id + 7 * bx + 11 * by) % 128)).astype(np.uint8)
                px = np.kron(v, np.ones((8, 8), dtype=np.uint8))
                ids.append(doc_id)
                payloads.append(encode_jpeg(px))
            yield pd.DataFrame(
                {"id": ids, "payload": payloads, "modality": "image"}
            )

    return (
        docs.filter((F.col("doc_id") % 4) == 1)
        .select("doc_id")
        .mapInPandas(build, schema="id long, payload binary, modality string")
    )


# --------------------------------------------------------------------------
# GIF (GIF87a/89a): real LZW codec. Fifth real media format (after
# BMP, WAV, PNG, JPEG) and the first with a PALETTE indirection — a
# decoder bug that confuses index and color, or mis-syncs the
# variable-width LZW code stream, cannot produce the oracle's stats.
# --------------------------------------------------------------------------
def _lzw_encode_gif(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable-width codes starting at
    ``min_code_size + 1`` bits, LSB-first packing, CLEAR emitted
    first, EOI last. Width grows when ``next_code == 2^width + 1``
    (one later than the decoder's ``== 2^width`` — the standard
    matched pair, compensating the decoder's one-entry lag). Table
    caps at 4096; these payloads never get near it, but the guard
    keeps the codec honest for arbitrary inputs.
    """
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1
    next_code = eoi + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    seq = [int(v) for v in indices]
    if not seq:
        raise ValueError(
            "cannot LZW-encode an empty index sequence (zero-area grid)"
        )
    buf = (seq[0],)
    for k in seq[1:]:
        nk = buf + (k,)
        if nk in table:
            buf = nk
            continue
        emit(table[buf])
        if next_code < 4096:
            table[nk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        buf = (k,)
    emit(table[buf])
    # The decoder performs one more table add AFTER the final data
    # code (the encoder never adds on its flush emission); if that add
    # pushes its table size across 2^width, it will read EOI one bit
    # wider — emulate the bump so EOI is written at the width the
    # decoder expects (n == 2^width − 5 corner, e.g. 11 emissions at
    # min_code_size 2).
    if next_code < 4096 and next_code >= (1 << width) and width < 12:
        width += 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode_gif(data: bytes, min_code_size: int) -> list[int]:
    """Inverse of :func:`_lzw_encode_gif`, including the KwKwK case
    (``code == next_code``) and mid-stream CLEAR resets."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    dict_: dict[int, tuple[int, ...]] = {i: (i,) for i in range(clear)}
    next_code = eoi + 1
    acc = 0
    nbits = 0
    pos = 0
    prev: tuple[int, ...] | None = None
    out: list[int] = []
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated before EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dict_ = {i: (i,) for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code in dict_:
            entry = dict_[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)  # KwKwK
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            dict_[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def encode_gif(indices, palette) -> bytes:
    """Encode an ``(h, w)`` palette-index array as a real GIF89a:
    logical screen descriptor, global color table (padded to the next
    power of two), image descriptor, LZW sub-blocks, trailer."""
    import struct

    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    h, w = idx.shape
    n = len(palette)
    gct_bits = 1
    while (1 << (gct_bits + 1)) < n:
        gct_bits += 1
    entries = 1 << (gct_bits + 1)
    min_code_size = max(2, gct_bits + 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (7 << 4) | gct_bits)  # GCT present, 8-bit color res
    out.append(0)  # background color index
    out.append(0)  # pixel aspect ratio
    for i in range(entries):
        r, g, b = palette[i] if i < n else (0, 0, 0)
        out += bytes((r, g, b))
    out.append(0x2C)
    out += struct.pack("<HHHH", 0, 0, w, h)
    out.append(0)  # no local color table, not interlaced
    out.append(min_code_size)
    data = _lzw_encode_gif(idx.ravel(), min_code_size)
    for lo in range(0, len(data), 255):
        block = data[lo : lo + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def gif_index_grid(payload: bytes):
    """REAL GIF decoder for single-frame GCT images: signature, screen
    descriptor, global color table, extension-block skipping, image
    descriptor, sub-block reassembly, LZW decode. Returns
    ``(index_grid (h, w) int64, palette (entries, 3) uint8)``.
    Interlace and local color tables raise NotImplementedError — a
    format boundary, same contract as the JPEG decoder's progressive
    seam."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    packed = payload[10]
    pos = 13
    palette = None
    if packed & 0x80:
        entries = 2 << (packed & 0x07)
        palette = (
            np.frombuffer(payload, dtype=np.uint8, count=entries * 3, offset=pos)
            .reshape(entries, 3)
            .copy()
        )
        pos += entries * 3
    while True:
        b0 = payload[pos]
        if b0 == 0x21:  # extension introducer: label byte + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:
            break
        elif b0 == 0x3B:
            raise ValueError("GIF trailer before any image data")
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    _, _, iw, ih = struct.unpack_from("<HHHH", payload, pos + 1)
    ipacked = payload[pos + 9]
    pos += 10
    if ipacked & 0x80:
        raise NotImplementedError("GIF local color tables not supported")
    if ipacked & 0x40:
        raise NotImplementedError("interlaced GIF not supported")
    if palette is None:
        raise NotImplementedError("GIF without a global color table")
    min_code_size = payload[pos]
    pos += 1
    data = bytearray()
    while True:
        blen = payload[pos]
        pos += 1
        if blen == 0:
            break
        data += payload[pos : pos + blen]
        pos += blen
    idx = _lzw_decode_gif(bytes(data), min_code_size)
    if len(idx) != iw * ih:
        raise ValueError("LZW pixel count != descriptor dimensions")
    return np.asarray(idx, dtype=np.int64).reshape(ih, iw), palette


def decode_gif(payload: bytes, modality: str = "image") -> dict:
    """GIF decode to the :func:`decode_images` contract: LZW + palette
    lookup via :func:`gif_index_grid`, integer BT.601 luma, mean at 4
    decimals half-up (SQL ROUND semantics) — same stats contract as
    :func:`decode_png`."""
    import numpy as np

    idx, palette = gif_index_grid(payload)
    px = palette[idx].astype(np.int64)
    h, w, _ = px.shape
    luma = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
    mean = int(luma.sum()) / (h * w)
    return {
        "width": w,
        "height": h,
        "n_channels": 3,
        "mean_luma": math.floor(mean * 10_000 + 0.5) / 10_000,
    }


def make_gif_table(docs: DataFrame) -> DataFrame:
    """Image table with REAL GIF payloads (``doc_id % 4 = 2`` — its own
    slice next to BMP/PNG's ``0`` and WAV/JPEG's ``1``), dimensions,
    palette, and indices pure doc_id arithmetic so SQL replays the
    decoded stats: ``w = 4 + doc_id % 10``, ``h = 4 + (7·doc_id) % 8``,
    ``n_colors = 4 + doc_id % 5`` (4 → 2-bit LZW, 5–8 → 3-bit, so both
    minimum code sizes are exercised), index of pixel (x, y) is
    ``(doc_id + 3·y + 5·x) mod n_colors``, palette entry ``c`` is
    ``((17c+3) mod 256, (29c+7) mod 256, (41c+11) mod 256)``."""
    from collections.abc import Iterator as _It

    import numpy as np

    def build(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 4 + doc_id % 10
                h = 4 + (7 * doc_id) % 8
                nc = 4 + doc_id % 5
                y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
                idx = ((doc_id + 3 * y + 5 * x) % nc).astype(np.uint8)
                palette = [
                    ((17 * c + 3) % 256, (29 * c + 7) % 256, (41 * c + 11) % 256)
                    for c in range(nc)
                ]
                ids.append(doc_id)
                payloads.append(encode_gif(idx, palette))
            yield pd.DataFrame(
                {"id": ids, "payload": payloads, "modality": "image"}
            )

    return (
        docs.filter((F.col("doc_id") % 4) == 2)
        .select("doc_id")
        .mapInPandas(build, schema="id long, payload binary, modality string")
    )
