"""Multimodal (binary) column plumbing — image/audio/video as opaque
``binary`` columns with typed metadata, processed in Arrow batches via
``mapInPandas``.

The actual media decode is STUBBED (no image/audio libs in this
container): ``fake_decode_meta`` derives deterministic metadata from
the byte content so the Spark-side plumbing — schema, batch iteration,
partitioning — is real and testable, and the arithmetic is replayable
in a SQL oracle. Swap ``_decode_one`` for a real decoder (PIL/ffmpeg)
in production; the mapInPandas contract is unchanged.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` sized so a batch of
blobs fits executor memory (e.g. 1k × 1 MB blobs = 1 GB — lower it for
media). Partitioning: repartition by a content-hash prefix before
decode to spread large blobs evenly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)


def parse_image_header(blob: bytes) -> tuple[int, int, str] | None:
    """Pure-Python container-header parse — real width/height/format
    for PNG (IHDR), JPEG (SOFn scan), GIF (logical screen descriptor)
    and BMP (BITMAPINFOHEADER), no imaging library required. Returns
    None when the magic bytes match no known container."""
    import struct

    if len(blob) >= 24 and blob[:8] == b"\x89PNG\r\n\x1a\n":
        # 8-byte signature, 4-byte chunk length, b"IHDR", then
        # big-endian width/height.
        if blob[12:16] == b"IHDR":
            w, h = struct.unpack(">II", blob[16:24])
            return int(w), int(h), "png"
        return None
    if len(blob) >= 4 and blob[:2] == b"\xff\xd8":
        # JPEG: walk marker segments until a start-of-frame (SOFn)
        # carries the dimensions. Markers FF01/FFD0–D7 are standalone.
        i = 2
        while i + 4 <= len(blob):
            if blob[i] != 0xFF:
                i += 1
                continue
            marker = blob[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if i + 4 > len(blob):
                return None
            seg_len = struct.unpack(">H", blob[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                if i + 9 > len(blob):
                    return None
                h, w = struct.unpack(">HH", blob[i + 5 : i + 9])
                return int(w), int(h), "jpeg"
            if marker == 0xD9 or seg_len < 2:  # EOI / corrupt
                return None
            i += 2 + seg_len
        return None
    if len(blob) >= 10 and blob[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", blob[6:10])
        return int(w), int(h), "gif"
    if len(blob) >= 26 and blob[:2] == b"BM":
        # "BM" alone is a weak magic (any text starting "BM..."
        # matches) — require a known DIB header size and sane positive
        # dimensions before claiming BMP
        # (BITMAPCOREHEADER dib=12 uses 16-bit dims — out of scope)
        dib = struct.unpack("<I", blob[14:18])[0]
        if dib not in (40, 52, 56, 64, 108, 124):
            return None
        w, h = struct.unpack("<ii", blob[18:26])
        if w <= 0 or h == 0 or w > 1 << 20 or abs(h) > 1 << 20:
            return None
        return int(w), abs(int(h)), "bmp"
    return None


def _decode_one(blob: bytes) -> tuple[int, int, int, str]:
    """Decode one payload's metadata: real container-header parse for
    recognized image formats; deterministic synthetic metadata (from
    byte length) for unrecognized bytes so non-media fixtures remain
    SQL-replayable in the oracle."""
    n = len(blob)
    parsed = parse_image_header(blob)
    if parsed is not None:
        width, height, fmt = parsed
        return n, width, height, fmt
    return n, 320 + (n % 320), 240 + (n % 240), "unknown"


def decode_metadata(df: DataFrame, blob_col: str = "blob",
                    id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata extraction over a binary column. The
    input is spread across the cluster first when the scan
    under-partitions — decode is the per-row hot loop and must not run
    on a single core because the source was one big file."""
    from .partitioning import spread

    df = spread(df.select(id_col, blob_col), bytes_per_partition=8 << 20)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_one(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "format": [m[3] for m in metas],
                }
            )

    return df.mapInPandas(run, DECODE_META_SCHEMA)


def frame_sample_stub(df: DataFrame, blob_col: str = "blob",
                      id_col: str = "doc_id", every_n: int = 10) -> DataFrame:
    """STUB video frame sampler: emits (doc_id, frame_idx) rows for a
    fake frame count derived from byte length; the mapInPandas 1→N
    row-explosion shape is the real contract a decoder would use."""
    from .partitioning import spread

    df = spread(df.select(id_col, blob_col), bytes_per_partition=8 << 20)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs = [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                n_frames = max(1, len(blob) // 100)
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("frame_idx", IntegerType())]
    )
    return df.mapInPandas(run, schema)


def embed_stub(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id",
               dim: int = 64) -> DataFrame:
    """STUB media embedder: binary → ``array<float>`` feature vector in
    Arrow batches — the third mapInPandas shape (1→1, payload→vector)
    alongside decode (1→1, payload→metadata) and frame-sample (1→N).
    This is the bridge from multimodal columns into the ANN operators:
    the output schema matches the ``embeddings`` table contract, so
    ``brute_force_topk`` / ``ivf_topk`` / near-dup consume it directly.

    The fake features are deterministic byte statistics (chunk sums),
    so identical payloads embed identically — a real CLIP/encoder call
    replaces ``_embed_one`` without touching the Spark contract."""
    import numpy as np

    def _embed_one(blob: bytes) -> list[float]:
        arr = np.frombuffer(blob, dtype=np.uint8)
        if arr.size == 0:
            return [0.0] * dim
        chunks = np.array_split(arr.astype(np.float32), dim)
        return [float(c.sum() % 997.0) if c.size else 0.0 for c in chunks]

    from pyspark.sql.types import ArrayType, FloatType
    from .partitioning import spread

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    src = spread(df.select(id_col, blob_col), bytes_per_partition=8 << 20)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].values,
                    "embedding": [_embed_one(b) for b in pdf[blob_col]],
                }
            )

    return src.mapInPandas(run, schema)


def with_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize a binary column from text (utf-8) — the fixture
    stand-in for real media bytes."""
    return df.withColumn("blob", F.encode(F.col(text_col), "utf-8"))


def read_binary_dir(spark, path: str, pattern: str = "*") -> DataFrame:
    """Ingest a directory of media files as binary rows via Spark's
    binaryFile source: (path, modificationTime, length, content).
    The natural bronze for image/audio corpora — downstream
    decode_metadata/frame_sample consume the ``content`` column.
    Large-file caveat: each file must fit in one task's memory; shard
    oversized media upstream."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
        .withColumnRenamed("content", "blob")
    )


AUDIO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("bits", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("format", StringType()),
    ]
)


def parse_wav_header(
    blob: bytes,
) -> tuple[int, int, int, int, int] | None:
    """Pure-Python RIFF/WAVE chunk walk — real channels / sample rate /
    bit depth / frame count / duration from the fmt and data chunks,
    no audio library required (the audio sibling of
    ``parse_image_header``; PCM and any fmt-chunked codec whose frame
    size is channels·bits/8). Chunks are word-aligned per the RIFF
    spec. Returns (channels, sample_rate, bits, n_frames, duration_ms)
    or None when the container doesn't parse."""
    import struct

    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    data_size = None
    while i + 8 <= len(blob):
        cid = blob[i : i + 4]
        size = struct.unpack("<I", blob[i + 4 : i + 8])[0]
        if cid == b"fmt " and size >= 16 and i + 24 <= len(blob):
            _, ch, rate = struct.unpack("<HHI", blob[i + 8 : i + 16])
            bits = struct.unpack("<H", blob[i + 22 : i + 24])[0]
            fmt = (ch, rate, bits)
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)
    if fmt is None or data_size is None:
        return None
    ch, rate, bits = fmt
    if ch == 0 or rate == 0 or bits < 8 or bits % 8 != 0:
        # Packed (non-byte-aligned) depths like 12-bit PCM would make
        # frame_bytes undercount; report unknown rather than a wrong duration.
        return None
    frame_bytes = ch * (bits // 8)
    n_frames = data_size // frame_bytes
    duration_ms = n_frames * 1000 // rate
    return int(ch), int(rate), int(bits), int(n_frames), int(duration_ms)


def decode_audio_metadata(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched audio-metadata extraction over a binary column —
    same spread + mapInPandas contract as ``decode_metadata``.
    Unrecognized payloads keep honest NULL metadata with
    format='unknown' (no synthetic fallback: audio consumers branch on
    format, they don't need a fake duration)."""
    from .partitioning import spread

    df = spread(df.select(id_col, blob_col), bytes_per_partition=8 << 20)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col].values, pdf[blob_col]):
                parsed = parse_wav_header(b)
                if parsed is None:
                    rows.append((int(i), len(b), None, None, None, None,
                                 None, "unknown"))
                else:
                    ch, rate, bits, nf, ms = parsed
                    rows.append((int(i), len(b), ch, rate, bits, nf, ms,
                                 "wav"))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "channels", "sample_rate",
                    "bits", "n_frames", "duration_ms", "format",
                ],
            )

    return df.mapInPandas(run, AUDIO_META_SCHEMA)
