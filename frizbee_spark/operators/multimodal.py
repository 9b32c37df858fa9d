"""Multimodal (image/audio/video) column plumbing over opaque binary.

Pattern for 100 TB multimodal curation: media lives as `binary` columns
(or object-store URIs) beside typed metadata; decode / feature-extract /
resize / frame-sample run as vectorized Arrow UDFs via ``mapInPandas`` so
each task streams record batches without materializing whole partitions.

The decode libraries (PIL/ffmpeg/soundfile) are NOT in this container, so
the actual pixel/sample decode is STUBBED: `decode_media` raises
NotImplementedError unless `allow_stub=True`, in which case a clearly
marked deterministic fake (hash-derived dims/durations) exercises the
real Spark plumbing — schema, batching, partitioning — which is what the
tests cover.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import byte_entropy_batch, hash64_batch, hash64_bytes

# magic-byte sniffing is real (not stubbed) — pure byte compares
_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mp3"),
    (b"\x00\x00\x00", "video/mp4"),
]


def sniff_media_type(df: DataFrame, binary_col: str = "media") -> DataFrame:
    """Magic-byte content sniffing as a Catalyst expression chain."""
    col = F.col(binary_col)
    expr = F.lit("application/octet-stream")
    for magic, mime in reversed(_MAGIC):
        hexed = magic.hex()
        expr = F.when(
            F.hex(F.substring(col, 1, len(magic))) == hexed.upper(), mime
        ).otherwise(expr)
    return df.withColumn("media_type", expr)


def media_stats(df: DataFrame, id_col: str = "doc_id", binary_col: str = "media") -> DataFrame:
    """Byte-level stats every payload gets regardless of codec: size,
    64-bit content hash, byte entropy. Vectorized Arrow UDF (entropy needs
    a histogram — not expressible in SQL builtins)."""
    work = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("_m"))

    def run(batches):
        for pdf in batches:
            blobs = [bytes(b) if b is not None else b"" for b in pdf["_m"]]
            n = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=len(blobs))
            h = hash64_batch(blobs).view(np.int64)
            ent = byte_entropy_batch(blobs)
            out = pdf[["doc_id"]].copy()
            out["n_bytes"] = n
            out["content_hash"] = h
            out["entropy"] = np.round(ent, 4)
            yield out

    return work.mapInPandas(
        run, schema="doc_id long, n_bytes long, content_hash long, entropy double"
    )


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "media",
    allow_stub: bool = False,
) -> DataFrame:
    """Decode media metadata (dims / duration / frame count).

    STUB: real decoding needs PIL/ffmpeg, absent in this environment.
    With ``allow_stub=True`` the values are a deterministic fake derived
    from the content hash (marked by decoder='stub') so the distributed
    plumbing is testable end-to-end; otherwise raises NotImplementedError.
    """
    try:
        import PIL.Image  # noqa: F401
        have_decoder = True
    except ImportError:
        have_decoder = False

    if not have_decoder and not allow_stub:
        raise NotImplementedError(
            "media decode requires PIL/ffmpeg (not in this container); "
            "pass allow_stub=True for the deterministic fake decoder"
        )

    work = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("_m"))

    def run(batches):
        for pdf in batches:
            blobs = [bytes(b) if b is not None else b"" for b in pdf["_m"]]
            h = hash64_batch(blobs)
            # deterministic fake: dims/duration from hash bits (STUB)
            width = (h % np.uint64(1920)).astype(np.int64) + 16
            height = ((h >> np.uint64(16)) % np.uint64(1080)).astype(np.int64) + 16
            dur = np.round(
                ((h >> np.uint64(32)) % np.uint64(600_000)).astype(np.float64) / 1e3, 3
            )
            out = pdf[["doc_id"]].copy()
            out["width"] = width
            out["height"] = height
            out["duration_s"] = dur
            out["decoder"] = "stub"
            yield out

    return work.mapInPandas(
        run,
        schema="doc_id long, width long, height long, duration_s double, decoder string",
    )


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 4096,
    max_frames: int = 8,
    id_col: str = "doc_id",
    binary_col: str = "media",
) -> DataFrame:
    """Frame sampling stand-in: emit one row per sampled byte-offset with
    a fixed-size slice ("frame"). Real frame decode is the stubbed step;
    the explode-style fan-out, offset bookkeeping, and binary slicing are
    the actual Spark plumbing a video pipeline needs."""
    work = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("_m"))

    def run(batches):
        for pdf in batches:
            ids, offs, frames = [], [], []
            for d, b in zip(pdf["doc_id"], pdf["_m"]):
                b = b or b""
                for j in range(min(max_frames, max(len(b) // every_n_bytes, 1))):
                    off = j * every_n_bytes
                    ids.append(d)
                    offs.append(off)
                    frames.append(bytes(b[off : off + 64]))
            yield pd.DataFrame({"doc_id": ids, "frame_offset": offs, "frame": frames})

    return work.mapInPandas(run, schema="doc_id long, frame_offset long, frame binary")
