"""Multimodal columns: opaque binary media + typed metadata, processed
via Arrow-batched mapInPandas.

Media (image/audio/video) is modeled the way a 100 TB training-data
lake stores it: a `content BINARY` column plus a `media_type` tag and a
nested metadata struct, partitioned so one Arrow batch holds whole
objects. The decode/resize/frame-sample kernels run per-partition via
``mapInPandas`` — the only sane shape for large blobs (no row-at-a-time
Python, no JVM round-trip per object).

The real decoders (PIL / soundfile / pyav) are NOT in this container,
so `decode_media_real` raises NotImplementedError at the exact
integration point; `extract_features` is the deterministic stand-in
(md5-derived pseudo-metadata) that keeps every piece of Spark-side
plumbing — schema, batch iteration, column pruning, output shape —
real and testable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ("image", "audio", "video")

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media objects from the documents table: the
    UTF-8 text bytes stand in for encoded blobs; type cycles by doc_id."""
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        "doc_id", mt.alias("media_type"), F.encode("text", "UTF-8").alias("content")
    )


def _pseudo_dim(content: bytes, salt: str, mod: int) -> int:
    h = hashlib.md5(content + salt.encode()).hexdigest()
    return int(h[:8], 16) % mod + 1


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The mapInPandas kernel: per-batch 'decode' producing typed
    metadata. Deterministic md5 arithmetic stands in for the real
    decoder (see decode_media_real)."""
    for pdf in batches:
        out = {
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "n_bytes": pdf["content"].map(len),
            "width": [
                _pseudo_dim(c, ":w", 1920) if t == "image" or t == "video" else 0
                for c, t in zip(pdf["content"], pdf["media_type"])
            ],
            "height": [
                _pseudo_dim(c, ":h", 1080) if t in ("image", "video") else 0
                for c, t in zip(pdf["content"], pdf["media_type"])
            ],
            "n_frames": [
                _pseudo_dim(c, ":f", 240) if t == "video" else (1 if t == "image" else 0)
                for c, t in zip(pdf["content"], pdf["media_type"])
            ],
            "sample_rate": [
                16000 if t == "audio" else 0 for t in pdf["media_type"]
            ],
        }
        yield pd.DataFrame(out)


def decode_media(media: DataFrame) -> DataFrame:
    """content → typed feature row, one Arrow batch at a time."""
    return media.mapInPandas(extract_features, schema=FEATURE_SCHEMA)


def decode_media_real(media: DataFrame) -> DataFrame:
    """Integration point for real decoders.

    Would dispatch per media_type inside mapInPandas:
      image → PIL.Image.open(io.BytesIO(b)) → size / resize / thumbnail
      audio → soundfile.read → sample_rate, duration
      video → av.open → frame sampling at a stride
    None of those libraries ship in this environment.
    """
    raise NotImplementedError(
        "real media decoders (PIL/soundfile/pyav) are not available in "
        "this container; use decode_media (deterministic stand-in) — the "
        "Spark plumbing is identical"
    )


def sample_frames(features: DataFrame, stride: int = 24) -> DataFrame:
    """Frame-sampling plan for videos: one output row per sampled frame
    index — pure columnar explode, no Python."""
    idx = F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(stride))
    return (
        features.filter(F.col("media_type") == "video")
        .select("doc_id", "n_frames", F.explode(idx).alias("frame_index"))
    )
