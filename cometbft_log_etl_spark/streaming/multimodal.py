"""Streaming multimodal header decode: the q36 byte-level parser on a
live media stream.

A lake ingests media blobs continuously; the decode kernel
(operators/multimodal.decode_media_real — magic-byte sniff + real
PNG/JPEG/GIF/BMP/WAV container parsing over Arrow batches) is a pure
``mapInPandas`` pass, which Structured Streaming runs per micro-batch
with NO state — so the SAME kernel object the batch query uses runs
online, stateless append mode, and the stream's typed metadata rows
are bit-identical to batch q36's (parity-tested in
tests/test_stream_multimodal.py).

The synthesize step stands in for reading an arriving binary column
(exactly as in batch q36 — the round-trip proves the PARSER); a real
deployment deletes it and points the decode at the stream's content
column, which is the one-line change the shared kernel shape buys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (kept for parity with sibling twins)

from ..operators.multimodal import decode_media_real
from ..queries.multimodal import synthesize_real_media
from .curation import stream_documents


def stream_media_headers(docs: DataFrame) -> DataFrame:
    """(doc_id, format, media_type, width, height, sample_rate,
    n_samples, orientation) on a live stream — the q36 row shape."""
    return decode_media_real(synthesize_real_media(docs.select("doc_id"))).select(
        "doc_id", "format", "media_type", "width", "height", "sample_rate",
        "n_samples", "orientation",
    )


def stream_media_headers_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convenience wiring: stream the corpus ids through the
    synthesize + decode round-trip."""
    return stream_media_headers(stream_documents(spark, sf_dir))
