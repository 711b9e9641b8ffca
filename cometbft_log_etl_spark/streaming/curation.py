"""Streaming curation: the datapipe transforms on a document stream.

A training-data lake ingests documents continuously; the curation
transforms (quality features, content-hash dedup) are pure
projection/filter/stateful-dedup plans, so the SAME code that serves
the batch catalog runs on `readStream` — batch/stream parity by
construction, exactly like the log path (streaming/ingest.py, S7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.datapipe import quality_features


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table (schema from a batch
    peek — free: parquet footer only).

    A real lake ingests documents as files arriving in a directory; the
    testdata table is one parquet FILE, and Spark's file source requires
    a directory, so it is staged via symlink into a scratch dir — the
    stand-in for the arrival directory, zero data copied.
    """
    import os
    import tempfile

    path = f"{sf_dir.rstrip('/')}/documents.parquet"
    schema = spark.read.parquet(path).schema
    staged = tempfile.mkdtemp(prefix="stream-docs-")
    os.symlink(path, os.path.join(staged, "documents.parquet"))
    return spark.readStream.schema(schema).parquet(staged)


def stream_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features on the stream — the batch q53 plan
    verbatim (map-only, no state)."""
    return quality_features(stream_documents(spark, sf_dir))


def stream_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup by content hash with bounded state.

    `dropDuplicates` on the md5 keyed state would grow forever; at lake
    scale you either watermark it (needs an event-time column — the
    documents table has none, so tests use dropDuplicates) or compact
    periodically. First occurrence wins, matching q50's min-doc_id keep
    for id-ordered arrival.
    """
    docs = stream_documents(spark, sf_dir)
    return docs.withColumn(
        "text_hash", F.md5(F.col("text").cast("binary"))
    ).dropDuplicates(["text_hash"])
