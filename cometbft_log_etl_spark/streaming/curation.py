"""Streaming curation: the datapipe transforms on a document stream.

A training-data lake ingests documents continuously; the curation
transforms (quality features, content-hash dedup) are pure
projection/filter/stateful-dedup plans, so the SAME code that serves
the batch catalog runs on `readStream` — batch/stream parity by
construction, exactly like the log path (streaming/ingest.py, S7).
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.datapipe import quality_features

# Staged symlink dirs, one per source path per process: reused across
# calls (a re-created stream points at the same dir) and removed at
# interpreter exit — the staging lifecycle is the process lifecycle,
# matching the memory-sink test streams that read them.
_STAGED_DIRS: dict[str, str] = {}


def _cleanup_staged() -> None:
    for d in _STAGED_DIRS.values():
        shutil.rmtree(d, ignore_errors=True)
    _STAGED_DIRS.clear()


atexit.register(_cleanup_staged)


def _stage_dir(path: str) -> str:
    staged = _STAGED_DIRS.get(path)
    if staged is not None and os.path.isdir(staged):
        return staged
    tag = hashlib.sha1(path.encode()).hexdigest()[:12]
    staged = os.path.join(tempfile.gettempdir(), f"stream-docs-{tag}-{os.getpid()}")
    os.makedirs(staged, exist_ok=True)
    link = os.path.join(staged, "documents.parquet")
    if not os.path.lexists(link):
        os.symlink(path, link)
    _STAGED_DIRS[path] = staged
    return staged


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table (schema from a batch
    peek — free: parquet footer only).

    A real lake ingests documents as files arriving in a directory; the
    testdata table is one parquet FILE, and Spark's file source requires
    a directory, so it is staged via symlink into a scratch dir — the
    stand-in for the arrival directory, zero data copied. The scratch
    dir is per-source-path, reused across calls, and removed at process
    exit (no per-call tempdir leak).
    """
    path = f"{sf_dir.rstrip('/')}/documents.parquet"
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(_stage_dir(path))


def stream_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features on the stream — the batch q53 plan
    verbatim (map-only, no state)."""
    return quality_features(stream_documents(spark, sf_dir))


def stream_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup by content hash — exact, UNBOUNDED state.

    `dropDuplicates` keeps one state entry per distinct hash forever:
    correct at any horizon but the state store grows with the corpus.
    Use this for bounded backfills; for a continuous lake ingest use
    `stream_exact_dedup_bounded`, which trades cross-horizon exactness
    for watermark-evicted state. First occurrence wins, matching q50's
    min-doc_id keep for id-ordered arrival.
    """
    docs = stream_documents(spark, sf_dir)
    return docs.withColumn(
        "text_hash", F.md5(F.col("text").cast("binary"))
    ).dropDuplicates(["text_hash"])


def stream_exact_dedup_bounded(
    spark: SparkSession, sf_dir: str, horizon: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup with genuinely bounded state.

    The documents table carries no event time, so ingestion time is the
    event time (standard for arrival-order lake dedup). A watermark on
    it lets `dropDuplicatesWithinWatermark` evict hash state older than
    the horizon — state is bounded by arrival rate × horizon regardless
    of corpus size. Duplicates farther apart than the horizon both
    survive (the standard windowed-dedup trade; run a periodic batch
    q50 compaction to catch them).
    """
    docs = stream_documents(spark, sf_dir)
    return (
        docs.withColumn("ingest_ts", F.current_timestamp())
        .withColumn("text_hash", F.md5(F.col("text").cast("binary")))
        .withWatermark("ingest_ts", horizon)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def stream_incremental_dedup(
    spark: SparkSession, sf_dir: str, horizon: str = "1 hour"
) -> DataFrame:
    """Streaming half of q13: screen a live ingest stream against the
    already-ingested history with a stream-static join.

    The history fingerprint set is a STATIC DataFrame (the lake's
    parquet), re-read per micro-batch under the stream-static join
    contract — no state store holds it, so history size never bloats
    checkpoint state; at 100 TB the join is hash-partitioned on the
    16-byte fp key and the stream side is the small one per batch.
    Within-stream duplicates then dedup via watermark-BOUNDED keyed
    state (ingestion time is the event time, the
    stream_exact_dedup_bounded contract): state is arrival-rate ×
    horizon, duplicates farther apart than the horizon fall through to
    the next batch-q13 compaction. First arrival wins, matching q13's
    min-doc_id batch rule for id-ordered arrival. Emits only surviving
    (keep=true) documents.
    """
    from ..tables import load

    fp = F.md5(F.col("text").cast("binary"))
    incoming = (
        stream_documents(spark, sf_dir)
        .filter(F.col("doc_id") % 10 >= 8)  # q13's incoming-batch slice
        .withColumn("fp", fp)
    )
    history = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 < 8)
        .select(fp.alias("fp"))
        .distinct()
        .withColumn("_hist", F.lit(1))
    )
    fresh = (
        incoming.join(history, "fp", "left_outer")
        .filter(F.col("_hist").isNull())
        .drop("_hist")
    )
    return (
        fresh.withColumn("ingest_ts", F.current_timestamp())
        .withWatermark("ingest_ts", horizon)
        .dropDuplicatesWithinWatermark(["fp"])
        .drop("fp", "ingest_ts")
    )


def stream_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming slice of the q08 data card: per-source doc/token/short
    counts as a continuously-updating aggregate (complete output mode).

    Exactly the streamable subset — the batch card's distinct-text-hash
    columns need either unbounded state or a sketch, so they stay in
    the batch card; everything here is an incrementally-mergeable sum,
    i.e. state is one row per source no matter the corpus size.
    """
    docs = stream_documents(spark, sf_dir)
    toks = F.size(F.split("text", " "))
    return (
        docs.select("source", "n_chars", toks.alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("mean_chars"),
            F.count_if(F.col("n_tokens") < 30).alias("n_short_docs"),
        )
    )
