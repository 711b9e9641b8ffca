"""Batch/stream parity for the curation transforms: the streaming
quality pass must produce EXACTLY the batch q53 rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from cometbft_log_etl_spark.queries import catalog
from cometbft_log_etl_spark.streaming.curation import (
    stream_exact_dedup,
    stream_exact_dedup_bounded,
    stream_quality,
)


def _run_stream(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"


def test_stream_quality_matches_batch(spark, sf_dir):
    _run_stream(stream_quality(spark, sf_dir), "t_quality")
    got = spark.table("t_quality")
    want = catalog()["q53_quality_score"].fn(spark, sf_dir)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_exact_dedup_counts(spark, sf_dir):
    _run_stream(stream_exact_dedup(spark, sf_dir), "t_dedup")
    got = spark.table("t_dedup")
    want = catalog()["q28_exact_dedup"].fn(spark, sf_dir)
    # one surviving row per distinct content hash
    assert got.count() == want.count()
    assert got.select(F.count_distinct("text_hash")).first()[0] == got.count()


def test_stream_exact_dedup_bounded_counts(spark, sf_dir):
    """Within one micro-batch every duplicate is inside the watermark
    horizon, so the bounded variant matches the exact one here — the
    difference is state eviction across batches, not semantics."""
    _run_stream(stream_exact_dedup_bounded(spark, sf_dir), "t_dedup_b")
    got = spark.table("t_dedup_b")
    want = catalog()["q28_exact_dedup"].fn(spark, sf_dir)
    assert got.count() == want.count()
    assert got.select(F.count_distinct("text_hash")).first()[0] == got.count()


def test_staged_dir_reused_not_leaked(spark, sf_dir):
    """Repeated stream construction must reuse one staging dir per
    source path instead of leaking a fresh mkdtemp per call."""
    from cometbft_log_etl_spark.streaming import curation

    before = dict(curation._STAGED_DIRS)
    for _ in range(3):
        curation.stream_documents(spark, sf_dir)
    path = f"{sf_dir.rstrip('/')}/documents.parquet"
    assert path in curation._STAGED_DIRS
    # one dir for this path, stable across calls
    after = curation._STAGED_DIRS
    assert len([p for p in after if p == path]) == 1
    if path in before:
        assert before[path] == after[path]


def test_stream_incremental_dedup_matches_q90(spark, sf_dir):
    """Stream-static screen == batch q13: the surviving doc_ids of the
    streaming path must be exactly the keep=true rows of the batch
    incremental-dedup query."""
    from cometbft_log_etl_spark.streaming.curation import stream_incremental_dedup

    _run_stream(stream_incremental_dedup(spark, sf_dir), "t_inc_dedup")
    got = {r.doc_id for r in spark.table("t_inc_dedup").select("doc_id").collect()}
    want = {
        r.doc_id
        for r in catalog()["q13_incremental_dedup"]
        .fn(spark, sf_dir)
        .filter(F.col("keep"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_source_stats_matches_batch_card(spark, sf_dir):
    """The streaming data-card slice must equal the batch q08 columns it
    mirrors (complete-mode agg over the whole table read as a stream)."""
    from cometbft_log_etl_spark.streaming.curation import stream_source_stats

    q = (
        stream_source_stats(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("t_card")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    got = spark.table("t_card")
    want = (
        catalog()["q08_source_datacard"]
        .fn(spark, sf_dir)
        .select("source", "n_docs", "total_tokens", "mean_chars", "n_short_docs")
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
