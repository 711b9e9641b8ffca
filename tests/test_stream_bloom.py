"""Streaming q108 parity: the offline-fitted Bloom position set and
history table applied to a document stream must classify every arriving
document exactly as the batch screen does, and the per-source verdict
totals must match the q108 report."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from cometbft_log_etl_spark.queries import catalog
from cometbft_log_etl_spark.session import persistent_rdd_ids, release_new_persists
from cometbft_log_etl_spark.tables import load


def test_stream_verdicts_match_batch(spark, sf_dir):
    from cometbft_log_etl_spark.streaming.bloom import (
        fitted_bloom,
        stream_bloom_screen,
        stream_bloom_screen_for,
    )

    before = persistent_rdd_ids(spark)
    try:
        q = (
            stream_bloom_screen_for(spark, sf_dir)
            .writeStream.format("memory")
            .queryName("t_stream_bloom")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not finish in time"
        got = {
            r.doc_id: (r.source, r.verdict)
            for r in spark.table("t_stream_bloom").collect()
        }
        # the SAME code path over the batch frame — joins + groupBy are
        # engine ops either way, so this pins the stream-static wiring
        m, hpos, hist = fitted_bloom(spark, sf_dir)
        batch = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 >= 8)
        want = {
            r.doc_id: (r.source, r.verdict)
            for r in stream_bloom_screen(batch, m, hpos, hist).collect()
        }
    finally:
        release_new_persists(spark, before)
    assert len(got) > 0 and got == want


def test_stream_totals_match_q108_report(spark, sf_dir):
    from cometbft_log_etl_spark.streaming.bloom import stream_bloom_screen_for

    before = persistent_rdd_ids(spark)
    try:
        q = (
            stream_bloom_screen_for(spark, sf_dir)
            .writeStream.format("memory")
            .queryName("t_stream_bloom2")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not finish in time"
        rows = spark.table("t_stream_bloom2").collect()
        got = Counter((r.source, r.verdict) for r in rows)
        report = {}
        for r in catalog()["q71_bloom_screen"].fn(spark, sf_dir).collect():
            report[(r.source, "new")] = r.n_new
            report[(r.source, "dup")] = r.n_true_dup
            report[(r.source, "fp")] = r.n_false_pos
        want = {k: v for k, v in report.items() if v > 0}
    finally:
        release_new_persists(spark, before)
    assert dict(got) == want
