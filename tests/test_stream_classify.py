"""Streaming q104 scoring parity: the offline-fitted classifier applied
to a document stream must score bit-identically to batch
classifier_scores — the fold is exact decimal, so the stream's in-array
feature order vs the batch's collect_list order cannot matter."""

from __future__ import annotations

from cometbft_log_etl_spark.queries.classifier import _QC_FLAG, classifier_scores
from cometbft_log_etl_spark.session import persistent_rdd_ids, release_new_persists
from cometbft_log_etl_spark.tables import load


def test_stream_scores_match_batch_q104(spark, sf_dir):
    from cometbft_log_etl_spark.streaming.classify import stream_classifier_scores

    before = persistent_rdd_ids(spark)
    try:
        q = (
            stream_classifier_scores(spark, sf_dir)
            .writeStream.format("memory")
            .queryName("t_stream_qc")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not finish in time"
        got = {
            r.doc_id: (r.src, r.y, r.score, r.flagged)
            for r in spark.table("t_stream_qc").collect()
        }
        want = {
            r.doc_id: (r.src, r.y, r.score, float(r.score) >= _QC_FLAG)
            for r in classifier_scores(load(spark, sf_dir, "documents")).collect()
        }
    finally:
        release_new_persists(spark, before)
    assert got == want and len(got) > 0
    # the model separates: both flag outcomes occur on real data
    assert {v[3] for v in got.values()} == {True, False}
