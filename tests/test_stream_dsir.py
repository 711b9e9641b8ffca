"""Streaming q105 scoring parity: the offline-fitted DSIR log-ratio
model applied to a document stream must score bit-identically to batch
dsir_scores — both sides fold the same exact-decimal c * r terms, and
decimal addition is order-free, so the stream's in-array fold vs the
batch's post-explode GROUP BY cannot diverge."""

from __future__ import annotations

from cometbft_log_etl_spark.queries.dsir import dsir_scores
from cometbft_log_etl_spark.session import persistent_rdd_ids, release_new_persists
from cometbft_log_etl_spark.tables import load


def test_stream_scores_match_batch_dsir(spark, sf_dir):
    from cometbft_log_etl_spark.streaming.dsir import stream_dsir_scores_for

    before = persistent_rdd_ids(spark)
    try:
        q = (
            stream_dsir_scores_for(spark, sf_dir)
            .writeStream.format("memory")
            .queryName("t_stream_dsir")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not finish in time"
        got = {
            r.doc_id: (r.src, r.n_grams, r.score)
            for r in spark.table("t_stream_dsir").collect()
        }
        want = {
            r.doc_id: (r.src, r.n_grams, r.score)
            for r in dsir_scores(load(spark, sf_dir, "documents")).collect()
        }
    finally:
        release_new_persists(spark, before)
    assert len(got) > 0 and got == want
    # the weights carry signal: scores are not all identical
    assert len({v[2] for v in got.values()}) > 1


def test_fitted_model_carries_default_row(spark, sf_dir):
    from cometbft_log_etl_spark.streaming.dsir import fitted_dsir_model

    items = fitted_dsir_model(spark, sf_dir)
    by_d = dict(items)
    assert -1 in by_d, "the unseen-bucket sentinel must ship with the model"
    # every real bucket id is in the hashed domain
    assert all(0 <= d < 64 for d in by_d if d != -1)
