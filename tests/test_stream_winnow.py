"""Streaming q110 parity: the offline-fitted fingerprint-share table
applied to a document stream must reproduce the batch report
row-for-row — the fingerprint builder is shared, so any divergence is
wiring (the stream-static join or the per-doc aggregation)."""

from __future__ import annotations

from cometbft_log_etl_spark.queries import catalog
from cometbft_log_etl_spark.session import persistent_rdd_ids, release_new_persists


def test_stream_report_matches_batch_q110(spark, sf_dir):
    from cometbft_log_etl_spark.streaming.winnow import stream_winnow_report_for

    before = persistent_rdd_ids(spark)
    try:
        q = (
            stream_winnow_report_for(spark, sf_dir)
            .writeStream.format("memory")
            .queryName("t_stream_winnow")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not finish in time"
        got = {
            r.doc_id: (r.n_grams, r.n_windows, r.n_fingerprints, r.max_fp_share)
            for r in spark.table("t_stream_winnow").collect()
        }
        want = {
            r.doc_id: (r.n_grams, r.n_windows, r.n_fingerprints, r.max_fp_share)
            for r in catalog()["q75_winnowing_fingerprints"].fn(spark, sf_dir).collect()
        }
    finally:
        release_new_persists(spark, before)
    assert len(got) > 0 and got == want
    # the share table carries cross-document signal on the real corpus
    assert any(v[3] > 1 for v in got.values())
