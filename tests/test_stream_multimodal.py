"""Streaming q36 parity: the real container-header decode kernel must
produce bit-identical typed metadata on a document stream — mapInPandas
is stateless, so stream and batch run the SAME kernel and any
divergence is a wiring bug."""

from __future__ import annotations

from cometbft_log_etl_spark.queries import catalog
from cometbft_log_etl_spark.session import persistent_rdd_ids, release_new_persists


def test_stream_headers_match_batch_q36(spark, sf_dir):
    from cometbft_log_etl_spark.streaming.multimodal import stream_media_headers_for

    before = persistent_rdd_ids(spark)
    try:
        q = (
            stream_media_headers_for(spark, sf_dir)
            .writeStream.format("memory")
            .queryName("t_stream_media")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not finish in time"
        got = {
            r.doc_id: (
                r.format, r.media_type, r.width, r.height,
                r.sample_rate, r.n_samples, r.orientation,
            )
            for r in spark.table("t_stream_media").collect()
        }
        want = {
            r.doc_id: (
                r.format, r.media_type, r.width, r.height,
                r.sample_rate, r.n_samples, r.orientation,
            )
            for r in catalog()["q36_media_header_decode"].fn(spark, sf_dir).collect()
        }
    finally:
        release_new_persists(spark, before)
    assert len(got) > 0 and got == want
    # every container family decoded on the stream
    assert {v[0] for v in got.values()} == {"png", "jpeg", "gif", "bmp", "wav"}
