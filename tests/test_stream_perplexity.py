"""Streaming q106 banding parity: the offline-fitted bigram LM and
tertile thresholds applied to a document stream must reproduce the
batch per-document milli-nats bit-for-bit (shared scoring expressions,
exact-decimal sums) and the batch band report count-for-count."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from cometbft_log_etl_spark.queries import catalog
from cometbft_log_etl_spark.queries.perplexity import (
    _bigrams,
    join_lm,
    milli_col,
)
from cometbft_log_etl_spark.session import persistent_rdd_ids, release_new_persists
from cometbft_log_etl_spark.tables import load


def _run_stream(spark, sf_dir):
    from cometbft_log_etl_spark.streaming.perplexity import (
        fitted_lm_and_thresholds,
        stream_perplexity_bands,
    )
    from cometbft_log_etl_spark.streaming.curation import stream_documents

    lm, th = fitted_lm_and_thresholds(spark, sf_dir)
    q = (
        stream_perplexity_bands(stream_documents(spark, sf_dir), lm, th)
        .writeStream.format("memory")
        .queryName("t_stream_ppl")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    return spark.table("t_stream_ppl").collect(), lm


def test_stream_milli_nats_match_batch(spark, sf_dir):
    before = persistent_rdd_ids(spark)
    try:
        rows, lm = _run_stream(spark, sf_dir)
        got = {(r.doc_id, r.lang): r.mb for r in rows}
        c2, c1, voc = lm
        docs = load(spark, sf_dir, "documents")
        toks = docs.select("doc_id", "lang", F.split("text", " ").alias("t"))
        lp = join_lm(_bigrams(toks, "doc_id", "lang"), c2, c1, voc)
        want = {
            (r.doc_id, r.lang): r.mb
            for r in lp.groupBy("doc_id", "lang")
            .agg(F.count(F.lit(1)).alias("nb"), F.sum("logp").alias("s"))
            .select("doc_id", "lang", milli_col(F.col("s"), F.col("nb")))
            .collect()
        }
    finally:
        release_new_persists(spark, before)
    assert len(got) > 0 and got == want


def test_stream_bands_match_batch_report(spark, sf_dir):
    before = persistent_rdd_ids(spark)
    try:
        rows, _ = _run_stream(spark, sf_dir)
        got = Counter((r.lang, r.band) for r in rows)
        want = {
            (r.lang, r.band): r.n_docs
            for r in catalog()["q106_perplexity_bands"].fn(spark, sf_dir).collect()
        }
    finally:
        release_new_persists(spark, before)
    assert dict(got) == want
    assert {b for (_, b) in got} == {"head", "middle", "tail"}
