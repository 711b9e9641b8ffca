"""Crawl-time uncapped-scrub parity (round-13 verdict #6): the
duplicated-gram set fitted by the batch q119 kernel, applied to a
document stream, must scrub exactly as batch q132 does — the stream's
explode/join/aggregate + in-array islanding route vs the batch's
count/semi-join/window route to the same spans."""

from __future__ import annotations

from pyspark.sql import functions as F

from cometbft_log_etl_spark.session import persistent_rdd_ids, release_new_persists
from cometbft_log_etl_spark.tables import load


def _batch_scrub(spark, sf_dir):
    from cometbft_log_etl_spark.queries import catalog

    return {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
        for r in catalog()["q132_duplicated_scrub"].fn(spark, sf_dir).collect()
    }


def _run_stream(spark, sf_dir, qname):
    from cometbft_log_etl_spark.streaming.substring import stream_duplicated_scrub_for

    q = (
        stream_duplicated_scrub_for(spark, sf_dir)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish"
    return {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
        for r in spark.table(qname).collect()
    }


def test_stream_duplicated_scrub_matches_batch(spark, sf_dir):
    before = persistent_rdd_ids(spark)
    try:
        got = _run_stream(spark, sf_dir, "t_stream_dupscrub_sf")
        want = _batch_scrub(spark, sf_dir)
    finally:
        release_new_persists(spark, before)
    assert len(got) > 0 and got == want
    # fixture honesty: the corpus actually removes something somewhere
    assert any(v[1] > 0 for v in want.values()), "corpus exercises no removal"


def test_exploded_scrub_same_code_on_batch_frame(spark, sf_dir):
    """The twin's explode/join/aggregate/island function run directly
    on the batch frame (no stream wiring) must also reproduce q132 —
    pins the two island implementations (array fold vs lag/sum window)
    to ONE semantics."""
    from cometbft_log_etl_spark.streaming.substring import (
        fitted_duplicated_grams,
        stream_duplicated_scrub,
    )

    before = persistent_rdd_ids(spark)
    try:
        dup = fitted_duplicated_grams(spark, sf_dir)
        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
            for r in stream_duplicated_scrub(
                load(spark, sf_dir, "documents"), dup
            ).collect()
        }
        want = _batch_scrub(spark, sf_dir)
    finally:
        release_new_persists(spark, before)
    assert len(got) > 0 and got == want


def test_novel_duplication_left_to_next_detect_pass(spark, sf_dir):
    """The deployment split: a document whose duplication exists only
    WITHIN the arriving batch (its grams absent from the fitted state)
    passes through unscrubbed — and a document carrying a FITTED
    duplicated span is scrubbed even though it is new."""
    from cometbft_log_etl_spark.queries.datapipe import _SUB_K, corpus_grams, duplicated_gram_set
    from cometbft_log_etl_spark.streaming.substring import stream_duplicated_scrub

    hist_tokens = [f"h{i}" for i in range(_SUB_K)] + ["tail0", "tail1"]
    hist_text = " ".join(hist_tokens)
    hist = spark.createDataFrame(
        [(1, hist_text), (2, hist_text)], "doc_id long, text string"
    )
    dup = duplicated_gram_set(corpus_grams(hist))
    novel = " ".join(f"n{i}" for i in range(_SUB_K))
    fresh_tail = [f"x{i}" for i in range(_SUB_K)]
    arriving = spark.createDataFrame(
        [
            # novel within-batch duplicate pair: untouched by the fit
            (10, novel),
            (11, novel),
            # fitted duplicated run + a never-seen tail: only the run goes
            (12, " ".join(hist_tokens + fresh_tail)),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in stream_duplicated_scrub(arriving, dup).collect()}
    assert rows[10].n_removed == 0 and rows[10].cleaned_text == novel
    assert rows[11].n_removed == 0
    # dup positions 0..len(hist)-K -> one island covering exactly the
    # hist portion; the fresh tail survives intact
    assert rows[12].n_removed == len(hist_tokens)
    assert rows[12].cleaned_text == " ".join(fresh_tail)
