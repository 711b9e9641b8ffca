"""Streaming line-scrub parity: the batch-fitted duplicate-line set
applied to a document stream must scrub every document exactly as
batch q112 does — including on a REAL multi-line corpus (the shared
fixture from test_linedup), where the stream's explode/join/aggregate
plan and the batch's in-array mask take different physical routes to
the same rows."""

from __future__ import annotations

from cometbft_log_etl_spark.session import persistent_rdd_ids, release_new_persists
from cometbft_log_etl_spark.tables import load

from .test_linedup import multiline_dir  # noqa: F401  (shared fixture)


def _batch_scrub(spark, sf_dir):
    from cometbft_log_etl_spark.queries.linedup import line_scrub

    return {
        r.doc_id: (r.source, r.n_lines, r.n_removed, r.scrubbed_text)
        for r in line_scrub(load(spark, sf_dir, "documents")).collect()
    }


def _run_stream(spark, sf_dir, qname):
    from cometbft_log_etl_spark.streaming.linedup import stream_line_scrub

    q = (
        stream_line_scrub(spark, sf_dir)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish"
    return {
        r.doc_id: (r.source, r.n_lines, r.n_removed, r.scrubbed_text)
        for r in spark.table(qname).collect()
    }


def test_stream_scrub_matches_batch_multiline(spark, multiline_dir):  # noqa: F811
    before = persistent_rdd_ids(spark)
    try:
        got = _run_stream(spark, multiline_dir, "t_stream_linedup_ml")
        want = _batch_scrub(spark, multiline_dir)
    finally:
        release_new_persists(spark, before)
    assert len(got) > 0 and got == want


def test_stream_scrub_matches_batch_real_corpus(spark, sf_dir):
    before = persistent_rdd_ids(spark)
    try:
        got = _run_stream(spark, sf_dir, "t_stream_linedup_sf")
        want = _batch_scrub(spark, sf_dir)
    finally:
        release_new_persists(spark, before)
    assert len(got) > 0 and got == want


def test_exploded_scrub_same_code_on_batch_frame(spark, multiline_dir):  # noqa: F811
    """The twin's explode/join/aggregate function run directly on the
    batch frame (no stream) must also reproduce q112 — pins the two
    plans to ONE semantics independent of streaming wiring."""
    from cometbft_log_etl_spark.streaming.linedup import (
        fitted_duplicate_lines,
        scrub_lines_exploded,
    )

    before = persistent_rdd_ids(spark)
    try:
        dup = fitted_duplicate_lines(spark, multiline_dir)
        batch = load(spark, multiline_dir, "documents")
        got = {
            r.doc_id: (r.source, r.n_lines, r.n_removed, r.scrubbed_text)
            for r in scrub_lines_exploded(batch, dup).collect()
        }
        want = _batch_scrub(spark, multiline_dir)
    finally:
        release_new_persists(spark, before)
    assert got == want
