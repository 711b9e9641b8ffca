"""Gram-index foreachBatch fold (streaming detect for the uncapped
tier): fold parity with batch q136, multi-batch replay equivalence
with a full q119 rerun, bounded/exact state, and the shared epoch
guard's redelivery semantics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cometbft_log_etl_spark.tables import load


def _rows(df):
    return {
        (r.doc_id, r.span_start, r.span_tokens, r.n_dup_grams, r.is_batch)
        for r in df.collect()
    }


def test_second_fold_delta_matches_batch_q136(spark, sf_dir):
    """fold(history slice) then fold(batch slice): the second fold's
    delta must equal q136 over the combined corpus — the fold and the
    batch query share one delta contract."""
    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.streaming.dupgrams import fold_gram_batch

    docs = load(spark, sf_dir, "documents")
    s1 = fold_gram_batch(None, docs.filter(F.col("doc_id") % 10 < 8))
    s2 = fold_gram_batch(s1, docs.filter(F.col("doc_id") % 10 >= 8))
    want = _rows(catalog()["q136_incremental_spans"].fn(spark, sf_dir))
    assert _rows(s2.delta) == want
    assert want, "corpus produces no delta — fixture too weak"


def test_first_fold_is_full_detect(spark, sf_dir):
    """From empty state, everything is batch: the delta is q119 over
    the folded docs with is_batch True on every row."""
    from cometbft_log_etl_spark.queries.datapipe import duplicated_spans
    from cometbft_log_etl_spark.streaming.dupgrams import fold_gram_batch

    docs = load(spark, sf_dir, "documents")
    s = fold_gram_batch(None, docs)
    want = {
        (r.doc_id, r.span_start, r.span_tokens, r.n_dup_grams, True)
        for r in duplicated_spans(docs).collect()
    }
    assert _rows(s.delta) == want


def test_multi_fold_replay_equals_full_rerun(spark, sf_dir):
    """Three arrival waves: applying each delta doc-replacement-wise
    (a doc's rows replace its stored span set) reproduces q119 over
    the full corpus, and the final index holds exact corpus counts."""
    from cometbft_log_etl_spark.queries.datapipe import corpus_grams, duplicated_spans
    from cometbft_log_etl_spark.streaming.dupgrams import fold_gram_batch

    docs = load(spark, sf_dir, "documents")
    state, table = None, {}
    for w in range(3):
        state = fold_gram_batch(state, docs.filter(F.col("doc_id") % 3 == w))
        delta = state.delta.collect()
        for d in {r.doc_id for r in delta}:
            table[d] = set()
        for r in delta:
            table[r.doc_id].add((r.span_start, r.span_tokens, r.n_dup_grams))
    want = {}
    for r in duplicated_spans(docs).collect():
        want.setdefault(r.doc_id, set()).add(
            (r.span_start, r.span_tokens, r.n_dup_grams)
        )
    assert {d: s for d, s in table.items() if s} == want
    # exact index: stored counts equal a from-scratch gram count
    got_counts = {r.g: r.n for r in state.counts.collect()}
    want_counts = {
        r.g: r.n
        for r in corpus_grams(docs).groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got_counts == want_counts


def test_reingested_doc_first_arrival_wins(spark):
    """Folding the same doc_id twice must not double its gram counts
    (self-duplicating every one of its grams)."""
    from cometbft_log_etl_spark.queries.datapipe import _SUB_K
    from cometbft_log_etl_spark.streaming.dupgrams import fold_gram_batch

    text = " ".join(f"w{i}" for i in range(_SUB_K))
    d = spark.createDataFrame([(1, text)], "doc_id long, text string")
    s1 = fold_gram_batch(None, d)
    s2 = fold_gram_batch(s1, d)
    assert s2.delta.count() == 0  # the re-arrival folds nothing
    assert {r.n for r in s2.counts.collect()} == {1}


def test_epoch_guard_semantics(spark, sf_dir):
    """Redelivered epoch folds once; a second attached query raises —
    the shared epoch_guarded wrapper behind make_gram_epoch_fold."""
    from cometbft_log_etl_spark.streaming.dupgrams import make_gram_epoch_fold

    docs = load(spark, sf_dir, "documents")
    fold, get_state = make_gram_epoch_fold()
    fold(docs.filter(F.col("doc_id") % 10 < 8), 0)
    n0 = get_state().grams.count()
    fold(docs.filter(F.col("doc_id") % 10 < 8), 0)  # redelivery: no-op
    assert get_state().grams.count() == n0
    fold(docs.filter(F.col("doc_id") % 10 >= 8), 1)
    assert get_state().grams.count() > n0
    with pytest.raises(RuntimeError, match="second streaming query"):
        fold(docs, 0)


def test_writestream_wiring(spark, sf_dir):
    """The foreachBatch deployment path end to end: after availableNow
    drains, the index holds every corpus gram."""
    from cometbft_log_etl_spark.queries.datapipe import corpus_grams
    from cometbft_log_etl_spark.streaming.dupgrams import stream_incremental_spans

    q, get_state = stream_incremental_spans(spark, sf_dir)
    assert q.awaitTermination(180), "stream did not finish"
    state = get_state()
    assert state is not None and state.delta is not None
    want = corpus_grams(load(spark, sf_dir, "documents")).count()
    assert state.grams.count() == want
