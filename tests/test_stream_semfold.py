"""Semantic maintenance fold (q120's merge-replay contract as
foreachBatch state): fold-vs-batch parity, multi-wave incremental ==
monolithic rerun under the stored model, first-arrival-wins, and the
shared epoch guard."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cometbft_log_etl_spark.tables import load


def _q120_rows(spark, sf_dir):
    from cometbft_log_etl_spark.queries import catalog

    return {
        r.vec_id: (
            r.cluster_id, r.centroid_cos, r.is_batch, r.is_kept, r.dup_of,
            r.was_kept, r.newly_pruned,
        )
        for r in catalog()["q120_incremental_semdedup"].fn(spark, sf_dir).collect()
    }


def _delta_rows(df):
    return {
        r.vec_id: (
            r.cluster_id, r.centroid_cos, r.is_batch, r.is_kept, r.dup_of,
            r.was_kept, r.newly_pruned,
        )
        for r in df.collect()
    }


def test_second_fold_delta_matches_batch_q120(spark, sf_dir):
    """fold(history) then fold(batch) under the stored (history-fit)
    model: the second fold's delta must equal q120 row-for-row — the
    fold and the batch maintenance query share one contract."""
    from cometbft_log_etl_spark.streaming.semdedup import (
        fold_semantic_batch,
        stored_model_df,
    )

    cent = stored_model_df(spark, sf_dir)
    embs = load(spark, sf_dir, "embeddings")
    s1 = fold_semantic_batch(None, embs.filter(F.col("vec_id") % 10 < 8), cent)
    s2 = fold_semantic_batch(s1, embs.filter(F.col("vec_id") % 10 >= 8), cent)
    want = _q120_rows(spark, sf_dir)
    got = _delta_rows(s2.delta)
    assert got == want
    assert any(v[6] for v in want.values()), "corpus exercises no newly_pruned"


def test_multi_fold_equals_monolithic_under_stored_model(spark, sf_dir):
    """Three arrival waves: the final drop list equals ONE monolithic
    _semdedup_dups pass over every folded vector under the stored
    model — the q120 exactness argument at fold granularity."""
    from cometbft_log_etl_spark.queries.neardup import _km_assign_round, _semdedup_dups
    from cometbft_log_etl_spark.queries._det import dnrm12, finite_embeddings
    from cometbft_log_etl_spark.streaming.semdedup import (
        fold_semantic_batch,
        stored_model_df,
    )

    cent = stored_model_df(spark, sf_dir)
    embs = load(spark, sf_dir, "embeddings")
    state = None
    for w in range(3):
        state = fold_semantic_batch(
            state, embs.filter(F.col("vec_id") % 3 == w), cent
        )
    got = {r.vec_id: r.dup_of for r in state.dups.collect()}
    full_emb = finite_embeddings(embs).select(
        "vec_id", F.col("embedding").alias("emb"), dnrm12(F.col("embedding")).alias("nrm")
    )
    want = {
        r.vec_id: r.dup_of
        for r in _semdedup_dups(_km_assign_round(full_emb, cent)).collect()
    }
    assert got == want and want
    # and the stored assignment covers every screened vector exactly once
    n_assign = state.assign.count()
    assert n_assign == full_emb.count()
    assert state.assign.select("vec_id").distinct().count() == n_assign


def test_first_arrival_wins_and_epoch_guard(spark, sf_dir):
    from cometbft_log_etl_spark.streaming.semdedup import (
        make_semantic_epoch_fold,
        stored_model_df,
    )

    cent = stored_model_df(spark, sf_dir)
    embs = load(spark, sf_dir, "embeddings")
    hist = embs.filter(F.col("vec_id") % 10 < 8)
    fold, get_state = make_semantic_epoch_fold(cent)
    fold(hist, 0)
    n0 = get_state().assign.count()
    fold(hist, 0)  # redelivered epoch: no-op
    assert get_state().assign.count() == n0
    fold(hist, 1)  # re-ingestion: first arrival wins, nothing folds
    assert get_state().assign.count() == n0
    assert get_state().delta.count() == 0
    with pytest.raises(RuntimeError, match="second streaming query"):
        fold(hist, 0)
