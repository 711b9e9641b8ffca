"""foreachBatch incremental clustering: after the corpus arrives
across three micro-batches, the carried state's labels must equal a
full cluster_labels run over the whole corpus — the iterated
contraction theorem, exercised through a REAL Structured Streaming
query with per-fold checkpointed state."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from cometbft_log_etl_spark.queries.neardup import cluster_labels
from cometbft_log_etl_spark.tables import load


def test_stream_incremental_matches_full(spark, sf_dir, tmp_path_factory):
    from cometbft_log_etl_spark.streaming.incremental import (
        stream_incremental_clusters,
    )

    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    ids = [r.doc_id for r in docs.select("doc_id").orderBy("doc_id").collect()]
    cut1, cut2 = ids[n // 3], ids[2 * n // 3]
    arrival = tmp_path_factory.mktemp("inc-arrivals")
    flat = tmp_path_factory.mktemp("inc-arrivals-flat")
    for i, cond in enumerate(
        [
            F.col("doc_id") < cut1,
            (F.col("doc_id") >= cut1) & (F.col("doc_id") < cut2),
            F.col("doc_id") >= cut2,
        ]
    ):
        docs.filter(cond).coalesce(1).write.parquet(str(arrival / f"batch{i}"))
        src = [
            f for f in os.listdir(arrival / f"batch{i}") if f.endswith(".parquet")
        ][0]
        os.link(arrival / f"batch{i}" / src, flat / f"{i:03d}.parquet")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    q, get_state = stream_incremental_clusters(spark, sf_dir, docs_stream=stream)
    assert q.awaitTermination(300), "stream did not finish in time"
    state = get_state()
    assert state is not None

    got = {r.doc_id: r.cluster_id for r in state.labels.collect()}
    want = {r.doc_id: r.cluster_id for r in cluster_labels(docs).collect()}
    # docs too short for a signature are labeled by omission — they
    # must be singletons in the full run
    for d in set(want) - set(got):
        assert want[d] == d, f"unlabeled doc {d} is not a singleton"
    for d, lab in got.items():
        assert want[d] == lab, f"doc {d}: stream {lab} != full {want[d]}"
    # the stream actually saw multiple batches and real merges
    assert any(v != k for k, v in got.items())
    assert len({r.doc_id for r in state.sigs.collect()}) == len(got)


def test_fold_is_idempotent_under_epoch_redelivery(spark, sf_dir):
    """foreachBatch is at-least-once: a committed-then-redelivered
    epoch must not fold twice (duplicate signatures / conflicting
    labels). The guard keys on the epoch id."""
    from cometbft_log_etl_spark.streaming.incremental import make_epoch_fold

    docs = load(spark, sf_dir, "documents")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    fold, get_state = make_epoch_fold()
    fold(half, 0)
    s1 = get_state()
    labels1 = sorted((r.doc_id, r.cluster_id) for r in s1.labels.collect())
    n_sigs1 = s1.sigs.count()
    fold(half, 0)  # redelivery of the SAME epoch: must be a no-op
    s2 = get_state()
    assert s2 is s1
    assert sorted((r.doc_id, r.cluster_id) for r in s2.labels.collect()) == labels1
    assert s2.sigs.count() == n_sigs1
    fold(docs.filter(F.col("doc_id") % 2 == 1), 1)  # a NEW epoch folds
    s3 = get_state()
    assert s3 is not s1
    assert s3.sigs.count() > n_sigs1


def test_second_query_attachment_raises(spark, sf_dir):
    """A fold closure attached to a second writeStream restarts epochs
    at 0; silently dropping those batches would corrupt state invisibly
    (round-12 advice) — a LOWER epoch id must raise instead."""
    import pytest

    from cometbft_log_etl_spark.streaming.incremental import make_epoch_fold

    docs = load(spark, sf_dir, "documents")
    fold, _ = make_epoch_fold()
    fold(docs.filter(F.col("doc_id") % 2 == 0), 5)
    with pytest.raises(RuntimeError, match="second streaming query"):
        fold(docs.filter(F.col("doc_id") % 2 == 1), 0)


def test_reingested_doc_id_keeps_first_arrival(spark, sf_dir):
    """A doc_id re-arriving in a LATER micro-batch must not produce
    duplicate signature/label rows — first arrival wins (round-12
    advice caveat, now implemented as the batch-side anti join)."""
    from cometbft_log_etl_spark.streaming.incremental import make_epoch_fold

    docs = load(spark, sf_dir, "documents")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    fold, get_state = make_epoch_fold()
    fold(b0, 0)
    s1 = get_state()
    labels1 = sorted((r.doc_id, r.cluster_id) for r in s1.labels.collect())
    # batch 1 re-ships half of batch 0 alongside genuinely new docs
    overlap = docs.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") % 3 == 0))
    fold(docs.filter(F.col("doc_id") % 2 == 1).unionByName(overlap), 1)
    s2 = get_state()
    sig_ids = [r.doc_id for r in s2.sigs.collect()]
    assert len(sig_ids) == len(set(sig_ids)), "duplicate signature rows"
    lab_ids = [r.doc_id for r in s2.labels.collect()]
    assert len(lab_ids) == len(set(lab_ids)), "duplicate label rows"
    # and the final labels still match the full run over the TRUE corpus
    want = {r.doc_id: r.cluster_id for r in cluster_labels(docs).collect()}
    for d, lab in ((r.doc_id, r.cluster_id) for r in s2.labels.collect()):
        assert want[d] == lab
    assert labels1  # fixture sanity


def test_untouched_buckets_stay_out_of_the_pair_tier(spark):
    """The materialized band index's payoff: a second batch with NO
    shingle overlap must pull (almost) none of the stored index into
    the pair tier — per-fold pair work is bounded by the batch's
    bucket neighborhood, not the corpus (round-12 verdict item #5)."""
    from cometbft_log_etl_spark.streaming.incremental import make_epoch_fold

    docs0 = spark.createDataFrame(
        [(i, " ".join(f"alpha{i}w{j}" for j in range(12))) for i in range(40)],
        "doc_id long, text string",
    )
    docs1 = spark.createDataFrame(
        [(100 + i, " ".join(f"beta{i}w{j}" for j in range(12))) for i in range(4)],
        "doc_id long, text string",
    )
    fold, get_state = make_epoch_fold(diag=True)
    fold(docs0, 0)
    fold(docs1, 1)
    diag = get_state().diag
    assert diag["stored_band_rows"] > 0
    # disjoint vocab -> disjoint shingles -> (sig collisions aside) the
    # batch touches a vanishing share of the stored buckets
    assert diag["pair_tier_rows"] <= diag["batch_band_rows"] + 8, diag
    assert diag["pair_tier_rows"] < diag["stored_band_rows"] / 2, diag
