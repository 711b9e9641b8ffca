"""Streaming semantic-drift monitor: the q133 deployment shape. The
stream carries exactly the batch slice (vec_id % 10 >= 8) in two
micro-batches; the final complete-mode table must equal batch q133's
(n_batch_members, mean_cos_batch, cos_drift) bit-for-bit per touched
cluster, with the NULL-baseline semantics preserved."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cometbft_log_etl_spark.queries import catalog
from cometbft_log_etl_spark.queries.neardup import _inc_is_hist
from cometbft_log_etl_spark.tables import load


def test_stream_drift_matches_batch_q133(spark, sf_dir, tmp_path_factory):
    from cometbft_log_etl_spark.streaming.semdedup import (
        history_baselines,
        history_fitted_centroids,
        stream_semantic_drift,
    )

    cents = history_fitted_centroids(spark, sf_dir)
    baselines = history_baselines(spark, sf_dir, cents)
    assert baselines, "history slice fitted no baseline — fixture too weak"

    batch_embs = load(spark, sf_dir, "embeddings").filter(
        ~_inc_is_hist(F.col("vec_id"))
    )
    arrival = tmp_path_factory.mktemp("drift-arrivals")
    flat = tmp_path_factory.mktemp("drift-arrivals-flat")
    mid = [r.vec_id for r in batch_embs.select("vec_id").orderBy("vec_id").collect()]
    cut = mid[len(mid) // 2]
    for i, cond in enumerate([F.col("vec_id") < cut, F.col("vec_id") >= cut]):
        batch_embs.filter(cond).coalesce(1).write.parquet(str(arrival / f"b{i}"))
        src = [f for f in os.listdir(arrival / f"b{i}") if f.endswith(".parquet")][0]
        os.link(arrival / f"b{i}" / src, flat / f"{i:03d}.parquet")

    stream = (
        spark.readStream.schema(batch_embs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    q = (
        stream_semantic_drift(stream, cents, baselines)
        .writeStream.format("memory")
        .queryName("t_stream_drift")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    got = {r.cluster_id: r for r in spark.table("t_stream_drift").collect()}

    want = {r.cluster_id: r for r in catalog()["q133_semantic_drift"].fn(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for cid, w in want.items():
        g = got[cid]
        assert g.n_arrivals == w.n_batch_members
        assert g.mean_cos_arrivals == w.mean_cos_batch  # bit-equal decimal path
        assert g.baseline_cos == w.mean_cos_hist
        assert g.cos_drift == w.cos_drift
    # the stream really saw >1 micro-batch and a real baseline
    assert any(w.cos_drift is not None for w in want.values())
