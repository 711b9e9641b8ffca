"""Streaming SemDeDup: online keep/drop decisions must equal batch q25
(same fitted centroids, same threshold, same min-lower-id rule) when
vectors arrive in id order across micro-batches and clusters sit below
the member cap — which the test corpus does."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cometbft_log_etl_spark.queries import catalog
from cometbft_log_etl_spark.streaming.semdedup import (
    assign_to_centroids,
    fitted_centroids,
    stream_semantic_dedup,
)
from cometbft_log_etl_spark.tables import load


def test_mapside_assignment_equals_batch(spark, sf_dir):
    """The literal-centroid map-side assignment must reproduce the batch
    round-2 assignment bit-for-bit (same decimal folds, same
    tie-break)."""
    from cometbft_log_etl_spark.queries.neardup import kmeans_assignments

    cents = fitted_centroids(spark, sf_dir)
    got = {
        r.vec_id: (r.cluster_id, r.centroid_cos)
        for r in assign_to_centroids(
            load(spark, sf_dir, "embeddings"), cents
        ).collect()
    }
    want = {
        r.vec_id: (r.cluster_id, r.cos)
        for r in kmeans_assignments(spark, sf_dir).collect()
    }
    assert got == want  # exact, including the cosine bits


@pytest.fixture(scope="module")
def stream_decisions(spark, sf_dir, tmp_path_factory):
    embs = load(spark, sf_dir, "embeddings")
    cents = fitted_centroids(spark, sf_dir)
    arrival = tmp_path_factory.mktemp("emb-arrivals")
    n = embs.count()
    cut1, cut2 = n // 3, 2 * n // 3
    for i, cond in enumerate(
        [
            F.col("vec_id") < cut1,
            (F.col("vec_id") >= cut1) & (F.col("vec_id") < cut2),
            F.col("vec_id") >= cut2,
        ]
    ):
        embs.filter(cond).coalesce(1).write.parquet(str(arrival / f"batch{i}"))
    flat = tmp_path_factory.mktemp("emb-arrivals-flat")
    for i in range(3):
        src = [f for f in os.listdir(arrival / f"batch{i}") if f.endswith(".parquet")][0]
        os.link(arrival / f"batch{i}" / src, flat / f"{i:03d}.parquet")

    stream = (
        spark.readStream.schema(embs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    q = (
        stream_semantic_dedup(stream, cents)
        .writeStream.format("memory")
        .queryName("t_stream_semdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    return spark.table("t_stream_semdedup")


def test_stream_decisions_match_batch_q25(spark, sf_dir, stream_decisions):
    batch = {
        r.vec_id: (r.cluster_id, r.centroid_cos, r.is_kept, r.dup_of)
        for r in catalog()["q25_semantic_dedup"].fn(spark, sf_dir).collect()
    }
    got = {
        r.vec_id: (r.cluster_id, round(r.centroid_cos, 9), r.is_kept, r.dup_of)
        for r in stream_decisions.collect()
    }
    assert got == batch
    # exactly one decision per vector (appends never duplicate)
    assert stream_decisions.groupBy("vec_id").count().filter(
        F.col("count") > 1
    ).count() == 0
