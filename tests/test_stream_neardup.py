"""Streaming LSH near-dup tier: the online pair set must equal the
batch q55 candidate tier (same signatures, same banding, same bucket
cap) when documents arrive in doc_id order across multiple
micro-batches."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cometbft_log_etl_spark.queries.neardup import _minhash_sigs, lsh_band_pairs
from cometbft_log_etl_spark.streaming.neardup import minhash_sig, stream_lsh_band_pairs
from cometbft_log_etl_spark.tables import load



def test_mapside_signature_equals_batch(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    a = {r.doc_id: r.sig for r in _minhash_sigs(docs).collect()}
    b = {r.doc_id: r.sig for r in minhash_sig(docs).collect()}
    assert a == b


@pytest.fixture(scope="module")
def stream_pairs(spark, sf_dir, tmp_path_factory):
    # split the documents into 3 id-ordered parquet files and stream one
    # file per trigger → 3 micro-batches with state carried across them
    docs = load(spark, sf_dir, "documents")
    arrival = tmp_path_factory.mktemp("doc-arrivals")
    n = docs.count()
    cut1, cut2 = n // 3, 2 * n // 3
    for i, cond in enumerate(
        [
            F.col("doc_id") < cut1,
            (F.col("doc_id") >= cut1) & (F.col("doc_id") < cut2),
            F.col("doc_id") >= cut2,
        ]
    ):
        docs.filter(cond).coalesce(1).write.parquet(str(arrival / f"batch{i}"))
    # flatten into one dir of part files named in batch order
    flat = tmp_path_factory.mktemp("doc-arrivals-flat")
    for i in range(3):
        src = [f for f in os.listdir(arrival / f"batch{i}") if f.endswith(".parquet")][0]
        os.link(arrival / f"batch{i}" / src, flat / f"{i:03d}.parquet")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    q = (
        stream_lsh_band_pairs(stream)
        .writeStream.format("memory")
        .queryName("t_stream_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    return spark.table("t_stream_pairs")


def test_stream_pairs_match_batch_tier(spark, sf_dir, stream_pairs):
    docs = load(spark, sf_dir, "documents")
    batch = lsh_band_pairs(_minhash_sigs(docs))
    batch_pairs = {
        (r.doc_a, r.doc_b, r.n_shared_bands) for r in batch.collect()
    }
    got = (
        stream_pairs.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        .collect()
    )
    stream_set = {(r.doc_a, r.doc_b, r.n_shared_bands) for r in got}
    assert stream_set == batch_pairs
    # pairs arrive at most once per band
    per_band = stream_pairs.groupBy("doc_a", "doc_b", "band").count()
    assert per_band.filter(F.col("count") > 1).count() == 0
