"""Streaming winnowing fingerprints: the q110 MOSS tier applied to a
live document stream.

The offline-model/online-apply split (tokenize/classify/dsir/
perplexity/bloom precedents): the BATCH run materializes the
fingerprint-share table (fingerprint → document count over the
reference corpus — the same aggregation q110's sharing tier runs),
and the stream computes each arriving document's winnowed fingerprint
set entirely IN-ARRAY (the shared winnow_fps builder — grams, window
minima, distinct; the hash/minima recipe must never exist twice),
then reports its most-shared fingerprint via a stream-static join and
ONE per-document aggregation (joins precede the aggregation, the
streaming-legal order; use update/complete mode).

A fingerprint the reference corpus never produced joins nothing and
counts as share 1 (the document itself) — exactly what the batch
report says for a fingerprint only one document carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.winnow import winnow_fps
from ..tables import load
from .curation import stream_documents


def fitted_share_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fingerprint → n_docs over the reference corpus, via the SAME
    fingerprint builder the batch query uses. Bounded by distinct
    minima (a subset of gram-hash space) — a static join side, not a
    collect."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.split("text", " ").alias("t"))
    )
    return (
        winnow_fps(docs)
        .select("doc_id", F.explode("fp").alias("f"))
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def stream_winnow_report(docs: DataFrame, share: DataFrame) -> DataFrame:
    """(doc_id, n_grams, n_windows, n_fingerprints, max_fp_share) on a
    live stream — the q110 row shape, scored against the offline share
    table."""
    fps = winnow_fps(
        docs.filter(F.col("text").isNotNull()).select(
            "doc_id", F.split("text", " ").alias("t")
        )
    )
    u = fps.select(
        "doc_id", "n_grams", "n_windows", F.size("fp").cast("bigint").alias("n_fingerprints"),
        F.explode_outer("fp").alias("f"),
    )
    joined = u.join(share.withColumnRenamed("f", "sf"), u.f == F.col("sf"), "left")
    # a zero-fingerprint doc keeps its explode_outer null row and must
    # report 0 (the batch convention); an unshared fingerprint counts
    # the document itself (share 1)
    return joined.groupBy(
        "doc_id", "n_grams", "n_windows", "n_fingerprints"
    ).agg(
        F.max(
            F.when(F.col("f").isNull(), F.lit(0)).otherwise(
                F.coalesce(F.col("n_docs"), F.lit(1))
            )
        ).cast("bigint").alias("max_fp_share")
    )


def stream_winnow_report_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convenience wiring: fit the share table offline on sf_dir's
    corpus, stream the same corpus through the reporter."""
    share = fitted_share_table(spark, sf_dir)
    return stream_winnow_report(stream_documents(spark, sf_dir), share)
