"""Streaming Bloom ingestion screen: q108 applied to a live arrival
stream — the structure's native habitat (a crawler's seen-content set).

The offline-model/online-apply split (tokenize/classify/dsir/
perplexity precedents), with both halves produced by the BATCH code:

- the position set and the m scalar come from the same fingerprint →
  position pipeline q108 runs (shared builders — the hash recipe must
  never exist twice), materialized once per model version;
- the history fingerprint table for the exact-verify tier is the same
  frame q108 joins.

Shape: each arriving document's k positions build from its fingerprint
row, the screen and the exact tier are BOTH stream-static left joins
applied BEFORE the one per-document aggregation (streaming forbids
joins after aggregations; the BPE-twin shape), and the verdict is a
stateless projection of that aggregate — use update/complete mode, a
document split across micro-batches accumulates in the aggregation
state. Verdicts are identical to the batch screen's per-document
classification and the per-source totals match the q108 report
(parity-tested in tests/test_stream_bloom.py).

Online, the exact tier joins every document (the join is per-row work
either way inside a micro-batch); the Bloom verdict's value on the
stream is the deployment where history is NOT locally joinable — only
the compact position set ships to the ingest edge and 'maybe' routes
to a remote exact check — plus false-positive instrumentation. A
production deployment refreshes the position set as ingested batches
graduate into history; the refresh cadence bounds the window in which
a duplicate-of-a-very-recent-document reads as new — the staleness
contract of any periodically rebuilt seen-set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.bloom import (
    _HIST_CUT,
    _HIST_MOD,
    _pos_array,
    bloom_m_frame,
    corpus_fingerprints,
    history_fingerprints,
)
from ..tables import load
from .curation import stream_documents


def fitted_bloom(spark: SparkSession, sf_dir: str):
    """(m scalar, position-set frame, history-fp frame) from the batch
    pipeline — the q108 history side via the SAME shared builders the
    batch screen uses (fingerprint recipe, history split, m sizing —
    round-11 review de-duplicated them), reusable as stream-static
    join inputs. m is ONE driver-held integer; the frames stay
    distributed (the position set is history-sized in bits, not
    collectable by fiat at lake scale — AQE decides the join strategy
    per micro-batch).

    OWNERSHIP CONTRACT (round-11 advice, the linedup-twin wording):
    the returned history frame IS a live persist_tracked cache —
    without it the m count, the position explode, and the caller's
    exact-verify join each re-scan the corpus — and the CALLER owns
    its release (hist.unpersist(), or a persistent_rdd_ids/
    release_new_persists harness as the tests do). Repeated fits in
    one session otherwise accumulate persisted RDDs; a long-lived
    streaming job keeps the cache for the life of the model version.
    """
    from ..session import persist_tracked

    # persist: the m count, the position explode, AND the caller's
    # exact-verify static side all read the distinct history
    # fingerprints — uncached, each re-scans the corpus (the q25/dsir
    # precedent; round-11 review). A long-lived streaming job keeps
    # the cache for the life of the model; test harnesses release it
    # via their snapshot/release wrappers.
    hist = persist_tracked(
        history_fingerprints(corpus_fingerprints(load(spark, sf_dir, "documents")))
    )
    m = bloom_m_frame(hist).collect()[0].m
    hpos = (
        hist.withColumn("m", F.lit(m).cast("bigint"))
        .select(F.explode(_pos_array()).alias("pos"))
        .distinct()
    )
    return m, hpos, hist


def stream_bloom_screen(
    docs: DataFrame, m: int, hpos: DataFrame, hist: DataFrame
) -> DataFrame:
    """(doc_id, source, verdict) on a live document stream — verdict in
    {'new', 'dup', 'fp'}, matching the batch screen's per-document
    classification. The same code runs on a batch frame (joins +
    groupBy are engine ops either way), which is what the parity test
    exploits."""
    fp = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        "source",
        F.md5(F.col("text").cast("binary")).alias("fp"),
    )
    bpos = fp.withColumn("m", F.lit(m).cast("bigint")).select(
        "doc_id", "source", "fp", F.explode(_pos_array()).alias("pos")
    )
    histr = hist.select(F.col("fp").alias("hfp")).withColumn("dup", F.lit(1))
    joined = bpos.join(hpos.withColumn("hit", F.lit(1)), "pos", "left").join(
        histr, F.col("fp") == F.col("hfp"), "left"
    )
    scr = joined.groupBy("doc_id", "source", "fp").agg(
        (F.sum(F.coalesce(F.col("hit"), F.lit(0))) == F.count(F.lit(1))).alias(
            "maybe"
        ),
        F.max("dup").alias("dup"),
    )
    return scr.select(
        "doc_id",
        "source",
        F.when(~F.col("maybe"), F.lit("new"))
        .when(F.col("dup") == 1, F.lit("dup"))
        .otherwise(F.lit("fp"))
        .alias("verdict"),
    )


def stream_bloom_screen_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convenience wiring: fit the seen-set offline on sf_dir's history
    slice, stream the BATCH slice through the screen (the q108 split)."""
    m, hpos, hist = fitted_bloom(spark, sf_dir)
    batch = stream_documents(spark, sf_dir).filter(
        F.col("doc_id") % _HIST_MOD >= _HIST_CUT
    )
    return stream_bloom_screen(batch, m, hpos, hist)
