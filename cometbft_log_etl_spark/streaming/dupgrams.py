"""Stateful foreachBatch fold for the UNCAPPED ExactSubstr tier: the
gram-count index as streaming state, emitting q136's span DELTA per
micro-batch.

The deployment picture this completes (round 14): q119 is the
full-corpus detect, q132 the apply, streaming/substring.py's
stream_duplicated_scrub the crawl-time apply against FITTED state —
and this fold is the DETECT side run continuously: every arriving
micro-batch folds its gram counts into the stored index and emits
exactly the span rows downstream span tables must upsert (all spans of
the batch's documents + the full replacement span set of every stored
document that a newly-duplicated gram touched — the q136 delta
contract, so the batch query and this fold can never disagree on what
"the delta" means).

State (driver-held handles, eagerly checkpointed like the clustering
fold's ClusterState):
- counts: (g, n) gram counts over everything folded so far — the
  index a nightly job would persist;
- grams:  (doc_id, p, g) stored gram positions — what lets the fold
  rebuild an affected stored document's spans without re-tokenizing
  its text (a lake deployment stores this table anyway; it is the
  corpus-side artifact of the one tokenize pass).

Caveats mirrored from the clustering fold: re-ingested doc_ids drop
(first arrival wins — folding a doc twice would double its own gram
counts and self-duplicate it), and the fold is epoch-guarded via the
shared epoch_guarded wrapper (redelivered micro-batch folds once; a
second attached query raises)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.datapipe import corpus_grams, spans_from_dup_positions
from .curation import stream_documents
from .incremental import epoch_guarded


@dataclass
class GramIndexState:
    """Driver-held handles to the two checkpointed state frames, plus
    the last fold's emitted delta (for sinks/tests)."""

    counts: DataFrame  # (g, n)
    grams: DataFrame  # (doc_id, p, g) for every stored doc
    delta: DataFrame | None = None  # last fold's q136-contract rows


def fold_gram_batch(
    state: Optional[GramIndexState], batch_docs: DataFrame
) -> GramIndexState:
    """One maintenance round: fold an arriving document batch into the
    gram index and compute the span delta. ``state=None`` is the first
    batch (empty history). All state frames are eagerly checkpointed so
    the next fold never replays this one's plans."""
    bg = corpus_grams(batch_docs)
    if state is None:
        hist_counts = bg.groupBy("g").agg(F.count(F.lit(1)).alias("n")).limit(0)
        hist_grams = bg.limit(0)
    else:
        hist_counts, hist_grams = state.counts, state.grams
    # first arrival wins (the clustering fold's re-ingestion rule)
    bg = bg.join(
        hist_grams.select("doc_id").distinct(), "doc_id", "anti"
    ).localCheckpoint(eager=True)
    bcnt = bg.groupBy("g").agg(F.count(F.lit(1)).alias("bn"))
    tot = (
        hist_counts.withColumnRenamed("n", "hn")
        .join(bcnt, "g", "full")
        .select(
            "g",
            F.coalesce("hn", F.lit(0)).alias("hn"),
            F.coalesce("bn", F.lit(0)).alias("bn"),
        )
    )
    new_counts = tot.select(
        "g", (F.col("hn") + F.col("bn")).alias("n")
    ).localCheckpoint(eager=True)
    dup_new = tot.filter(F.col("hn") + F.col("bn") >= 2).select("g")
    newly = tot.filter((F.col("hn") < 2) & (F.col("hn") + F.col("bn") >= 2)).select("g")
    affected = hist_grams.join(newly, "g", "semi").select("doc_id").distinct()
    targets = bg.unionByName(hist_grams.join(affected, "doc_id", "semi"))
    dup_pos = targets.join(dup_new, "g", "semi").select("doc_id", "p")
    batch_ids = bg.select("doc_id").distinct().withColumn("_b", F.lit(1))
    delta = (
        spans_from_dup_positions(dup_pos)
        .join(batch_ids, "doc_id", "left")
        .withColumn("is_batch", F.col("_b").isNotNull())
        .drop("_b")
        .localCheckpoint(eager=True)
    )
    return GramIndexState(
        counts=new_counts,
        grams=hist_grams.unionByName(bg).localCheckpoint(eager=True),
        delta=delta,
    )


def make_gram_epoch_fold():
    """(fold, get_state) for writeStream.foreachBatch — the shared
    epoch guard around fold_gram_batch."""
    return epoch_guarded(fold_gram_batch)


def stream_incremental_spans(
    spark: SparkSession,
    sf_dir: str,
    docs_stream: Optional[DataFrame] = None,
):
    """Attach the gram-index fold to a document arrival stream.
    Returns ``(query, get_state)``: await the query, then read the
    final GramIndexState (and its last delta) from ``get_state()``."""
    if docs_stream is None:
        docs_stream = stream_documents(spark, sf_dir)
    fold, get_state = make_gram_epoch_fold()
    q = (
        docs_stream.writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .start()
    )
    return q, get_state
