"""foreachBatch deployment of the q114 incremental cluster maintenance.

q114 is the per-round maintenance QUERY (batch vs history, contracted
frontier, labels bit-identical to a full re-run); this module is the
DEPLOYMENT shape — a Structured Streaming job whose foreachBatch fold
applies exactly that step to each arriving micro-batch, carrying three
distributed state frames forward:

- ``sigs``  (doc_id, sig): the MinHash signature of every ingested doc
  — the stored model; arriving batches NEVER re-scan historical text.
- ``bands`` (doc_id, sig, band, bucket): the MATERIALIZED band->bucket
  index, CAPPED per bucket (round-12 advice item — previously each
  fold re-banded the whole stored signature table). Each fold bands
  only the ARRIVING docs; stored index rows enter the pair tier only
  when their bucket is touched by the batch (broadcast semi-join on
  the batch's bucket keys — the stored index is never shuffled for an
  untouched bucket), and only touched buckets are re-capped on update.
  Storing the CAPPED index is exact: min-k is idempotent under union
  (min-k(min-k(A) ∪ B) = min-k(A ∪ B)), so the admitted pair set is
  identical to a full re-band — parity-pinned against batch q114 /
  full cluster_labels re-runs in tests/test_stream_incremental.py.
- ``labels`` (doc_id, cluster_id): the resolved clustering after every
  fold, updated by mapping each stored label through the merge loop's
  contracted-component output (the compose step the iterated-
  maintenance parity test pins against union-find).

Why foreachBatch and not a streaming aggregation: cluster merging is
iterate-to-fixpoint (Hash-Min over the contracted frontier), which no
single streaming aggregation expresses — the fold IS q114's plan, run
per micro-batch with localCheckpoints carrying the state.

Scale/fidelity caveats, documented not hidden: (1) the LSH bucket cap
is evaluated against the per-arrival snapshot, so on a corpus where a
degenerate bucket exceeds the cap the admitted pair set depends on
arrival order — identical to how any capped incremental index behaves;
the parity tests run below the cap. (2) doc_ids re-arriving in a LATER
micro-batch (re-ingestion) are dropped as already-ingested (first
arrival wins — the anti-join in fold_batch), mirroring the batch
side's ID_UNIQUENESS_CONTRACT_FAMILY posture; WITHIN one micro-batch
doc_id uniqueness is the source contract, same as the batch queries.
Cites q114 (queries/neardup.py) for the maintenance algebra;
reference parity: the reference has no incremental surface — this is
extension surface (SURVEY.md training-data pipeline tier).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.neardup import (
    _minhash_sigs,
    band_rows,
    bucket_pair_expand,
    capped_bucket_rows,
    cc_seed,
    contract_frontier,
    hash_min_components,
    jaccard_sym_edges,
)
from .curation import stream_documents


@dataclass
class ClusterState:
    """Driver-held handles to the three checkpointed state frames."""

    sigs: DataFrame
    bands: DataFrame
    labels: DataFrame
    # per-fold observability: rows the pair tier actually consumed vs
    # rows the stored index holds — the tests assert untouched buckets
    # stay out of the pair tier (the materialized-index payoff)
    diag: dict | None = None


def fold_batch(
    state: Optional[ClusterState], batch_docs: DataFrame, diag: bool = False
) -> ClusterState:
    """One maintenance round: fold an arriving document batch into the
    clustering. ``state=None`` means the first batch (empty history).
    Returns the NEW state; all frames are eagerly checkpointed so the
    next fold's plans never replay this one's work.

    ``diag=True`` additionally counts stored/touched/batch band rows
    into ``ClusterState.diag`` — three extra count() actions per fold,
    so it is opt-in for tests/audits, never the hot deployment path
    (round-13 advice)."""
    sigs_b = _minhash_sigs(batch_docs).localCheckpoint(eager=True)
    if state is None:
        hist_sigs = sigs_b.limit(0)
        hist_bands = band_rows(sigs_b).limit(0)
        hist_labels = sigs_b.select(
            "doc_id", F.col("doc_id").alias("cluster_id")
        ).limit(0)
    else:
        hist_sigs, hist_bands, hist_labels = state.sigs, state.bands, state.labels
    # re-ingested doc_ids are already in the index — first arrival wins
    # (caveat (2) in the module docstring); the batch side is the small
    # side, so this never shuffles more than the arriving docs
    sigs_b = sigs_b.join(hist_sigs.select("doc_id"), "doc_id", "anti").localCheckpoint(
        eager=True
    )
    bands_b = band_rows(sigs_b)
    # the batch's bucket keys broadcast against the stored index: index
    # rows in untouched buckets are NEVER shuffled into the pair tier
    keys_b = bands_b.select("band", "bucket").distinct()
    touched_hist = hist_bands.join(F.broadcast(keys_b), ["band", "bucket"], "semi")
    untouched_hist = hist_bands.join(F.broadcast(keys_b), ["band", "bucket"], "anti")
    # checkpointed ONCE before fanning out to its consumers (pair tier,
    # new_bands checkpoint, optional diag) — the capped-rank window
    # otherwise recomputes per consumer (round-13 advice)
    capped_touched = capped_bucket_rows(
        touched_hist.unionByName(bands_b)
    ).localCheckpoint(eager=True)
    # candidate pairs over the touched buckets only; pairs with both
    # endpoints stored are already folded into hist_labels and must not
    # re-enter the loop (they can only arise under cap displacement)
    ba = sigs_b.select(F.col("doc_id").alias("a"), F.lit(1).alias("_ba"))
    bb = sigs_b.select(F.col("doc_id").alias("b"), F.lit(1).alias("_bb"))
    frontier = (
        jaccard_sym_edges(bucket_pair_expand(capped_touched))
        .join(ba, "a", "left")
        .join(bb, "b", "left")
        .filter(F.col("_ba").isNotNull() | F.col("_bb").isNotNull())
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    contracted = contract_frontier(frontier, hist_labels)
    merged = hash_min_components(cc_seed(contracted), contracted)
    ml = merged.select(F.col("doc_id").alias("node"), F.col("cluster_id").alias("_m"))
    # compose: stored labels map through their CLUSTER id (the node the
    # contraction used); new docs map through their own id
    prev = (
        hist_labels.join(ml, hist_labels.cluster_id == ml.node, "left")
        .select("doc_id", F.coalesce("_m", "cluster_id").alias("cluster_id"))
    )
    newb = (
        sigs_b.select("doc_id")
        .join(ml, sigs_b.doc_id == ml.node, "left")
        .select("doc_id", F.coalesce("_m", "doc_id").alias("cluster_id"))
    )
    new_bands = untouched_hist.unionByName(capped_touched).localCheckpoint(eager=True)
    diag_counts = (
        {
            "stored_band_rows": hist_bands.count(),
            "pair_tier_rows": capped_touched.count(),
            "batch_band_rows": bands_b.count(),
        }
        if diag
        else None
    )
    return ClusterState(
        sigs=hist_sigs.unionByName(sigs_b).localCheckpoint(eager=True),
        bands=new_bands,
        labels=prev.unionByName(newb).localCheckpoint(eager=True),
        diag=diag_counts,
    )


def stream_incremental_clusters(
    spark: SparkSession,
    sf_dir: str,
    docs_stream: Optional[DataFrame] = None,
):
    """Attach the maintenance fold to a document arrival stream.

    Returns ``(query, get_state)``: await the query, then read the
    final ClusterState from ``get_state()``. Documents with fewer than
    3 tokens never produce a signature (the q55 shingle rule) and are
    labeled by omission — downstream treats missing as singleton,
    exactly like cluster_labels' left join."""
    if docs_stream is None:
        docs_stream = stream_documents(spark, sf_dir)
    fold, get_state = make_epoch_fold()
    q = (
        docs_stream.writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .start()
    )
    return q, get_state


def epoch_guarded(step):
    """(fold, get_state): wrap a ``state, batch_df -> state`` step so it
    is idempotent under Structured Streaming's at-least-once batch
    redelivery — the guard the clustering fold shipped in round 12,
    factored (round 14) so every stateful foreachBatch fold in the
    engine shares one redelivery semantics. foreachBatch documents that
    a micro-batch whose side effects completed but whose commit failed
    is RE-RUN with the same epoch id — an unguarded fold would fold the
    batch into state twice. The guard skips a REDELIVERED epoch (same
    id); a LOWER epoch id cannot occur within one query (batch ids are
    monotonic) — it means the fold closure was attached to a SECOND
    writeStream.start(), whose epochs restart at 0, and silently
    dropping its batches would corrupt the state invisibly (round-12
    advice), so that raises instead: a fold is single-query by
    construction — make a fresh one per query."""
    holder: dict = {"state": None, "last_epoch": None}

    def fold(batch_df: DataFrame, epoch: int) -> None:
        last = holder["last_epoch"]
        if last is not None:
            if epoch == last:
                return  # redelivered epoch: state already reflects it
            if epoch < last:
                raise RuntimeError(
                    f"epoch {epoch} after {last}: this fold was attached to a "
                    "second streaming query — create a fresh fold per query"
                )
        holder["state"] = step(holder["state"], batch_df)
        holder["last_epoch"] = epoch

    return fold, lambda: holder["state"]


def make_epoch_fold(diag: bool = False):
    """The clustering fold behind the shared epoch guard — see
    epoch_guarded for the redelivery semantics."""
    return epoch_guarded(lambda state, batch: fold_batch(state, batch, diag=diag))
