"""Streaming twin of the line-dedup tier (q111/q112) — the CCNet
first pass over a live document stream.

The lake shape this mirrors: the duplicate-line hash set is a STATIC
frame fitted by the SAME batch builders the catalog queries run
(doc_line_hashes -> duplicate_line_set — the fitted-model pattern, so
the online scrub can never de-sync from the offline one), and each
arriving micro-batch is line-exploded map-side and stream-static
LEFT-joined against it BEFORE the one per-doc aggregation (streaming
forbids joins after aggregations — the q108 bloom-twin shape).
Reassembly happens INSIDE that aggregation: a position-sorted
collect_list of the kept lines, so the output rows are exactly batch
q112's shape and the parity test asserts row-for-row equality. Write
with outputMode('complete') (or 'update' for a changelog sink); state
is the per-doc aggregation only, no join state.

Batch q112 masks in-array against per-doc removal lists instead —
the better batch plan (line text never transits a shuffle) — but a
stream must scrub documents the fit corpus never saw, for which no
per-doc removal list can exist; joining the hash SET generalizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.linedup import _norm, doc_line_hashes, duplicate_line_set, line_arrays
from ..tables import load
from .curation import stream_documents


def fitted_duplicate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The static duplicate-line hash set fitted on the batch corpus.

    OWNERSHIP CONTRACT (the round-11 bloom-twin advice, applied at
    birth here): the returned frame IS a live persist_tracked cache —
    without it every micro-batch re-runs the full corpus vote — and
    the CALLER owns its release (df.unpersist(), or a
    persistent_rdd_ids/release_new_persists harness as the tests do).
    Repeated fits in one session otherwise accumulate persisted RDDs.
    """
    from ..session import persist_tracked

    docs = load(spark, sf_dir, "documents")
    return persist_tracked(duplicate_line_set(doc_line_hashes(docs)))


def scrub_lines_exploded(docs: DataFrame, dup: DataFrame) -> DataFrame:
    """The explode -> stream-static join -> single-aggregation scrub.
    `docs` may be a stream or a batch frame (the parity test runs the
    SAME function on the batch frame to pin the two plans to one
    semantics); `dup` must be a static (h)-distinct frame."""
    ex = line_arrays(docs).select(
        "doc_id", "source", F.posexplode("ls").alias("pos", "line")
    )
    nrm = _norm(F.col("line"))
    keyed = ex.withColumn(
        "h", F.when(nrm != "", F.md5(nrm.cast("binary")))
    )
    j = keyed.join(dup.withColumn("_dup", F.lit(1)), "h", "left")
    removed = F.col("h").isNotNull() & F.col("_dup").isNotNull()
    kept_struct = F.when(~removed, F.struct("pos", "line"))
    return j.groupBy("doc_id").agg(
        F.any_value("source").alias("source"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.when(removed, 1).otherwise(0)).cast("bigint").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["line"]
            ),
            "\n",
        ).alias("scrubbed_text"),
    )


def stream_line_scrub(
    spark: SparkSession, sf_dir: str, dup: DataFrame | None = None
) -> DataFrame:
    """q112 on a stream: the document stream scrubbed against the
    batch-fitted duplicate-line set. Emits q112's exact row shape.
    Pass a pre-fitted `dup` to share one cache across queries (see
    fitted_duplicate_lines' ownership contract)."""
    if dup is None:
        dup = fitted_duplicate_lines(spark, sf_dir)
    return scrub_lines_exploded(stream_documents(spark, sf_dir), dup)
