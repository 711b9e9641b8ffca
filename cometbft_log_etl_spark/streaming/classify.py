"""Streaming quality-classifier scoring: the q104 model applied online.

The fitted-model pattern once more (countmin/tokenize/substring/
semdedup precedents): the BATCH fit (fit_quality_classifier — the
steepest-descent rounds run offline) produces the 67-weight model, and
the stream scores each arriving document map-side from those weights
inlined as a literal map — the same _qc_pred_col fold and the same
_farr_from feature assembly the batch path uses, so online scores can
never de-sync from offline ones (bit-identical, parity-tested in
tests/test_stream_classify.py).

Stateless: the per-row feature array builds entirely IN-ARRAY (a
stream allows one aggregation and this spends zero) and the score is
the batch path's exact decimal fold, so the query emits in append mode
with no streaming state. The one difference from batch: per-doc
quantities come from the single arriving row rather than a GROUP BY
doc_id merge, which is identical under the id-uniqueness contract
(q12-audited) that all streaming ingest already assumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.classifier import (
    _map_lit,
    _QC_FLAG,
    _qc_pred_col,
    _qc_rows,
    _stream_farr,
    _W_DEC,
    fit_quality_classifier,
)
from ..tables import load
from .curation import stream_documents


def fitted_quality_weights(spark: SparkSession, sf_dir: str):
    """Run the offline fit and return the driver-held weight dict —
    what a production job would persist alongside the model version.
    The fit's corpus-sized feature cache is released before returning
    (round-11 review): a long-lived streaming job only ever needs the
    67 weights afterwards, and an unreleased persist would pin the
    feature frame for the life of the session."""
    from ..session import persistent_rdd_ids, release_new_persists

    before = persistent_rdd_ids(spark)
    try:
        _, w = fit_quality_classifier(load(spark, sf_dir, "documents"))
    finally:
        release_new_persists(spark, before)
    return w


def stream_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, src, y, score, flagged) on a live document stream,
    scored by the offline-fitted weights — map-side, stateless, append
    mode. score is bit-identical to batch classifier_scores (shared
    feature assembly + exact decimal fold; array order is
    irrelevant)."""
    w = fitted_quality_weights(spark, sf_dir)
    wmap = _map_lit(list(w.items()), _W_DEC)
    rows = _qc_rows(stream_documents(spark, sf_dir))
    # _stream_farr, not _farr_from: the merge-based builder references
    # its pair array inside lambdas, which re-evaluates an inline
    # EXPRESSION per element (round-11 review — the bucket fold was
    # re-running up to 64x per row); the stream's pairs are already
    # unique-bucket so no merge is needed
    return (
        rows.withColumn("farr", _stream_farr(F.col("nr"), F.col("ur")))
        .select(
            "doc_id",
            F.col("source").alias("src"),
            F.col("yr").alias("y"),
            F.round(_qc_pred_col(wmap), 9).cast("double").alias("score"),
        )
        .withColumn("flagged", F.col("score") >= F.lit(_QC_FLAG))
    )
