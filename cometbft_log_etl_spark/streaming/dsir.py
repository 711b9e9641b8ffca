"""Streaming DSIR scoring: the q105 importance weights applied online.

The fitted-model pattern (classify/countmin/tokenize/semdedup
precedents): the BATCH fit produces the 64-row log-ratio model —
hashed-ngram target-vs-raw distributions, queries/dsir.py — and the
stream scores each arriving document map-side from those ratios
inlined as a literal map (the q104 weight-map adjudication: the model
is FIXED-size by the hashing trick, never corpus-scale).

Stateless: the per-row bucket-count pairs build entirely IN-ARRAY
(the classifier's _row_bucket_pairs — at most 64 compact pairs per
row, no token explode), and the score is an exact decimal fold of
c * r[d] over that array, so the query emits in append mode with no
streaming state. Where the batch plan explodes pairs and reduces by
doc_id, the stream folds the SAME pairs inside the row — identical
under the id-uniqueness contract (q12-audited) all streaming ingest
assumes, and decimal addition is order-free, so scores are
bit-identical to batch dsir_scores (parity-tested in
tests/test_stream_dsir.py).

A bucket the fit never saw — impossible when scoring the fitted
corpus, routine on a live stream — falls back to the model's d = -1
sentinel row: the cp = cq = 0 value of the SAME ratio formula, fitted
by the same engine pass (not a stream-side re-derivation that could
de-sync).
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.classifier import _map_lit, _qc_rows, _row_bucket_pairs
from ..queries.dsir import _C_DEC, _R_DEC, dsir_ratio
from ..tables import load
from .curation import stream_documents

# fold accumulator: products are (c:19,0) x (r:14,9) -> scale 9; a
# (37,9) acc keeps every addition exact at precision 38 and the recast
# never rounds (|score| <= tokens * |r| << 1e9) — the dfold idiom
_ACC_DEC = "decimal(37,9)"


def fitted_dsir_model(spark: SparkSession, sf_dir: str):
    """(ratio items incl. the d=-1 default, as driver-held (d, Decimal)
    pairs) from the batch fit — what a production job would persist
    alongside the model version. The fit's compact pair frame is
    released before returning (the classify-twin discipline): a
    long-lived streaming job only ever needs the 65 ratios."""
    from ..session import persistent_rdd_ids, persist_tracked, release_new_persists

    docs = load(spark, sf_dir, "documents")
    before = persistent_rdd_ids(spark)
    try:
        rows = _qc_rows(docs)
        pairs = persist_tracked(
            rows.select(
                "doc_id", "source", F.explode(_row_bucket_pairs()).alias("p")
            ).select(
                "doc_id", "source", F.col("p.d").alias("d"), F.col("p.c").alias("c")
            )
        )
        items = [
            (r.d, r.r if isinstance(r.r, Decimal) else Decimal(str(r.r)))
            for r in dsir_ratio(pairs, docs, with_default=True).collect()
        ]
    finally:
        release_new_persists(spark, before)
    return items


def stream_dsir_scores(docs: DataFrame, ratio_items) -> DataFrame:
    """(doc_id, src, n_grams, score) on a live document stream, scored
    by the offline-fitted log-ratio model — map-side, stateless,
    append mode. score is bit-identical to batch dsir_scores for any
    document whose buckets the fit saw (decimal folds are order-free);
    unseen buckets take the model's own default ratio."""
    default = next(r for d, r in ratio_items if d == -1)
    rmap = _map_lit([(d, r) for d, r in ratio_items if d != -1], _R_DEC)
    rows = _qc_rows(docs).withColumn("parr", _row_bucket_pairs())
    acc0 = F.lit(0).cast(_ACC_DEC)
    score = F.aggregate(
        "parr",
        acc0,
        lambda acc, s: (
            acc
            + s["c"].cast(_C_DEC)
            * F.coalesce(
                F.element_at(rmap, s["d"]), F.lit(default).cast(_R_DEC)
            )
        ).cast(_ACC_DEC),
    )
    return rows.select(
        "doc_id",
        F.col("source").alias("src"),
        F.col("nr").alias("n_grams"),
        score.cast("double").alias("score"),
    )


def stream_dsir_scores_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convenience wiring: fit offline on sf_dir's corpus, stream the
    same corpus through the scorer."""
    items = fitted_dsir_model(spark, sf_dir)
    return stream_dsir_scores(stream_documents(spark, sf_dir), items)
