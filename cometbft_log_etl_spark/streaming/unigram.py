"""Streaming unigram-LM encode: the corpus-fitted tokenizer applied to
a document stream.

Same offline-model/online-apply split as the BPE twin
(streaming/tokenize.py) and SemDeDup (streaming/semdedup.py): the fit
(q121) is an offline bounded-iteration job; what a lake runs ONLINE is
the encode — per-document Viterbi token counts under the already-
fitted piece model, the q122 surface.

- the model is fitted by the BATCH code (unigram_fit_with_state —
  reusing it verbatim means the online tokenizer can never de-sync
  from the batch query it mirrors); its word -> n_pieces encode state
  is a VOCABULARY-BOUNDED static table;
- the stream explodes words and joins that static table (stream-static
  equi-join, no streaming state of its own), then one aggregation per
  doc_id yields exactly q122's row shape.

An out-of-vocabulary WORD — impossible when the model was fitted on
the same corpus, routine on a live stream — is segmented map-side by
the SAME Viterbi fold the fit ran (the model is a literal map, the
SemDeDup collected-centroids adjudication), under the same
length-bound fallback rule. An out-of-vocabulary CHARACTER inside
such a word has no fitted log-prob; it scores the _UNK_LOGP floor as
its own single piece (SentencePiece's <unk> convention) — that floor
is unreachable on fit-corpus words, so batch parity is exact wherever
q122 is defined, and the <unk> path is pinned by its own test."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.unigram import _UNI_LMAX, _viterbi_dp, unigram_fit_with_state
from ..tables import load
from .curation import stream_documents

# <unk> floor: far below any fitted add-one log-prob (|ln p| < ~30 for
# any corpus countable in BIGINT), so a segmentation only pays it when
# an unknown character forces it.
_UNK_LOGP = Decimal("-9999.000000000")


def fitted_model(spark: SparkSession, sf_dir: str):
    """(model dict {piece: logp}, static (w, n_pieces, fallback) encode
    table) from the batch fit — model is vocab-sized, the encode table
    vocabulary-bounded, never corpus-scale."""
    model_rows, enc = unigram_fit_with_state(spark, load(spark, sf_dir, "documents"))
    return {r.piece: r.logp for r in model_rows}, enc


def _oov_pieces_expr(wcol: F.Column, model: dict) -> F.Column:
    """Piece count of an unseen word: the fitted Viterbi fold with the
    <unk> single-char floor, under the same _UNI_LMAX fallback rule as
    the batch encoder."""
    dp = _viterbi_dp(wcol, model, unk_logp=_UNK_LOGP)
    return F.when(F.length(wcol) > _UNI_LMAX, F.length(wcol)).otherwise(
        F.size(F.element_at(dp, F.length(wcol) + 1)["path"])
    )


def stream_unigram_token_counts(
    docs: DataFrame, model: dict, enc: DataFrame
) -> DataFrame:
    """q122 on a stream: explode words, stream-static left join against
    the fitted encode table, OOV words segmented map-side by the fitted
    model, one per-doc aggregation. Emits (doc_id, n_words, n_tokens,
    n_fallback_words) — use outputMode('update' or 'complete'); a doc
    split across micro-batches accumulates in the aggregation state."""
    occ = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    if enc is None:
        # Wordless fit corpus (batch q122's enc-is-None branch): no
        # fitted vocabulary, so every streamed word is OOV. An empty
        # static frame with the encode schema keeps the one
        # stream-static join shape; the OOV fold (model={} -> every
        # char scores the <unk> floor) segments everything map-side.
        enc = occ.sparkSession.createDataFrame(
            [], "w string, n_pieces bigint, fallback boolean"
        )
    joined = (
        occ.join(enc, "w", "left")
        .withColumn(
            "n_pieces",
            F.coalesce("n_pieces", _oov_pieces_expr(F.col("w"), model)).cast("bigint"),
        )
        .withColumn(
            "fallback", F.coalesce("fallback", F.length("w") > _UNI_LMAX)
        )
    )
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_pieces").cast("bigint").alias("n_tokens"),
        F.sum(F.col("fallback").cast("int")).cast("bigint").alias("n_fallback_words"),
    )


def stream_unigram_token_counts_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convenience wiring: fit offline on sf_dir's corpus, stream the
    same corpus's documents, encode online."""
    model, enc = fitted_model(spark, sf_dir)
    return stream_unigram_token_counts(stream_documents(spark, sf_dir), model, enc)
