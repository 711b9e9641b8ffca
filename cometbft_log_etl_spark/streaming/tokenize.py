"""Streaming BPE encode: the corpus-fitted tokenizer applied to a
document stream.

The fit (q16) is an offline, bounded-iteration job; what a lake runs
ONLINE is the encode — per-document subtoken counts under the already-
fitted merge table, the q18 surface. Same offline-model/online-apply
split as SemDeDup (streaming/semdedup.py: batch-fitted centroids,
pure-map assignment):

- the model is fitted by the BATCH code (bpe_fit_with_state — reusing
  it verbatim means the online tokenizer can never de-sync from the
  batch query it mirrors), and its final word→n_subtokens state is a
  VOCABULARY-BOUNDED static table;
- the stream explodes words and joins that static table (stream-static
  equi-join: per-batch hash join, no streaming state of its own), then
  one aggregation per doc_id yields exactly q18's row shape.

An out-of-vocabulary word — impossible when the model was fitted on
the same corpus, routine on a live stream — is encoded by applying
the fitted merge chain to the word ITSELF, map-side (the merge table
is model-sized: _N_MERGES rows of literals, the same adjudication as
SemDeDup's collected centroids). That is the EXACT tokenizer function,
not an approximation: the vocab join is purely a compute shortcut for
words the fit already reduced, and the fallback is the same greedy
chain the fit ran — so the twin encodes any word, seen or not,
exactly as the batch encoder would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.tokenizer import _DELIM, _merge_pair_expr, bpe_fit_with_state
from ..tables import load
from .curation import stream_documents


def fitted_model(spark: SparkSession, sf_dir: str) -> tuple[list[dict], DataFrame]:
    """(merge table, static (w, n_subtokens) length table) from the
    batch fit — both model-sized (merges: _N_MERGES rows; lengths:
    vocabulary-bounded, never corpus-scale)."""
    merges, state = bpe_fit_with_state(load(spark, sf_dir, "documents"))
    return merges, state.select("w", F.size("syms").alias("n_subtokens"))


def _oov_length_expr(word_col: str, merges: list[dict]) -> F.Column:
    """Subtoken count of a word under the fitted merges, computed
    map-side: split to characters, apply the greedy-leftmost merge
    chain (the SAME _merge_pair_expr the fit used — the merge rule
    must never exist twice), take the length."""
    out = F.expr(f"filter(split({word_col}, ''), x -> x <> '')")
    for m in merges:
        out = _merge_pair_expr(out, m["left"], m["right"], m["merged"])
    return F.size(out).cast("int")


def stream_bpe_token_counts(
    docs: DataFrame, merges: list[dict], lengths: DataFrame
) -> DataFrame:
    """q18 on a stream: explode words, stream-static left join against
    the fitted length table, OOV words encoded map-side by the fitted
    merge chain, one per-doc aggregation. Emits (doc_id, n_words,
    n_bpe_tokens) — use outputMode('update' or 'complete'); a doc
    split across micro-batches accumulates in the aggregation state."""
    occ = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter((F.col("w") != "") & ~F.col("w").contains(_DELIM))
    joined = occ.join(lengths, "w", "left").withColumn(
        "n_subtokens",
        F.coalesce("n_subtokens", _oov_length_expr("w", merges)),
    )
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_subtokens").cast("bigint").alias("n_bpe_tokens"),
    )


def stream_bpe_token_counts_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convenience wiring: fit offline on sf_dir's corpus, stream the
    same corpus through the encode."""
    merges, lengths = fitted_model(spark, sf_dir)
    return stream_bpe_token_counts(stream_documents(spark, sf_dir), merges, lengths)
