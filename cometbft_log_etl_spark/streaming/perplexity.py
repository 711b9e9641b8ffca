"""Streaming perplexity banding: the q106 CCNet tier applied online.

The offline-model/online-apply split once more (tokenize/classify/
dsir precedents), with BOTH model halves fitted by the batch code so
the online path can never de-sync:

- the per-language add-one bigram LM (c2/c1/voc) comes from
  queries.perplexity.fit_bigram_lm — VOCABULARY-bounded static tables,
  the same adjudication as the BPE length table, joined stream-static
  (per-batch hash join, no streaming state of its own);
- the head/middle/tail thresholds come from the batch q106 run over
  the fitted corpus — a LANGUAGE-sized list inlined as literal maps.
  Banding a live stream against offline tertiles is exactly CCNet's
  production shape: the quantiles are a property of the reference
  corpus, not of whatever arrived in the last micro-batch.

One aggregation (per-doc bigram count + exact-decimal log-prob sum —
use update/complete mode; a doc split across micro-batches accumulates
in that state), then the milli-nat and the band are map-side. Scores
reuse the batch expressions verbatim (_bigrams / join_lm / logp_col /
milli_col), so per-doc milli-nats are bit-identical to the batch
per-doc pass (parity-tested in tests/test_stream_perplexity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.perplexity import _bigrams, fit_bigram_lm, join_lm, milli_col
from ..tables import load
from .curation import stream_documents

# null-lang documents band against the null-lang partition's batch
# thresholds; map literals cannot key on NULL, so both sides of the
# lookup encode it as a sentinel (no real lang collides with \x00)
_NULL_LANG = "\x00<null>"


def _lang_key(col: F.Column) -> F.Column:
    return F.coalesce(col, F.lit(_NULL_LANG))


def fitted_lm_and_thresholds(spark: SparkSession, sf_dir: str):
    """((c2, c1, voc) static LM frames, [(lang_key, t1, t2), ...]) from
    the batch fit — the thresholds a production job would version
    alongside the LM tables. ONE scoring pass: the first draft ran the
    full q106 query just to read the two cuts back out, re-fitting the
    LM and re-scoring the corpus it had already fitted (round-11
    review); now the fitted frames feed the shared per-doc scorer and
    tertile helper directly."""
    from ..queries.perplexity import dist_with_tertiles

    docs = load(spark, sf_dir, "documents")
    lm = fit_bigram_lm(docs)
    c2, c1, voc = lm
    toks = docs.select("doc_id", "lang", F.split("text", " ").alias("t"))
    lp = join_lm(_bigrams(toks, "doc_id", "lang"), c2, c1, voc)
    perdoc = (
        lp.groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("nb"), F.sum("logp").alias("s"))
        .select("lang", milli_col(F.col("s"), F.col("nb")))
    )
    th = [
        (r.lang if r.lang is not None else _NULL_LANG, r.t1, r.t2)
        for r in dist_with_tertiles(perdoc).select("lang", "t1", "t2").distinct().collect()
    ]
    return lm, th


def _th_map(items, idx: int) -> F.Column:
    args = []
    for it in sorted(items):
        args.append(F.lit(it[0]))
        args.append(F.lit(int(it[idx])).cast("bigint"))
    if not args:
        return F.create_map(F.lit(_NULL_LANG), F.lit(None).cast("bigint"))
    return F.create_map(*args)


def stream_perplexity_bands(
    docs: DataFrame, lm, thresholds
) -> DataFrame:
    """(doc_id, lang, mb, band) on a live document stream — per-doc
    milli-nats bit-identical to the batch per-doc pass, banded by the
    offline tertiles."""
    c2, c1, voc = lm
    toks = docs.select("doc_id", "lang", F.split("text", " ").alias("t"))
    lp = join_lm(_bigrams(toks, "doc_id", "lang"), c2, c1, voc)
    perdoc = (
        lp.groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("nb"), F.sum("logp").alias("s"))
        .select("doc_id", "lang", milli_col(F.col("s"), F.col("nb")))
    )
    t1 = F.element_at(_th_map(thresholds, 1), _lang_key(F.col("lang")))
    t2 = F.element_at(_th_map(thresholds, 2), _lang_key(F.col("lang")))
    return perdoc.withColumn(
        "band",
        F.when(F.col("mb") >= t1, F.lit("head"))
        .when(F.col("mb") >= t2, F.lit("middle"))
        .otherwise(F.lit("tail")),
    )


def stream_perplexity_bands_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convenience wiring: fit offline on sf_dir's corpus, stream the
    same corpus through the bander."""
    lm, th = fitted_lm_and_thresholds(spark, sf_dir)
    return stream_perplexity_bands(stream_documents(spark, sf_dir), lm, th)
