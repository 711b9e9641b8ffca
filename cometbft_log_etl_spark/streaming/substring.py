"""Streaming substring-containment screen: the q47 incremental screen
with the batch as a live stream.

The lake shape this mirrors: the history gram set is a STATIC frame
(in production, a table the nightly job maintains; here, derived from
the history slice by the same batch code q47 runs — the fitted-model
pattern, so the online screen can never de-sync), and each arriving
micro-batch of documents is gram-exploded map-side and stream-static
LEFT-joined against it, then one per-doc aggregation emits the q47 row
shape. No streaming state beyond the single aggregation; the history
frame never re-screens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.datapipe import (
    apply_span_scrub,
    doc_distinct_grams,
    scrub_spans,
    substring_containment,
)
from ..tables import load
from .curation import stream_documents


def history_gram_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The static distinct-gram frame of the ingested history (q13's
    slice convention: doc_id % 10 < 8)."""
    docs = load(spark, sf_dir, "documents")
    return (
        doc_distinct_grams(docs.filter(F.col("doc_id") % 10 < 8))
        .select("g")
        .distinct()
    )


def stream_substring_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q47 on a stream: the document stream filtered to the batch slice,
    screened against the static history gram set. Emits q47's exact
    row shape; write with outputMode('complete') (or 'update' for a
    changelog sink)."""
    stream = stream_documents(spark, sf_dir).filter(F.col("doc_id") % 10 >= 8)
    return substring_containment(stream, history_gram_set(spark, sf_dir))


def stream_substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q46 on a stream (round-9 verdict 'what's missing' #3): the
    span-removal half of the substring tier with the documents as a
    live stream and the q45-derived span lists as the STATIC side of a
    stream-static left join — the fitted-model pattern again (the
    batch run detection produces the spans, so the online scrub can't
    de-sync from the offline one). The masking is per-row in-array
    after the join (map-side), so the query is stateless and emits in
    append mode; output rows are exactly batch q46's shape.

    The span frame is persist_tracked (round-11 review): without the
    cache, EVERY micro-batch re-executes the full q45 run detection —
    the most expensive plan in the substring tier — where batch q46
    pays it once; cached, each trigger is a cheap join against the
    bounded span list (q45's caps bound it, never corpus-scale)."""
    from ..session import persist_tracked

    spans = persist_tracked(scrub_spans(load(spark, sf_dir, "documents")))
    return apply_span_scrub(stream_documents(spark, sf_dir), spans)


def stream_selfrep_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q103 on a stream: the intra-document repetition scrub with the
    batch-fitted LATER-copy span lists as the static side — the same
    shape as stream_substring_scrub with q102's selfrep_spans as the
    model (shared apply_span_scrub masking, so online output is
    bit-identical to batch q103; parity-tested). Cached for the same
    reason: the q102 run detection must not re-run per micro-batch."""
    from ..queries.datapipe import selfrep_spans
    from ..session import persist_tracked

    spans = persist_tracked(selfrep_spans(load(spark, sf_dir, "documents")))
    return apply_span_scrub(stream_documents(spark, sf_dir), spans)


def fitted_duplicated_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNCAPPED tier's fitted state: q119's duplicated-gram set
    (grams with corpus count >= 2), computed by the BATCH kernel
    (corpus_grams -> duplicated_gram_set) so the crawl-time scrubber
    can never de-sync from the nightly detect pass. Bounded by the
    corpus's distinct duplicated grams — a static table the nightly
    job maintains, NOT streaming state. persist_tracked so micro-
    batches join the materialized set instead of re-counting grams."""
    from ..queries.datapipe import corpus_grams, duplicated_gram_set
    from ..session import persist_tracked

    return persist_tracked(
        duplicated_gram_set(corpus_grams(load(spark, sf_dir, "documents")))
    )


def stream_duplicated_scrub(docs: DataFrame, dup_g: DataFrame) -> DataFrame:
    """q132 on a stream — the CRAWL-TIME deployment shape of the
    uncapped ExactSubstr tier (round-13 verdict #6): each arriving
    document is gram-exploded map-side, stream-static LEFT-joined
    against the fitted duplicated-gram set, and ONE per-doc aggregation
    collects its flagged positions; the post-aggregation projection
    rebuilds maximal islands in-array (gap > _SUB_K, the q119 rule as
    an array fold — streams cannot run the batch kernel's lag/sum
    window) and masks with the SHARED span_mask_cols kernel. Output is
    exactly batch q132's row shape; use outputMode('update'/'complete').

    Semantics vs batch: a position is scrubbed iff its gram is in the
    FITTED set. Streaming the fit corpus reproduces q132 bit-for-bit
    (parity-tested); on genuinely new documents, spans duplicated only
    WITHIN the arriving crawl (never seen by the fit) are left for the
    next nightly detect pass — the published ExactSubstr deployment
    split. State: the per-doc aggregation keys on doc_id (the q122/q106
    twin convention); the static side is the fitted set, never grown
    by the stream."""
    from ..queries.datapipe import _SUB_K, _sub_gram_md5, span_mask_cols

    toks = docs.select(
        "doc_id", F.filter(F.split("text", " "), lambda x: x != "").alias("t")
    ).filter(F.size("t") >= 1)
    gram_arr = F.when(
        F.size("t") >= _SUB_K,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - _SUB_K),
            lambda i: F.struct(i.alias("p"), _sub_gram_md5("t", i).alias("g")),
        ),
    ).otherwise(F.array().cast("array<struct<p:int,g:string>>"))
    occ = toks.select("doc_id", "t", F.explode_outer(gram_arr).alias("pg")).select(
        "doc_id",
        "t",
        F.col("pg.p").alias("p"),
        F.col("pg.g").alias("g"),
    )
    j = occ.join(dup_g.withColumn("_dup", F.lit(1)), "g", "left")
    agg = j.groupBy("doc_id").agg(
        F.first("t").alias("t"),
        F.array_sort(
            F.collect_list(F.when(F.col("_dup").isNotNull(), F.col("p").cast("long")))
        ).alias("dps"),
    )
    empty = F.array().cast("array<struct<s:bigint,e:bigint>>")

    def step(acc, p):
        last = F.element_at(acc, -1)
        fresh = F.array(F.struct(p.alias("s"), p.alias("e")))
        extend = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(F.struct(last["s"].alias("s"), p.alias("e"))),
        )
        return (
            F.when(F.size(acc) == 0, fresh)
            .when(p > last["e"] + _SUB_K, F.concat(acc, fresh))
            .otherwise(extend)
        )

    islands = F.aggregate(F.col("dps"), empty, step)
    spans = F.transform(
        islands,
        lambda s: F.struct(
            s["s"].alias("start_b"),
            (s["e"] + _SUB_K - s["s"]).cast("bigint").alias("run_tokens"),
        ),
    )
    return agg.select("doc_id", *span_mask_cols(F.col("t"), spans))


def stream_duplicated_scrub_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convenience wiring: fit the duplicated-gram state offline on
    sf_dir's corpus, stream the same corpus's documents through the
    crawl-time scrubber."""
    return stream_duplicated_scrub(
        stream_documents(spark, sf_dir), fitted_duplicated_grams(spark, sf_dir)
    )
