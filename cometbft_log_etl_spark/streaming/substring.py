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
