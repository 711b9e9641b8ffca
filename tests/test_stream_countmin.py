"""Streaming count-min twin: the accumulated streaming sketch must be
bit-identical to the batch q33 sketch over the same corpus — including
when the corpus arrives across multiple micro-batches (cell-wise
addition is the merge), and the state/output must stay at most d × w
rows throughout."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cometbft_log_etl_spark.queries.datapipe import (
    _CM_D,
    _CM_W,
    cm_cells_from_tokens,
    cm_cells_from_vocab,
)
from cometbft_log_etl_spark.tables import load


def _batch_cells(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_exact"))
    return {(r.j, r.bucket): r.cnt for r in cm_cells_from_vocab(exact).collect()}


def test_vocab_and_stream_builders_agree_on_batch(spark, sf_dir):
    """The additivity equivalence itself: vocab-derived cells (what q33
    broadcasts) == raw-token-stream cells (what a stream counts)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    got = {(r.j, r.bucket): r.cnt for r in cm_cells_from_tokens(toks).collect()}
    assert got == _batch_cells(spark, sf_dir)
    assert 0 < len(got) <= _CM_D * _CM_W


def test_stream_sketch_matches_batch_single_trigger(spark, sf_dir):
    from cometbft_log_etl_spark.streaming.countmin import stream_countmin_cells

    q = (
        stream_countmin_cells(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("t_stream_cm_one")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    got = {
        (r.j, r.bucket): r.cnt for r in spark.table("t_stream_cm_one").collect()
    }
    assert got == _batch_cells(spark, sf_dir)


def test_stream_sketch_accumulates_across_micro_batches(
    spark, sf_dir, tmp_path_factory
):
    """Three files, one per trigger: after the final trigger the
    complete-mode table is the batch sketch of the WHOLE corpus —
    cells merged across micro-batches by addition."""
    from cometbft_log_etl_spark.streaming.countmin import stream_countmin_cells_from

    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    ids = [r.doc_id for r in docs.select("doc_id").orderBy("doc_id").collect()]
    cut1, cut2 = ids[n // 3], ids[2 * n // 3]
    arrival = tmp_path_factory.mktemp("cm-arrivals")
    flat = tmp_path_factory.mktemp("cm-arrivals-flat")
    for i, cond in enumerate(
        [
            F.col("doc_id") < cut1,
            (F.col("doc_id") >= cut1) & (F.col("doc_id") < cut2),
            F.col("doc_id") >= cut2,
        ]
    ):
        docs.filter(cond).coalesce(1).write.parquet(str(arrival / f"batch{i}"))
        src = [
            f for f in os.listdir(arrival / f"batch{i}") if f.endswith(".parquet")
        ][0]
        os.link(arrival / f"batch{i}" / src, flat / f"{i:03d}.parquet")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    q = (
        stream_countmin_cells_from(stream)
        .writeStream.format("memory")
        .queryName("t_stream_cm_multi")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    got = {
        (r.j, r.bucket): r.cnt for r in spark.table("t_stream_cm_multi").collect()
    }
    assert got == _batch_cells(spark, sf_dir)
    assert len(got) <= _CM_D * _CM_W


def test_stream_substring_containment_matches_batch_q47(spark, sf_dir):
    """The streaming containment screen (stream-static join against the
    static history gram set) must reproduce batch q47 exactly."""
    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.streaming.substring import (
        stream_substring_containment,
    )

    q = (
        stream_substring_containment(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("t_stream_contain")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    got = {
        r.doc_id: (r.n_grams, r.n_history_grams, r.containment, r.flagged)
        for r in spark.table("t_stream_contain").collect()
    }
    want = {
        r.doc_id: (r.n_grams, r.n_history_grams, r.containment, r.flagged)
        for r in catalog()["q47_substring_containment"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_stream_substring_scrub_matches_batch_q46(spark, sf_dir):
    """The streaming scrub (q45-derived span lists as the static side of
    a stream-static left join, in-array masking map-side) must
    reproduce batch q46 exactly — including n_removed == 0 rows for
    documents no span touches, and a scrubbed-to-'' row for a fully
    duplicated doc_b. Stateless, so append mode."""
    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.streaming.substring import stream_substring_scrub

    q = (
        stream_substring_scrub(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("t_stream_scrub")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
        for r in spark.table("t_stream_scrub").collect()
    }
    want = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
        for r in catalog()["q46_substring_scrub"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0
    assert any(v[1] > 0 for v in got.values())  # the scrub actually removed spans


def test_stream_selfrep_scrub_matches_batch_q103(spark, sf_dir):
    """The streaming intra-doc scrub (q102-derived span lists static,
    shared apply_span_scrub masking) must reproduce batch q103 exactly,
    including n_removed == 0 rows for non-repetitive documents."""
    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.streaming.substring import stream_selfrep_scrub

    q = (
        stream_selfrep_scrub(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("t_stream_selfrep")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
        for r in spark.table("t_stream_selfrep").collect()
    }
    want = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
        for r in catalog()["q66_selfrep_scrub"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0
    assert any(v[1] > 0 for v in got.values())  # real self-repeats scrubbed
