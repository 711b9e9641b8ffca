"""Streaming BPE encode twin: the offline-fitted tokenizer applied on a
stream must reproduce batch q18 exactly, and OOV words (impossible in
the self-fitted case, routine on a live stream) encode by applying the
fitted merge chain to the word itself — the exact tokenizer function,
not a char-count approximation."""

from __future__ import annotations

from pyspark.sql import functions as F

from cometbft_log_etl_spark.queries import catalog


def test_stream_encode_matches_batch_q18(spark, sf_dir):
    from cometbft_log_etl_spark.streaming.tokenize import (
        stream_bpe_token_counts_for,
    )

    q = (
        stream_bpe_token_counts_for(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("t_stream_bpe")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in spark.table("t_stream_bpe").collect()
    }
    want = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in catalog()["q18_bpe_token_counts"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_oov_words_encode_via_fitted_merge_chain(spark, sf_dir):
    """Words the model never saw must encode by applying the fitted
    merge chain to the word itself — the exact tokenizer function, not
    a char-count approximation — and must not drop rows or null the
    sum."""
    from cometbft_log_etl_spark.streaming.tokenize import (
        fitted_model,
        stream_bpe_token_counts,
    )

    merges, lengths = fitted_model(spark, sf_dir)

    def ref_encode(word):
        s = [c for c in word]
        for m in merges:
            out = []
            for tok in s:
                if out and out[-1] == m["left"] and tok == m["right"]:
                    out[-1] = m["merged"]
                else:
                    out.append(tok)
            s = out
        return len(s)

    oov = ["zzzzqqqq", "xyzzy", "thethethe"]
    in_vocab = {r.w for r in lengths.collect()}
    assert not any(w in in_vocab for w in oov)
    # batch frame through the SAME code path (the plan is identical;
    # stream-vs-batch execution is covered by the parity test above)
    novel = spark.createDataFrame(
        [(10**9, " ".join(oov))], "doc_id bigint, text string"
    )
    rows = stream_bpe_token_counts(novel, merges, lengths).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_words, r.n_bpe_tokens) == (3, sum(ref_encode(w) for w in oov))
