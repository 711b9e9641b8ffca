"""Streaming unigram-LM encode twin: the offline-fitted model applied
on a stream must reproduce batch q122 exactly; OOV words segment by the
same Viterbi fold map-side, with unknown CHARACTERS as single <unk>
pieces (the SentencePiece convention) — pinned against a pure-Python
Viterbi over the collected model."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from cometbft_log_etl_spark.queries import catalog


def test_stream_encode_matches_batch_q122(spark, sf_dir):
    from cometbft_log_etl_spark.streaming.unigram import (
        stream_unigram_token_counts_for,
    )

    q = (
        stream_unigram_token_counts_for(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("t_stream_unigram")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    got = {
        r.doc_id: (r.n_words, r.n_tokens, r.n_fallback_words)
        for r in spark.table("t_stream_unigram").collect()
    }
    want = {
        r.doc_id: (r.n_words, r.n_tokens, r.n_fallback_words)
        for r in catalog()["q122_unigram_encode"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_oov_words_segment_via_fitted_viterbi(spark, sf_dir):
    """Unseen words must segment under the fitted model exactly as a
    pure-Python Viterbi does (same (score, longer-piece) tie-break),
    with unknown chars as single pieces and the _UNI_LMAX fallback."""
    from cometbft_log_etl_spark.queries.unigram import _UNI_LMAX, _UNI_MAX_PIECE
    from cometbft_log_etl_spark.streaming.unigram import (
        _UNK_LOGP,
        fitted_model,
        stream_unigram_token_counts,
    )

    model, enc = fitted_model(spark, sf_dir)
    pieces = sorted(model)
    # build OOV words from fitted material + an alien char; keep them
    # genuinely unseen (they are concatenations, not corpus words)
    multi = [p for p in pieces if len(p) >= 2][:3]
    assert multi, "fit produced no multi-char piece — fixture too weak"
    oov1 = "".join(multi)[: _UNI_LMAX - 1]
    oov2 = (multi[0] + "ß" + multi[0])[: _UNI_LMAX - 1]  # alien char ß
    oov3 = "x" * (_UNI_LMAX + 5) if "x" in model else multi[0] * _UNI_LMAX
    texts = [(900001, f"{oov1} {oov2}"), (900002, oov3)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")

    def py_viterbi(w: str) -> int:
        if len(w) > _UNI_LMAX:
            return len(w)
        best = [(Decimal(0), 0, 0)]  # score, j, n_pieces
        for i in range(1, len(w) + 1):
            cands = []
            for j in range(1, min(_UNI_MAX_PIECE, i) + 1):
                piece = w[i - j : i]
                lp = model.get(piece)
                if lp is None and j == 1:
                    lp = _UNK_LOGP
                if lp is not None:
                    s, _, n = best[i - j]
                    cands.append((s + lp, j, n + 1))
            best.append(max(cands, key=lambda c: (c[0], c[1])))
        return best[len(w)][2]

    out = {
        r.doc_id: r
        for r in stream_unigram_token_counts(docs, model, enc).collect()
    }
    assert out[900001].n_tokens == py_viterbi(oov1) + py_viterbi(oov2)
    assert out[900001].n_fallback_words == 0
    assert out[900002].n_tokens == py_viterbi(oov3)
    assert out[900002].n_fallback_words == (1 if len(oov3) > _UNI_LMAX else 0)
    # the alien char really went through the <unk> floor: it cannot be
    # a fitted piece
    assert "ß" not in model
