"""q121/q122 unigram-LM tokenizer: independent single-process Python
ground truth (the test_tokenizer.py convention for the BPE half) —
candidate selection, hard-EM rounds, Viterbi with the (score, longer
piece) tie-break, the add-one re-estimate, and the _UNI_LMAX
single-char fallback — all re-derived outside both engines with exact
Decimal path scores."""

from __future__ import annotations

import math
from collections import Counter
from decimal import Decimal

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cometbft_log_etl_spark.queries.unigram import (
    _UNI_EM_ROUNDS,
    _UNI_LMAX,
    _UNI_MAX_PIECE,
    _UNI_VOCAB_MULTI,
)


def _round9(x: float) -> Decimal:
    return Decimal(f"{round(x, 9):.9f}")


def _py_fit(texts: list[str], rounds: int = _UNI_EM_ROUNDS):
    """Pure-Python unigram fit; returns (model {piece: (usage, logp)},
    encode {word: (n_pieces, fallback)})."""
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[w] += 1
    cand = Counter()
    for w, f in words.items():
        for s in range(len(w)):
            for l in range(1, min(_UNI_MAX_PIECE, len(w) - s) + 1):
                cand[w[s : s + l]] += f
    singles = {p: c for p, c in cand.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cand.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:_UNI_VOCAB_MULTI]
    vocab = dict(singles)
    vocab.update(dict(multi))
    if not vocab:
        return {}, {}
    total = float(sum(vocab.values()))
    model = {p: _round9(math.log(c / total)) for p, c in vocab.items()}
    usage: Counter = Counter()

    def viterbi(w: str):
        best = [(Decimal(0), 0, [])]  # (score, j, path)
        for i in range(1, len(w) + 1):
            cands = []
            for j in range(1, min(_UNI_MAX_PIECE, i) + 1):
                piece = w[i - j : i]
                if piece in model:
                    s, _, path = best[i - j]
                    cands.append((s + model[piece], j, path + [piece]))
            best.append(max(cands, key=lambda c: (c[0], c[1])))
        return best[len(w)][2]

    for _ in range(rounds):
        usage = Counter()
        for w, f in words.items():
            pieces = list(w) if len(w) > _UNI_LMAX else viterbi(w)
            for p in pieces:
                usage[p] += f
        tot = float(sum(usage[p] for p in vocab))
        denom = tot + len(vocab)
        model = {p: _round9(math.log((usage[p] + 1.0) / denom)) for p in vocab}
    enc = {
        w: (len(w), True) if len(w) > _UNI_LMAX else (len(viterbi(w)), False)
        for w in words
    }
    return {p: (usage[p], model[p]) for p in vocab}, enc


def test_q121_fit_matches_python_reference(spark, sf_dir):
    from cometbft_log_etl_spark.queries import catalog

    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"]).column(
        "text"
    ).to_pylist()
    model, _ = _py_fit(texts)
    rows = catalog()["q121_unigram_fit"].fn(spark, sf_dir).collect()
    assert len(rows) == len(model)
    for r in rows:
        usage, logp = model[r.piece]
        assert r.usage == usage, (r.piece, r.usage, usage)
        assert _round9(r.logp) == logp, (r.piece, r.logp, logp)
        assert r.piece_len == len(r.piece)
    assert any(len(p) >= 2 for p in model), "no multi-char piece fitted — fixture too weak"
    assert any(u > 0 for u, _ in model.values())


def test_q122_encode_matches_python_reference(spark, sf_dir):
    from cometbft_log_etl_spark.queries import catalog

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = tbl.column("text").to_pylist()
    _, enc = _py_fit(texts)
    want = {}
    for d, t in zip(tbl.column("doc_id").to_pylist(), texts):
        ws = [w for w in t.split(" ") if w]
        if ws:
            want[d] = (
                len(ws),
                sum(enc[w][0] for w in ws),
                sum(1 for w in ws if enc[w][1]),
            )
    rows = catalog()["q122_unigram_encode"].fn(spark, sf_dir).collect()
    got = {r.doc_id: (r.n_words, r.n_tokens, r.n_fallback_words) for r in rows}
    assert got == want
    # structural invariants: at least one piece per word, and the
    # fitted multi-char pieces actually compress at least one doc
    assert all(v[1] >= v[0] for v in want.values())
    chars = {
        d: sum(len(w) for w in t.split(" ") if w)
        for d, t in zip(tbl.column("doc_id").to_pylist(), texts)
    }
    assert any(want[d][1] < chars[d] for d in want), "model never compresses"


def _write_docs(tmp_path_factory, sf_dir, texts: list[str]) -> str:
    import os

    out = tmp_path_factory.mktemp("unigram-sf")
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "embeddings",
    ):
        head = pq.read_table(os.path.join(sf_dir, f"{t}.parquet")).slice(0, 8)
        pq.write_table(head, str(out / f"{t}.parquet"))
    schema = pq.read_table(os.path.join(sf_dir, "documents.parquet")).schema
    docs = pa.Table.from_pydict(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["test"] * len(texts),
            "n_chars": [len(t) for t in texts],
        },
        schema=schema,
    )
    pq.write_table(docs, str(out / "documents.parquet"))
    return str(out)


def test_fallback_rule_fires_on_giant_words(spark, sf_dir, tmp_path_factory):
    """A word beyond _UNI_LMAX must bypass the DP (single-char
    segmentation, flagged), while its characters still feed usage —
    both engines implement the same rule; here the Python reference
    adjudicates the Spark side, and the saw-the-case assertions keep
    the fixture honest."""
    from cometbft_log_etl_spark.queries import catalog

    giant = "ab" * (_UNI_LMAX)  # 32 chars > LMAX
    texts = ["abab abab ba ba ba", f"{giant} abab", "ab ba abab"]
    vdir = _write_docs(tmp_path_factory, sf_dir, texts)
    model, enc = _py_fit(texts)
    assert enc[giant] == (len(giant), True)
    rows = catalog()["q122_unigram_encode"].fn(spark, vdir).collect()
    got = {r.doc_id: r for r in rows}
    assert got[1].n_fallback_words == 1
    assert got[0].n_fallback_words == 0
    want = {}
    for d, t in enumerate(texts):
        ws = [w for w in t.split(" ") if w]
        want[d] = (len(ws), sum(enc[w][0] for w in ws), sum(1 for w in ws if enc[w][1]))
    assert {d: (r.n_words, r.n_tokens, r.n_fallback_words) for d, r in got.items()} == want
    # fit parity on the same corpus, with the giant word feeding usage
    frows = catalog()["q121_unigram_fit"].fn(spark, vdir).collect()
    assert {r.piece: (r.usage, _round9(r.logp)) for r in frows} == model
    # the DP actually uses multi-char pieces here (compression), so the
    # corpus exercises both the DP and the fallback in one fixture
    assert got[0].n_tokens < sum(len(w) for w in texts[0].split(" "))


def test_vocab_cap_binds_deterministically(spark, sf_dir, tmp_path_factory):
    """More multi-char candidates than _UNI_VOCAB_MULTI: the cap keeps
    the (count DESC, piece ASC) prefix exactly — the Python reference
    implements the same rule, so equality here pins the tie-break."""
    from cometbft_log_etl_spark.queries import catalog

    # 26*3 distinct trigram-ish words -> way more than 48 multi candidates
    import itertools

    letters = "abcdefghijklmnopqrstuvwxyz"
    ws = ["".join(p) for p in itertools.islice(itertools.product(letters, repeat=3), 120)]
    texts = [" ".join(ws[i::4]) for i in range(4)]
    vdir = _write_docs(tmp_path_factory, sf_dir, texts)
    model, _ = _py_fit(texts)
    n_multi = sum(1 for p in model if len(p) >= 2)
    assert n_multi == _UNI_VOCAB_MULTI  # the cap binds
    rows = catalog()["q121_unigram_fit"].fn(spark, vdir).collect()
    assert {r.piece: (r.usage, _round9(r.logp)) for r in rows} == model
