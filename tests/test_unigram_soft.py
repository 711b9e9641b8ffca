"""q135 soft-EM unigram fit vs an independent pure-Python ground truth
(the test_unigram.py convention): forward/backward log-sum-exp lattice
marginals, posterior expected counts, the add-one refit, and the
vocab-pruning round — every rounding step mirrored exactly.

The DuckDB oracle cross-check (both DPs unrolled as list-CTEs) runs in
the driver window / check_correctness; this file is the third engine.
"""

from __future__ import annotations

import math
from decimal import Decimal

import pyarrow as pa
import pyarrow.parquet as pq

from cometbft_log_etl_spark.queries.unigram import (
    _UNI_LMAX,
    _UNI_MAX_PIECE,
    _UNI_SOFT_KEEP,
    _UNI_VOCAB_MULTI,
)


def _round9(x: float) -> Decimal:
    return Decimal(f"{round(x, 9):.9f}")


def _front(texts: list[str]):
    """Shared fit front: word freqs, vocab [(piece, cnt)], seed model."""
    freqs: dict = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    cand: dict = {}
    for w, f in freqs.items():
        for s in range(len(w)):
            for l in range(1, min(_UNI_MAX_PIECE, len(w) - s) + 1):
                cand[w[s : s + l]] = cand.get(w[s : s + l], 0) + f
    singles = {p: c for p, c in cand.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cand.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:_UNI_VOCAB_MULTI]
    vocab = dict(singles)
    vocab.update(dict(multi))
    total = float(sum(vocab.values()))
    model0 = {p: _round9(math.log(c / total)) for p, c in vocab.items()}
    return freqs, vocab, model0


def _lse(cands: list[Decimal]) -> Decimal:
    m = max(cands)
    s = Decimal(0)
    for c in cands:
        s += _round9(math.exp(float(c - m)))
    return m + _round9(math.log(float(s)))


def _py_gammas(w: str, model: dict) -> list:
    """[(piece, gamma)] posterior occupation per in-vocab occurrence of
    a DP-eligible word — the one gamma definition the usage E-step and
    the q137 encode reference both consume."""
    n = len(w)
    fwd = [Decimal(0)]
    for i in range(1, n + 1):
        fwd.append(
            _lse(
                [
                    fwd[i - j] + model[w[i - j : i]]
                    for j in range(1, min(_UNI_MAX_PIECE, i) + 1)
                    if w[i - j : i] in model
                ]
            )
        )
    bwd = [None] * (n + 1)
    bwd[n] = Decimal(0)
    for i in range(n - 1, -1, -1):
        bwd[i] = _lse(
            [
                model[w[i : i + j]] + bwd[i + j]
                for j in range(1, min(_UNI_MAX_PIECE, n - i) + 1)
                if w[i : i + j] in model
            ]
        )
    out = []
    for s in range(n):
        for j in range(1, min(_UNI_MAX_PIECE, n - s) + 1):
            p = w[s : s + j]
            if p in model:
                out.append(
                    (p, _round9(math.exp(float(fwd[s] + model[p] + bwd[s + j] - fwd[n]))))
                )
    return out


def _soft_eu(freqs: dict, model: dict, vocab_pieces) -> dict:
    """Expected freq-weighted usage per vocab piece (the E-step)."""
    eu = {p: Decimal(0) for p in vocab_pieces}
    for w, f in freqs.items():
        if len(w) > _UNI_LMAX:
            for ch in w:
                eu[ch] += f
            continue
        for p, g in _py_gammas(w, model):
            eu[p] += f * g
    return eu


def _mstep(eu: dict) -> dict:
    tot = float(sum(eu.values()))
    denom = tot + len(eu)
    return {p: _round9(math.log((float(e) + 1.0) / denom)) for p, e in eu.items()}


def _py_soft_state(texts: list[str]):
    """(freqs, final E-step model, {piece: (eu, logp)}) — the q135
    spec with the state q137's encode reference needs."""
    freqs, vocab, model0 = _front(texts)
    if not vocab:
        return {}, {}, {}
    eu1 = _soft_eu(freqs, model0, vocab)
    m1 = _mstep(eu1)
    multi2 = sorted(
        (p for p in vocab if len(p) >= 2), key=lambda p: (-eu1[p], p)
    )[:_UNI_SOFT_KEEP]
    pieces2 = sorted([p for p in vocab if len(p) == 1] + multi2)
    model1 = {p: m1[p] for p in pieces2}
    eu2 = _soft_eu(freqs, model1, pieces2)
    m2 = _mstep(eu2)
    return freqs, model1, {p: (eu2[p], m2[p]) for p in pieces2}


def _py_soft_fit(texts: list[str]):
    """{piece: (expected_usage Decimal, logp Decimal)} after E/M,
    prune, E/M — the q135 spec."""
    return _py_soft_state(texts)[2]


def _py_soft_encode(texts_with_ids, freqs: dict, model: dict) -> dict:
    """{doc_id: (n_words, exp_tokens Decimal, n_fallback)} — the q137
    reference: per-word E[#pieces] = sum of posterior gammas under the
    final E-step's model; beyond-_UNI_LMAX words take exact length."""
    enc = {}
    for w in freqs:
        if len(w) > _UNI_LMAX:
            enc[w] = (Decimal(len(w)), True)
        else:
            enc[w] = (sum((g for _, g in _py_gammas(w, model)), Decimal(0)), False)
    out = {}
    for d, t in texts_with_ids:
        ws = [w for w in t.split(" ") if w]
        if ws:
            out[d] = (
                len(ws),
                sum((enc[w][0] for w in ws), Decimal(0)),
                sum(1 for w in ws if enc[w][1]),
            )
    return out


def _assert_matches(rows, want):
    got = {r.piece: r for r in rows}
    assert set(got) == set(want)
    for p, (eu, logp) in want.items():
        assert float(eu) == got[p].expected_usage, (p, eu, got[p].expected_usage)
        assert _round9(got[p].logp) == logp, (p, got[p].logp, logp)
        assert got[p].piece_len == len(p)


def test_q135_matches_python_reference(spark, sf_dir):
    from cometbft_log_etl_spark.queries import catalog

    texts = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).column("text").to_pylist()
    want = _py_soft_fit(texts)
    rows = catalog()["q135_unigram_soft_fit"].fn(spark, sf_dir).collect()
    _assert_matches(rows, want)
    # the pruning round binds on the driver corpus
    assert sum(1 for p in want if len(p) >= 2) == _UNI_SOFT_KEEP
    # expected LENGTH-WEIGHTED usage of the DP-eligible mass covers each
    # position exactly once per word (posterior marginals sum to 1 per
    # position), so total expected chars ~= corpus chars
    freqs, _, _ = _front(texts)
    total_chars = sum(len(w) * f for w, f in freqs.items())
    exp_chars = float(sum(len(p) * eu for p, (eu, _) in want.items()))
    assert math.isclose(exp_chars, total_chars, rel_tol=1e-6)


def _write_docs(tmp_path_factory, sf_dir, texts: list[str]) -> str:
    import os

    out = tmp_path_factory.mktemp("unigram-soft-sf")
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


def test_soft_fallback_and_unicode(spark, sf_dir, tmp_path_factory):
    """A beyond-_UNI_LMAX word contributes integer single-char counts
    (never lattice mass) and multibyte characters ride the same
    char-indexed DP — the Python reference adjudicates both."""
    from cometbft_log_etl_spark.queries import catalog

    giant = "ab" * _UNI_LMAX  # 32 chars > LMAX
    texts = ["abab abab ba ba", f"{giant} abab", "héllo héllo œuf œuf", "ab œuf"]
    vdir = _write_docs(tmp_path_factory, sf_dir, texts)
    want = _py_soft_fit(texts)
    rows = catalog()["q135_unigram_soft_fit"].fn(spark, vdir).collect()
    _assert_matches(rows, want)
    # fixture honesty: the giant word fed 'a'/'b' integer usage, and the
    # lattice genuinely split mass across overlapping pieces (a strictly
    # fractional expected count exists)
    assert any(
        eu != eu.to_integral_value() for eu, _ in want.values()
    ), "no fractional expected count — lattice never split mass"


def test_soft_prune_keeps_singles_and_topk(spark, sf_dir, tmp_path_factory):
    """More multi-char candidates than _UNI_SOFT_KEEP: the pruned vocab
    is exactly all singles + the (expected-usage DESC, piece ASC)
    prefix — equality with the reference pins the ranking tie-break."""
    import itertools

    from cometbft_log_etl_spark.queries import catalog

    letters = "abcdefghij"
    ws = ["".join(p) for p in itertools.islice(itertools.product(letters, repeat=3), 60)]
    texts = [" ".join(ws[i::3]) for i in range(3)]
    vdir = _write_docs(tmp_path_factory, sf_dir, texts)
    want = _py_soft_fit(texts)
    assert sum(1 for p in want if len(p) >= 2) == _UNI_SOFT_KEEP
    rows = catalog()["q135_unigram_soft_fit"].fn(spark, vdir).collect()
    _assert_matches(rows, want)


def test_q137_encode_matches_python_reference(spark, sf_dir):
    from cometbft_log_etl_spark.queries import catalog

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = list(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    freqs, model1, _ = _py_soft_state([t for _, t in pairs])
    want = _py_soft_encode(pairs, freqs, model1)
    rows = catalog()["q137_unigram_soft_encode"].fn(spark, sf_dir).collect()
    got = {r.doc_id: (r.n_words, r.exp_tokens, r.n_fallback_words) for r in rows}
    assert set(got) == set(want)
    for d, (nw, et, nf) in want.items():
        assert got[d][0] == nw and got[d][2] == nf
        assert got[d][1] == float(et), (d, got[d][1], et)
    # the mean never beats the mode: expected tokens >= the Viterbi
    # count is NOT guaranteed piecewise (different models), but the
    # lattice marginal is at least one piece per word and at most the
    # char count
    chars = {d: sum(len(w) for w in t.split(" ") if w) for d, t in pairs}
    for d, (nw, et, nf) in want.items():
        assert nw <= float(et) <= chars[d] + 1e-6


def test_q137_giant_word_and_wordless(spark, sf_dir, tmp_path_factory):
    from cometbft_log_etl_spark.queries import catalog

    giant = "ab" * _UNI_LMAX
    texts = ["abab abab ba ba", f"{giant} abab"]
    vdir = _write_docs(tmp_path_factory, sf_dir, texts)
    freqs, model1, _ = _py_soft_state(texts)
    want = _py_soft_encode(list(enumerate(texts)), freqs, model1)
    rows = catalog()["q137_unigram_soft_encode"].fn(spark, vdir).collect()
    got = {r.doc_id: (r.n_words, r.exp_tokens, r.n_fallback_words) for r in rows}
    assert {d: (v[0], float(v[1]), v[2]) for d, v in want.items()} == got
    assert got[1][2] == 1  # the giant word flagged
    # wordless corpus: empty result with the right schema
    wdir = _write_docs(tmp_path_factory, sf_dir, ["   ", ""])
    out = catalog()["q137_unigram_soft_encode"].fn(spark, wdir)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_words", "exp_tokens", "n_fallback_words",
    ]


def test_encode_dp_reuse_matches_fresh_fold(spark, sf_dir):
    """Round-14 internals pin: q137 aggregates its per-word expected
    piece counts off the DP frame the fit's FINAL E-step folded
    (unigram_soft_fit_with_state's 4th return) instead of re-folding.
    The reused-frame encode table must be row-identical to one built
    from a fresh fold under the same model — if the fit ever returns a
    stale frame (wrong model, wrong round), this catches it."""
    from cometbft_log_etl_spark.queries.unigram import (
        _soft_word_npieces,
        unigram_soft_fit_with_state,
    )
    from cometbft_log_etl_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    _, words, model, dp2 = unigram_soft_fit_with_state(spark, docs)
    assert dp2 is not None
    reused = {
        r.w: (str(r.e_pieces), r.fallback)
        for r in _soft_word_npieces(words, model, dp=dp2).collect()
    }
    fresh = {
        r.w: (str(r.e_pieces), r.fallback)
        for r in _soft_word_npieces(words, model).collect()
    }
    assert reused == fresh and reused
