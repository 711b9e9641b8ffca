"""q117 LSH estimator audit: pure-Python recompute of the whole
verify pass (candidate pairs' exact distinct-3-gram jaccard, grouped
by signature agreement) from collected inputs, plus the audit's
structural guarantees."""

from __future__ import annotations

from collections import defaultdict

import pytest

from cometbft_log_etl_spark.queries import catalog
from cometbft_log_etl_spark.queries.neardup import (
    _CLUSTER_JACCARD,
    _MINHASH_K,
    _minhash_sigs,
    lsh_band_pairs,
)
from cometbft_log_etl_spark.tables import load


@pytest.fixture(scope="module")
def audit(spark, sf_dir):
    rows = catalog()["q117_lsh_estimator_audit"].fn(spark, sf_dir).collect()
    return {r.n_agree: r for r in rows}


def test_audit_matches_pure_python(spark, sf_dir, audit):
    docs = load(spark, sf_dir, "documents")
    # independent recount: signatures collected from the sig builder
    # directly (lsh_band_pairs now ships only the agreement count —
    # the round-15 payload slimming), so the pair frame's `agree`
    # column is itself cross-checked against a pure-Python zip count
    sig_map = {r.doc_id: list(r.sig) for r in _minhash_sigs(docs).collect()}
    pairs = [
        (r.doc_a, r.doc_b, r.agree)
        for r in lsh_band_pairs(_minhash_sigs(docs)).collect()
    ]
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}

    def shingles(doc_id):
        t = texts[doc_id].split(" ")
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    groups: dict[int, list[float]] = defaultdict(list)
    for a, b, agree_col in pairs:
        agree = sum(1 for x, y in zip(sig_map[a], sig_map[b]) if x == y)
        assert agree == agree_col, f"precomputed agree drifted for ({a},{b})"
        sha, shb = shingles(a), shingles(b)
        groups[agree].append(len(sha & shb) / len(sha | shb))
    assert set(audit) == set(groups)
    for agree, ejs in groups.items():
        r = audit[agree]
        assert r.n_pairs == len(ejs)
        assert r.est_jaccard == agree / _MINHASH_K
        assert abs(r.mean_exact - sum(ejs) / len(ejs)) < 1e-9
        assert r.n_exact_dups == sum(1 for e in ejs if e >= _CLUSTER_JACCARD)
        want_ff = sum(
            1
            for e in ejs
            if agree / _MINHASH_K >= _CLUSTER_JACCARD and e < _CLUSTER_JACCARD
        )
        assert r.n_false_flags == want_ff


def test_audit_is_informative(audit):
    """The driver corpus must exercise both ends of the curve — a
    one-band audit would be vacuous — and the estimator must actually
    separate them (calibration, not noise)."""
    assert len(audit) >= 2
    lo = min(audit)
    hi = max(audit)
    assert audit[hi].mean_exact > audit[lo].mean_exact
    assert audit[hi].n_exact_dups > 0


def test_source_matrix_matches_pure_python(spark, sf_dir):
    """q118: pure-Python rollup of the verified dup pairs by
    normalized source pair."""
    from collections import defaultdict

    from cometbft_log_etl_spark.queries.neardup import lsh_verified_pairs

    docs = load(spark, sf_dir, "documents")
    srcs = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    dups = [
        (r.doc_a, r.doc_b, r.exact_j)
        for r in lsh_verified_pairs(docs).collect()
        if r.exact_j >= _CLUSTER_JACCARD
    ]
    want = defaultdict(list)
    for a, b, e in dups:
        key = tuple(sorted((srcs[a], srcs[b])))
        want[key].append((e, srcs[a] != srcs[b]))
    got = {
        (r.source_a, r.source_b): r
        for r in catalog()["q118_source_dup_matrix"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    assert want, "driver corpus has no verified dup pairs — vacuous"
    for key, items in want.items():
        r = got[key]
        assert r.n_dup_pairs == len(items)
        assert abs(r.mean_exact - sum(e for e, _ in items) / len(items)) < 1e-9
        assert r.cross_source == any(c for _, c in items)
