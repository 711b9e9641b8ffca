"""Property tests (pure Python, no Spark) for the decomposition
theorems the round-11 tiers rely on. The oracle checker proves
Spark == DuckDB on fixed corpora; these prove the ALGORITHMS agree
with their naive definitions over thousands of randomized inputs:

- q107's two-phase budget selection (length-group distribution +
  boundary-group-only per-doc pass) == the naive one-window greedy
  prefix, for any corpus including zero-token docs, ties, and
  boundaries landing exactly between groups;
- q106's cumulative-count discrete tertile == the k-th element of the
  sorted score list, for any multiset;
- q108's screen never produces a false negative, for any history/batch
  split and any hash collisions the salted positions produce.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------- q107


def _naive_budget(docs):
    """docs: [(doc_id, n_chars, tc)] one source. Greedy prefix in
    (n_chars DESC, doc_id ASC) order while cum <= tot//3."""
    order = sorted(docs, key=lambda d: (-d[1], d[0]))
    tot = sum(d[2] for d in docs)
    b = tot // 3
    cum, kept, toks = 0, 0, 0
    for _, _, tc in order:
        cum += tc
        if cum <= b:
            kept += 1
            toks += tc
    return kept, toks, b


def _two_phase_budget(docs):
    """The q107 Spark-side decomposition, mirrored exactly: group by
    n_chars, cumulative group sums in DESC order, wholesale-keep full
    groups, per-doc pass ONLY inside the boundary group
    (cum > B and cum - gtok <= B)."""
    groups: dict = defaultdict(list)
    for doc_id, n_chars, tc in docs:
        groups[n_chars].append((doc_id, tc))
    tot = sum(tc for _, _, tc in docs)
    b = tot // 3
    cum, kept, toks = 0, 0, 0
    for n_chars in sorted(groups, reverse=True):
        gdocs = sorted(groups[n_chars])
        gtok = sum(tc for _, tc in gdocs)
        start = cum
        cum += gtok
        if cum <= b:
            kept += len(gdocs)
            toks += gtok
        elif start <= b:  # the boundary group (<=: entered exactly at B)
            remaining = b - start
            dcum = 0
            for _, tc in gdocs:
                dcum += tc
                if dcum <= remaining:
                    kept += 1
                    toks += tc
    return kept, toks, b


@settings(max_examples=500, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 6),  # n_chars (small domain -> many group ties)
            st.integers(0, 9),  # tc incl. zero-token docs
        ),
        max_size=40,
    )
)
def test_two_phase_budget_equals_naive_prefix(rows):
    # unique doc_ids: the id-uniqueness contract (q12-audited) is the
    # theorem's domain — duplicate ids with DIFFERING payloads make
    # the (n_chars, doc_id) order non-total, and hypothesis correctly
    # found that the tie order then changes the kept count (the same
    # pathological input would also diverge Spark-vs-oracle; identical
    # duplicate copies, the in-contract case, are order-invariant and
    # covered by the CI duplicate-id probe)
    docs = [(i, n_chars, tc) for i, (n_chars, tc) in enumerate(rows)]
    assert _two_phase_budget(docs) == _naive_budget(docs)


# ---------------------------------------------------------------- q106


def _naive_tertiles(scores):
    """(t1, t2) = the k1-th and k2-th HIGHEST scores, k = ceil(p*n)."""
    s = sorted(scores, reverse=True)
    n = len(s)
    k1, k2 = (n + 2) // 3, (2 * n + 2) // 3
    return s[k1 - 1], s[k2 - 1]


def _distribution_tertiles(scores):
    """The q26/q106 restatement: cumulative counts over the value
    distribution, threshold = min value whose rank interval starts at
    or before k."""
    dist: dict = defaultdict(int)
    for v in scores:
        dist[v] += 1
    n = len(scores)
    k1, k2 = (n + 2) // 3, (2 * n + 2) // 3
    cum, t1, t2 = 0, None, None
    for v in sorted(dist, reverse=True):
        start = cum + 1
        cum += dist[v]
        if start <= k1:
            t1 = v
        if start <= k2:
            t2 = v
    return t1, t2


@settings(max_examples=500, deadline=None)
@given(st.lists(st.integers(-50, 50), min_size=1, max_size=60))
def test_distribution_tertiles_equal_kth_element(scores):
    assert _distribution_tertiles(scores) == _naive_tertiles(scores)


# ---------------------------------------------------------------- q108


def _bloom_positions(fp: str, m: int, k: int = 3):
    return [
        int(hashlib.md5((fp + str(i)).encode()).hexdigest()[:8], 16) % m
        for i in range(k)
    ]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.text(min_size=1, max_size=6), min_size=1, max_size=30),
    st.lists(st.text(min_size=1, max_size=6), min_size=1, max_size=30),
    st.sampled_from([8, 64, 2048]),  # deliberately tiny m -> collisions
)
def test_bloom_screen_never_false_negative(hist_texts, batch_texts, m):
    hist = {hashlib.md5(t.encode()).hexdigest() for t in hist_texts}
    bits = {p for fp in hist for p in _bloom_positions(fp, m)}
    for t in batch_texts + hist_texts:
        fp = hashlib.md5(t.encode()).hexdigest()
        if fp in hist:  # a true duplicate MUST screen as maybe
            assert all(p in bits for p in _bloom_positions(fp, m))
