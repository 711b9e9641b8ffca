"""Ground truth for the per-source token-budget selection (q107): an
independent single-process greedy selection must reproduce the
engine's report exactly, the budget must never be exceeded, and the
two-phase (distribution + boundary-group) decomposition must match the
naive one-window semantics on an engineered corpus where the budget
boundary lands EXACTLY between groups with zero-token documents on
the edge — the tie the `<=` boundary filter exists for."""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _tc(text):
    return len(text.split(" ")) if text is not None else 0


def _reference_selection(rows):
    """rows: (doc_id, source, n_chars, text). Greedy prefix per source
    in (n_chars DESC NULLS LAST, doc_id ASC NULLS FIRST) order while
    the running token total stays within tok_total // 3."""
    by_src: dict = defaultdict(list)
    for doc_id, source, n_chars, text in rows:
        by_src[source].append((doc_id, n_chars, _tc(text)))
    out = {}
    for src, docs in by_src.items():
        docs.sort(
            key=lambda d: (
                d[1] is None,  # n_chars DESC, nulls last
                -(d[1] or 0),
                d[0] is not None,  # doc_id ASC, nulls first
                d[0] or 0,
            )
        )
        tot = sum(d[2] for d in docs)
        budget = tot // 3
        cum, n_kept, toks_kept = 0, 0, 0
        for _, _, tc in docs:
            cum += tc
            if cum <= budget:
                n_kept += 1
                toks_kept += tc
        out[src] = (len(docs), tot, budget, n_kept, toks_kept)
    return out


def _engine_selection(spark, sf_dir):
    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.session import (
        persistent_rdd_ids,
        release_new_persists,
    )

    before = persistent_rdd_ids(spark)
    try:
        rows = catalog()["q70_source_token_budget"].fn(spark, sf_dir).collect()
    finally:
        release_new_persists(spark, before)
    return {
        r.source: (r.n_total, r.tok_total, r.budget, r.n_kept, r.toks_kept)
        for r in rows
    }


def test_selection_matches_independent_reference(spark, sf_dir):
    tab = pq.read_table(f"{sf_dir}/documents.parquet")
    ref = _reference_selection(
        zip(
            tab.column("doc_id").to_pylist(),
            tab.column("source").to_pylist(),
            tab.column("n_chars").to_pylist(),
            tab.column("text").to_pylist(),
        )
    )
    assert _engine_selection(spark, sf_dir) == ref


def test_budget_is_binding_and_respected(spark, sf_dir):
    got = _engine_selection(spark, sf_dir)
    assert got
    bites = 0
    for src, (n_total, tok_total, budget, n_kept, toks_kept) in got.items():
        assert toks_kept <= budget, src
        assert n_kept <= n_total, src
        assert budget == tok_total // 3, src
        if 0 < n_kept < n_total:
            bites += 1
    # a third-of-mass budget must actually bite somewhere
    assert bites > 0


@pytest.fixture()
def boundary_tie_dir(tmp_path):
    """The engineered edge: in both sources a full group lands EXACTLY
    on the budget, so the boundary group opens at remaining == 0.
    Source 'a' pins that its 1-token boundary doc is dropped; source
    'b' pins that a NULL-text (0-token) boundary doc is still ADMITTED
    — the `<=` vs `<` tie on the boundary filter (an exclusive bound
    loses doc 11 on the engine side only)."""
    docs = {
        "doc_id": [1, 2, 3, 4, 10, 11, 12, 13],
        "source": ["a", "a", "a", "a", "b", "b", "b", "b"],
        "n_chars": [9, 9, 8, 7, 9, 8, 8, 7],
        # source a (tot 12, budget 4): the n_chars=9 group fills the
        # budget exactly (2+2), the n_chars=8 boundary group opens at
        # remaining == 0 and its 1-token doc must be DROPPED
        "text": [
            "t t",
            "u u",
            "v",
            "w w w w w w w",
            # source b (tot 9, budget 3): the n_chars=9 group fills the
            # budget exactly (3), the n_chars=8 boundary group opens at
            # remaining == 0 with a NULL-text (0-token) doc that must
            # be KEPT (dcum 0 <= 0) while its 5-token sibling drops
            "t t t",
            None,
            "y y y y y",
            "z",
        ],
    }
    out = tmp_path / "documents.parquet"
    pq.write_table(pa.table(docs), str(out))
    return str(tmp_path)


@pytest.fixture()
def null_source_boundary_dir(tmp_path):
    """A NULL-source group whose budget boundary BITES: the final
    roll-up join must be null-safe or the NULL group's boundary-kept
    counts silently drop (round-11 review finding — the null-cell
    battery missed it because its null-source group never had a
    boundary)."""
    docs = {
        "doc_id": [1, 2, 3, 4],
        "source": [None, None, None, None],
        "n_chars": [9, 8, 8, 7],
        # tot 9 -> budget 3: doc 1 (2 tok) kept wholesale; the
        # n_chars=8 BOUNDARY group has remaining 1, so doc 2 (1 tok)
        # is boundary-KEPT — exactly the count the null-unsafe join
        # dropped — and doc 3 (5 tok) is dropped; doc 4 dropped
        "text": ["t t", "y", "x x x x x", "z"],
    }
    pq.write_table(pa.table(docs), str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_null_source_boundary_counts_survive(spark, null_source_boundary_dir):
    got = _engine_selection(spark, null_source_boundary_dir)
    assert got == {None: (4, 9, 3, 2, 3)}
    tab = pq.read_table(f"{null_source_boundary_dir}/documents.parquet")
    ref = _reference_selection(
        zip(
            tab.column("doc_id").to_pylist(),
            tab.column("source").to_pylist(),
            tab.column("n_chars").to_pylist(),
            tab.column("text").to_pylist(),
        )
    )
    assert got == ref


def test_boundary_entered_exactly_at_budget(spark, boundary_tie_dir):
    got = _engine_selection(spark, boundary_tie_dir)
    # hand-computed, equal to the naive window semantics (cum <= budget)
    assert got["a"] == (4, 12, 4, 2, 4)
    assert got["b"] == (4, 9, 3, 2, 3)
    # and to the independent reference implementation
    tab = pq.read_table(f"{boundary_tie_dir}/documents.parquet")
    ref = _reference_selection(
        zip(
            tab.column("doc_id").to_pylist(),
            tab.column("source").to_pylist(),
            tab.column("n_chars").to_pylist(),
            tab.column("text").to_pylist(),
        )
    )
    assert got == ref
