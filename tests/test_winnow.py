"""Ground truth for winnowing fingerprints (q110): an independent
pure-Python winnower (hashlib grams, window minima) must reproduce the
engine's report exactly, and the winnowing GUARANTEE must hold on an
engineered corpus — two documents sharing a run of >= w + k - 1 tokens
share at least one fingerprint (their max_fp_share reflects it)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cometbft_log_etl_spark.queries.winnow import _WIN_K, _WIN_W


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _winnow(text: str):
    toks = text.split(" ")
    grams = [
        " ".join(toks[i : i + _WIN_K]) for i in range(len(toks) - _WIN_K + 1)
    ]
    h = [_h32(g) for g in grams]
    nw = max(len(h) - _WIN_W + 1, 0)
    minima = [min(h[i : i + _WIN_W]) for i in range(nw)]
    # order-preserving distinct, matching Spark/DuckDB array_distinct
    fp, seen = [], set()
    for m in minima:
        if m not in seen:
            seen.add(m)
            fp.append(m)
    return len(h), nw, fp


def _reference(sf_dir: str):
    tab = pq.read_table(f"{sf_dir}/documents.parquet")
    per_doc = {}
    share: dict = defaultdict(int)
    for doc_id, text in zip(
        tab.column("doc_id").to_pylist(), tab.column("text").to_pylist()
    ):
        if text is None:
            continue
        ng, nw, fp = _winnow(text)
        per_doc[doc_id] = (ng, nw, fp)
        for f in fp:
            share[f] += 1
    return {
        doc_id: (
            ng,
            nw,
            len(fp),
            max((share[f] for f in fp), default=0),
        )
        for doc_id, (ng, nw, fp) in per_doc.items()
    }


def _engine(spark, sf_dir):
    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.session import (
        persistent_rdd_ids,
        release_new_persists,
    )

    before = persistent_rdd_ids(spark)
    try:
        return {
            r.doc_id: (r.n_grams, r.n_windows, r.n_fingerprints, r.max_fp_share)
            for r in catalog()["q110_winnowing_fingerprints"].fn(spark, sf_dir).collect()
        }
    finally:
        release_new_persists(spark, before)


def test_fingerprints_match_independent_reference(spark, sf_dir):
    assert _engine(spark, sf_dir) == _reference(sf_dir)


@pytest.fixture()
def shared_run_dir(tmp_path):
    """Docs 1 and 2 embed the SAME (w + k - 1)-token run at different
    offsets inside otherwise disjoint text; doc 3 shares nothing."""
    run = " ".join(f"shared{i}" for i in range(_WIN_W + _WIN_K - 1))
    docs = {
        "doc_id": [1, 2, 3],
        "source": ["a", "a", "a"],
        "lang": ["en", "en", "en"],
        "n_chars": [0, 0, 0],
        "text": [
            "alpha beta gamma " + run + " delta epsilon",
            "one two three four five " + run + " six",
            "totally different words with no overlap at all here",
        ],
    }
    docs["n_chars"] = [len(t) for t in docs["text"]]
    pq.write_table(
        pa.table(docs), str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_shared_run_guarantee(spark, shared_run_dir):
    got = _engine(spark, shared_run_dir)
    assert got == _reference(shared_run_dir)
    # the winnowing guarantee: a shared w+k-1 run forces a shared
    # fingerprint, so docs 1 and 2 report a share of at least 2 while
    # the disjoint doc reports 1 (its own fingerprints only)
    assert got[1][3] >= 2 and got[2][3] >= 2
    assert got[3][3] == 1
