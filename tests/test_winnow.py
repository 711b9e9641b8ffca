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
            for r in catalog()["q75_winnowing_fingerprints"].fn(spark, sf_dir).collect()
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


@pytest.mark.parametrize("win_w", [2, 3, 5])
def test_fold_tracks_tunable_win_w(spark, monkeypatch, win_w):
    """The round-11 advice: the Spark window-minima build must track
    _WIN_W like the generated SQL does (the original two-level tree
    only worked for _WIN_W == 4). Patch the constant and compare
    winnow_fps against the pure-Python winnow at the same width."""
    import pyspark.sql.functions as F

    from cometbft_log_etl_spark.queries import winnow as winnow_mod

    monkeypatch.setattr(winnow_mod, "_WIN_W", win_w)
    texts = [
        "a b c d e f g h i j k l m n o p",
        "a b c d e f g",
        "x y z w",          # exactly one gram -> zero windows at w >= 2
        "one two three",    # shorter than a gram
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select("doc_id", F.split("text", " ").alias("t"))
    got = {
        r.doc_id: (r.n_grams, r.n_windows, list(r.fp))
        for r in winnow_mod.winnow_fps(docs).collect()
    }
    for i, t in enumerate(texts):
        toks = t.split(" ")
        grams = [" ".join(toks[j : j + _WIN_K]) for j in range(len(toks) - _WIN_K + 1)]
        h = [_h32(g) for g in grams]
        nw = max(len(h) - win_w + 1, 0)
        minima = [min(h[j : j + win_w]) for j in range(nw)]
        fp, seen = [], set()
        for m in minima:
            if m not in seen:
                seen.add(m)
                fp.append(m)
        assert got[i] == (len(h), nw, fp), f"win_w={win_w} doc={i}"
