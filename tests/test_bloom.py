"""Ground truth for the Bloom ingestion screen (q108): an independent
pure-Python Bloom filter must reproduce the engine's per-source report
exactly, the Bloom guarantee must hold (ZERO false negatives — every
true duplicate is flagged maybe), and a planted-duplicate corpus must
drive the exact-verify tier to a nonzero true-dup count."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cometbft_log_etl_spark.queries.bloom import (
    _BLOOM_BITS_PER,
    _BLOOM_K,
    _BLOOM_MIN_M,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _positions(fp: str, m: int):
    return [
        int(_md5(fp + str(i))[:8], 16) % m for i in range(_BLOOM_K)
    ]


def _reference(rows):
    """rows: (doc_id, source, text). Mirrors the query: md5 fingerprints,
    doc_id %% 10 < 8 history split, m = max(floor, 8 * |hist fps|)."""
    fps = [
        (doc_id, source, _md5(text), doc_id % 10 < 8)
        for doc_id, source, text in rows
        if text is not None
    ]
    hist = {fp for _, _, fp, is_hist in fps if is_hist}
    m = max(_BLOOM_MIN_M, _BLOOM_BITS_PER * len(hist))
    bits = {p for fp in hist for p in _positions(fp, m)}
    out: dict = defaultdict(lambda: [0, 0, 0, 0, 0])
    for doc_id, source, fp, is_hist in fps:
        if is_hist:
            continue
        rec = out[source]
        rec[0] += 1
        if all(p in bits for p in _positions(fp, m)):
            rec[2] += 1  # maybe
            if fp in hist:
                rec[3] += 1  # true dup
            else:
                rec[4] += 1  # false positive
        else:
            rec[1] += 1  # definitely new
    return {src: tuple(v) for src, v in out.items()}


def _engine(spark, sf_dir):
    from cometbft_log_etl_spark.queries import catalog

    return {
        r.source: (r.n_batch, r.n_new, r.n_maybe, r.n_true_dup, r.n_false_pos)
        for r in catalog()["q71_bloom_screen"].fn(spark, sf_dir).collect()
    }


def _table_rows(sf_dir):
    tab = pq.read_table(f"{sf_dir}/documents.parquet")
    return list(
        zip(
            tab.column("doc_id").to_pylist(),
            tab.column("source").to_pylist(),
            tab.column("text").to_pylist(),
        )
    )


def test_screen_matches_independent_reference(spark, sf_dir):
    assert _engine(spark, sf_dir) == _reference(_table_rows(sf_dir))


def test_bloom_guarantee_no_false_negatives(spark, sf_dir):
    """Every batch document whose fingerprint IS in the history must be
    counted as a true duplicate — a Bloom filter can over-admit, never
    under-admit."""
    rows = _table_rows(sf_dir)
    hist = {
        _md5(t) for d, _, t in rows if t is not None and d % 10 < 8
    }
    exact = defaultdict(int)
    for d, s, t in rows:
        if t is not None and d % 10 >= 8 and _md5(t) in hist:
            exact[s] += 1
    got = _engine(spark, sf_dir)
    for src, (n_batch, n_new, n_maybe, n_dup, n_fp) in got.items():
        assert n_dup == exact.get(src, 0), src
        assert n_new + n_maybe == n_batch, src
        assert n_dup + n_fp == n_maybe, src


@pytest.fixture()
def planted_dup_dir(tmp_path):
    """40 history docs + 10 batch docs of which 4 duplicate a history
    text exactly — the verify tier must adjudicate them as true dups
    (and the screen must flag all 4 as maybe)."""
    doc_ids, sources, texts, n_chars = [], [], [], []
    for i in range(40):
        did = i * 10  # % 10 == 0 -> history
        doc_ids.append(did)
        sources.append(f"s{i % 3}")
        texts.append(f"history document number {i} with body {i * 7}")
    for j in range(10):
        did = j * 10 + 9  # % 10 == 9 -> batch
        doc_ids.append(did)
        sources.append(f"s{j % 3}")
        texts.append(
            f"history document number {j} with body {j * 7}"
            if j < 4
            else f"fresh batch document {j}"
        )
    n_chars = [len(t) for t in texts]
    langs = ["en"] * len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": doc_ids,
                "text": texts,
                "lang": langs,
                "source": sources,
                "n_chars": n_chars,
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_planted_duplicates_hit_exact_tier(spark, planted_dup_dir):
    got = _engine(spark, planted_dup_dir)
    assert got == _reference(_table_rows(planted_dup_dir))
    assert sum(v[3] for v in got.values()) == 4  # all four planted dups
    for src, (n_batch, n_new, n_maybe, n_dup, n_fp) in got.items():
        assert n_dup + n_fp == n_maybe, src
