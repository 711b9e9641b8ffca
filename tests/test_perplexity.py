"""Ground truth for CCNet perplexity banding (q106): an independent
single-process re-derivation (pure-Python bigram LM, math.log, exact
Decimal sums) must reproduce the engine's band report exactly, and the
band structure itself must satisfy the tertile invariants (coverage,
ordering, threshold placement) that make it a usable curation tier."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq
import pytest

from cometbft_log_etl_spark.queries.perplexity import _MILLI


def _r9(x: float) -> Decimal:
    return Decimal(repr(float(x))).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)


def _reference_bands(sf_dir: str):
    tab = pq.read_table(f"{sf_dir}/documents.parquet")
    docs = list(
        zip(
            tab.column("doc_id").to_pylist(),
            tab.column("lang").to_pylist(),
            tab.column("source").to_pylist(),
            tab.column("text").to_pylist(),
        )
    )
    tsrc = min((s for _, _, s, _ in docs if s is not None), default=None)
    # per-language add-one bigram LM over the target slice; split(" ")
    # with NO empty filter — the q95/q106 convention
    c2: dict = defaultdict(int)
    voc: dict = defaultdict(set)
    for _, lang, source, text in docs:
        if source != tsrc or text is None:
            continue
        toks = text.split(" ")
        for tok in set(toks):
            voc[lang].add(tok)
        for a, b in zip(toks, toks[1:]):
            c2[(lang, a, b)] += 1
    c1: dict = defaultdict(int)
    for (lang, a, _), n in c2.items():
        c1[(lang, a)] += n
    v = {lang: len(s) + 1 for lang, s in voc.items()}

    per_doc: dict = {}
    for doc_id, lang, _, text in docs:
        if text is None:
            continue
        toks = text.split(" ")
        if len(toks) < 2:
            continue
        rec = per_doc.setdefault((doc_id, lang), [0, Decimal(0)])
        for a, b in zip(toks, toks[1:]):
            n12 = c2.get((lang, a, b), 0)
            n1 = c1.get((lang, a), 0)
            rec[0] += 1
            rec[1] += _r9(math.log((n12 + 1.0) / (n1 + v.get(lang, 1))))
    dist: dict = defaultdict(int)
    for (_, lang), (nb, s) in per_doc.items():
        mb = math.floor(float(s) / nb * _MILLI)
        dist[(lang, mb)] += 1

    out = {}
    for lang in {l for (l, _) in dist}:
        rows = sorted(
            ((mb, cnt) for (l, mb), cnt in dist.items() if l == lang), reverse=True
        )
        n = sum(c for _, c in rows)
        k1, k2 = (n + 2) // 3, (2 * n + 2) // 3
        cum, t1, t2 = 0, None, None
        for mb, cnt in rows:
            start = cum + 1
            cum += cnt
            if start <= k1:
                t1 = mb
            if start <= k2:
                t2 = mb
        bands: dict = defaultdict(lambda: [0, None, None])
        for mb, cnt in rows:
            b = "head" if mb >= t1 else ("middle" if mb >= t2 else "tail")
            rec = bands[b]
            rec[0] += cnt
            rec[1] = mb if rec[1] is None else min(rec[1], mb)
            rec[2] = mb if rec[2] is None else max(rec[2], mb)
        for b, (cnt, lo, hi) in bands.items():
            out[(lang, b)] = (cnt, lo, hi, t1, t2)
    return out


@pytest.fixture(scope="module")
def reference(sf_dir):
    return _reference_bands(sf_dir)


def _engine_bands(spark, sf_dir):
    from cometbft_log_etl_spark.queries import catalog

    rows = catalog()["q106_perplexity_bands"].fn(spark, sf_dir).collect()
    return {
        (r.lang, r.band): (r.n_docs, r.mb_min, r.mb_max, r.head_cut, r.mid_cut)
        for r in rows
    }


def test_bands_match_independent_reference(spark, sf_dir, reference):
    got = _engine_bands(spark, sf_dir)
    assert got == reference


def test_tertile_invariants(spark, sf_dir):
    """Structural gates that make the tier usable: every document is
    banded, head holds at least its tertile share, and the bands are
    disjoint milli-nat intervals in the right order."""
    got = _engine_bands(spark, sf_dir)
    langs = {lang for (lang, _) in got}
    assert langs, "banding produced no languages"
    for lang in langs:
        by_band = {b: got[(lang, b)] for (l, b) in got if l == lang}
        n = sum(v[0] for v in by_band.values())
        k1, k2 = (n + 2) // 3, (2 * n + 2) // 3
        head = by_band.get("head")
        assert head is not None and head[0] >= k1, (lang, by_band)
        if "middle" in by_band:
            assert head[0] + by_band["middle"][0] >= k2
            # disjoint, ordered: head's floor above middle's ceiling
            assert head[1] > by_band["middle"][2]
        if "tail" in by_band and "middle" in by_band:
            assert by_band["middle"][1] > by_band["tail"][2]
        # thresholds are shared per language and sit at band edges:
        # t1's own group is in head by definition, so head's floor IS t1
        t1, t2 = head[3], head[4]
        assert head[1] == t1
        for v in by_band.values():
            assert (v[3], v[4]) == (t1, t2)


def test_head_is_more_fluent_than_tail(spark, sf_dir):
    """The CCNet orientation check: head documents carry HIGHER mean
    bigram log-prob (lower perplexity) than tail documents — a sign
    flip anywhere in the scoring chain fails here, not in production."""
    got = _engine_bands(spark, sf_dir)
    for (lang, band), v in got.items():
        if band != "head":
            continue
        tail = got.get((lang, "tail"))
        if tail is not None:
            assert v[1] > tail[2], (lang, v, tail)
