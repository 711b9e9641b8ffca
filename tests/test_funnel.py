"""Ground truth for the curation funnel (q109): an independent
pure-Python re-derivation of the WHOLE chain — quality gate, md5
canonical dedup, survivor-population bigram-LM banding, naive greedy
budget — must reproduce the engine's per-source funnel exactly, and
the funnel must be monotone (each stage can only shrink)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from cometbft_log_etl_spark.queries.funnel import _FUN_MIN_TOKENS, _FUN_MIN_UNIQ
from cometbft_log_etl_spark.queries.perplexity import _MILLI


def _r9(x: float) -> Decimal:
    return Decimal(repr(float(x))).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)


def _reference_funnel(sf_dir: str):
    tab = pq.read_table(f"{sf_dir}/documents.parquet")
    rows = [
        r
        for r in zip(
            tab.column("doc_id").to_pylist(),
            tab.column("source").to_pylist(),
            tab.column("lang").to_pylist(),
            tab.column("n_chars").to_pylist(),
            tab.column("text").to_pylist(),
        )
        if r[4] is not None
    ]
    # stage 1+2: quality gate, md5 canonical winner among passers
    recs = []
    for doc_id, source, lang, n_chars, text in rows:
        toks = text.split(" ")
        tc = len(toks)
        # quality gate over FILTERED tokens (q104's convention); LM and
        # budget stages use the raw split like q106/q14
        qt = [x for x in toks if x]
        q = (
            len(qt) >= _FUN_MIN_TOKENS
            and len(set(qt)) / len(qt) >= _FUN_MIN_UNIQ
        )
        fp = hashlib.md5(text.encode()).hexdigest()
        recs.append([doc_id, source, lang, n_chars, toks, tc, q, fp, False, False, False])
    winners: dict = {}
    for r in recs:
        if r[6]:
            winners[r[7]] = min(winners.get(r[7], r[0]), r[0])
    for r in recs:
        r[8] = r[6] and winners.get(r[7]) == r[0]  # is_canon
    surv1 = [r for r in recs if r[8]]

    # stage 3: per-lang add-one bigram LM on surv1's min(source) slice
    tsrc = min((r[1] for r in surv1 if r[1] is not None), default=None)
    c2: dict = defaultdict(int)
    voc: dict = defaultdict(set)
    for r in surv1:
        if r[1] != tsrc:
            continue
        for tok in set(r[4]):
            voc[r[2]].add(tok)
        for a, b in zip(r[4], r[4][1:]):
            c2[(r[2], a, b)] += 1
    c1: dict = defaultdict(int)
    for (lang, a, _), n in c2.items():
        c1[(lang, a)] += n
    v = {lang: len(s) + 1 for lang, s in voc.items()}
    mb_of: dict = {}
    for r in surv1:
        if len(r[4]) < 2:
            continue
        nb, s = 0, Decimal(0)
        for a, b in zip(r[4], r[4][1:]):
            nb += 1
            s += _r9(
                math.log(
                    (c2.get((r[2], a, b), 0) + 1.0)
                    / (c1.get((r[2], a), 0) + v.get(r[2], 1))
                )
            )
        mb_of[r[0]] = (r[2], math.floor(float(s) / nb * _MILLI))
    th: dict = {}
    for lang in {l for l, _ in mb_of.values()}:
        mbs = sorted((mb for l, mb in mb_of.values() if l == lang), reverse=True)
        n = len(mbs)
        th[lang] = mbs[(2 * n + 2) // 3 - 1]
    for r in surv1:
        lm = mb_of.get(r[0])
        r[9] = lm is not None and lm[1] >= th[lm[0]]  # banded
    surv2 = [r for r in surv1 if r[9]]

    # stage 4: naive greedy prefix per source over band survivors
    by_src: dict = defaultdict(list)
    for r in surv2:
        by_src[r[1]].append(r)
    for src, docs in by_src.items():
        docs.sort(key=lambda r: (r[3] is None, -(r[3] or 0), r[0] is not None, r[0] or 0))
        tot = sum(r[5] for r in docs)
        b = tot // 3
        cum = 0
        for r in docs:
            cum += r[5]
            r[10] = cum <= b  # kept

    out: dict = {}
    for r in recs:
        rec = out.setdefault(r[1], [0, 0, 0, 0, 0, 0])
        rec[0] += 1
        rec[1] += r[6]
        rec[2] += r[8]
        rec[3] += r[9]
        rec[4] += r[10]
        rec[5] += r[5] if r[10] else 0
    return {src: tuple(v) for src, v in out.items()}


def _engine_funnel(spark, sf_dir):
    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.session import (
        persistent_rdd_ids,
        release_new_persists,
    )

    before = persistent_rdd_ids(spark)
    try:
        return {
            r.source: (
                r.n_docs, r.n_quality, r.n_canonical,
                r.n_banded, r.n_selected, r.toks_selected,
            )
            for r in catalog()["q72_curation_funnel"].fn(spark, sf_dir).collect()
        }
    finally:
        release_new_persists(spark, before)


def test_funnel_matches_independent_reference(spark, sf_dir):
    assert _engine_funnel(spark, sf_dir) == _reference_funnel(sf_dir)


def test_funnel_is_monotone_and_bites(spark, sf_dir):
    got = _engine_funnel(spark, sf_dir)
    assert got
    total = [0] * 5
    for src, (n, q, c, b, s, toks) in got.items():
        assert n >= q >= c >= b >= s >= 0, src
        for i, x in enumerate((n, q, c, b, s)):
            total[i] += x
    # every stage must actually filter something on the real corpus
    assert total[0] > total[1] and total[1] >= total[2]
    assert total[2] > total[3] > total[4] > 0
