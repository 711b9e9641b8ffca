"""Ground truth for the learned quality classifier (q104): an
independent single-process fit re-deriving the exact quantized algebra
(hashlib md5 buckets, exact-decimal sums via Python Decimal, HALF_UP
9-decimal rounding) must reproduce the engine's fitted weights EXACTLY,
and the fitted model must genuinely learn — beat the constant
best-label predictor on its training labels."""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq
import pytest

from cometbft_log_etl_spark.queries.classifier import (
    _A_CAP,
    _QC_BIAS,
    _QC_D,
    _QC_FLAG,
    _QC_LEN,
    _QC_STEPS,
    _QC_UNIQ,
)
from cometbft_log_etl_spark.tables import load


def _r9(x: float) -> Decimal:
    """Spark round(double, 9): shortest repr, HALF_UP — used only where
    the ENGINE rounds doubles (the xn / ur feature quantizations)."""
    return Decimal(repr(float(x))).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)


def _q9(d: Decimal) -> Decimal:
    """DECIMAL round(·, 9) — exact HALF_UP on an exact decimal, the
    quantization both engines agree on bit for bit."""
    return d.quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)


def _reference_fit(sf_dir: str):
    """The whole q104 fit, re-derived with hashlib + Decimal only."""
    tab = pq.read_table(f"{sf_dir}/documents.parquet")
    by_doc: dict[int, dict] = {}
    for doc_id, text, source in zip(
        tab.column("doc_id").to_pylist(),
        tab.column("text").to_pylist(),
        tab.column("source").to_pylist(),
    ):
        toks = [x for x in (text or "").split(" ") if x]
        if not toks:
            continue
        n = len(toks)
        uniq = len(set(toks))
        yr = 0.0 if (n < 30 or uniq / n < 0.35) else 1.0
        ur = _r9(uniq / n)
        rec = by_doc.setdefault(
            doc_id, {"src": source, "n": 0, "y": yr, "ur": ur, "cnt": {}}
        )
        # GROUP BY doc_id merge semantics: counts sum, y/src/ur take min
        rec["n"] += n
        rec["y"] = min(rec["y"], yr)
        rec["ur"] = min(rec["ur"], ur)
        rec["src"] = min(rec["src"], source)
        for tok in toks:
            d = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % _QC_D
            rec["cnt"][d] = rec["cnt"].get(d, 0) + 1
    docs = []
    for doc_id, rec in by_doc.items():
        feats = {
            d: _r9(c / rec["n"]) for d, c in rec["cnt"].items()
        }
        feats[_QC_BIAS] = Decimal(1)
        feats[_QC_LEN] = Decimal(min(rec["n"], 100)) / Decimal(100)
        feats[_QC_UNIQ] = rec["ur"]
        docs.append((doc_id, rec["src"], rec["y"], feats))
    m = max(len(docs), 1)

    from cometbft_log_etl_spark.queries.classifier import _duck_round9

    w: dict[int, Decimal] = {}
    for step in range(_QC_STEPS):
        # err9: exact-decimal prediction, DECIMAL-rounded at 9, minus
        # the integer label (round-then-subtract == subtract-then-round)
        errs = []
        for _, _, y, feats in docs:
            pred = (
                Decimal(0)
                if step == 0
                else sum(w[d] * xn for d, xn in feats.items())
            )
            errs.append(_q9(pred) - Decimal(int(y)))
        # per-bucket gradient SUMS: exact decimal, no rounding at all
        gsum: dict[int, Decimal] = {}
        for (_, _, _, feats), e9 in zip(docs, errs):
            for d, xn in feats.items():
                gsum[d] = gsum.get(d, Decimal(0)) + e9 * xn
        # the two double quotients use DuckDB round semantics
        g = {d: _duck_round9(float(s) / m) for d, s in gsum.items()}
        num = float(sum(gv * gv for gv in g.values()))
        den_sum = Decimal(0)
        for _, _, _, feats in docs:
            xg9 = _q9(sum(g[d] * xn for d, xn in feats.items()))
            den_sum += xg9 * xg9
        den = float(den_sum) / m
        alpha = (
            min(_duck_round9(num / den), Decimal(repr(_A_CAP)))
            if den > 0
            else Decimal(0)
        )
        for d, gv in g.items():
            w[d] = w.get(d, Decimal(0)) - alpha * gv
    scores = {
        doc_id: _q9(sum(w[d] * xn for d, xn in feats.items()))
        for doc_id, _, _, feats in docs
    }
    labels = {doc_id: y for doc_id, _, y, _ in docs}
    return w, scores, labels


@pytest.fixture(scope="module")
def reference(sf_dir):
    return _reference_fit(sf_dir)


def test_fitted_weights_match_independent_reference(spark, sf_dir, reference):
    from cometbft_log_etl_spark.queries.classifier import fit_quality_classifier
    from cometbft_log_etl_spark.session import (
        persistent_rdd_ids,
        release_new_persists,
    )

    ref_w, _, _ = reference
    before = persistent_rdd_ids(spark)
    try:
        _, w = fit_quality_classifier(load(spark, sf_dir, "documents"))
    finally:
        release_new_persists(spark, before)
    assert set(w) == set(ref_w)
    for d in ref_w:
        assert w[d] == ref_w[d], f"bucket {d}: engine {w[d]} != reference {ref_w[d]}"


def test_scores_match_independent_reference(spark, sf_dir, reference):
    from cometbft_log_etl_spark.queries.classifier import classifier_scores
    from cometbft_log_etl_spark.session import (
        persistent_rdd_ids,
        release_new_persists,
    )

    _, ref_scores, _ = reference
    before = persistent_rdd_ids(spark)
    try:
        got = {
            r.doc_id: Decimal(repr(r.score))
            for r in classifier_scores(load(spark, sf_dir, "documents")).collect()
        }
    finally:
        release_new_persists(spark, before)
    assert set(got) == set(ref_scores)
    for k, v in ref_scores.items():
        assert got[k] == v.normalize() or got[k] == v, (k, got[k], v)


def test_model_actually_learns(reference):
    """The fitted scorer must beat the constant best-label predictor on
    its own training labels — a classifier whose flags carry no signal
    (the first-draft fixed-lr GD measured exactly base-rate accuracy)
    fails here."""
    _, scores, labels = reference
    base = max(
        sum(1 for y in labels.values() if y == 1.0),
        sum(1 for y in labels.values() if y == 0.0),
    ) / len(labels)
    acc = sum(
        1 for k, s in scores.items() if (float(s) >= _QC_FLAG) == (labels[k] == 1.0)
    ) / len(labels)
    assert acc >= base + 0.05, f"accuracy {acc:.3f} vs base rate {base:.3f}"


def test_bias_row_count_is_document_count(spark, sf_dir):
    """The round-12 job fusion reads m off the step-0 gradient
    aggregate's bias-bucket row instead of a separate count() job —
    valid only while EVERY document row carries the bias feature."""
    import pyspark.sql.functions as F

    from cometbft_log_etl_spark.queries.classifier import (
        _QC_BIAS,
        _qc_doc_feats,
        _qc_grad_sums,
    )

    feats = _qc_doc_feats(load(spark, sf_dir, "documents"))
    sums = _qc_grad_sums(feats, (F.lit(0.0) - F.col("y")).cast("decimal(19,9)"))
    bias_n = next(n for d, _, n in sums if d == _QC_BIAS)
    assert bias_n == feats.count()
