"""q115 classifier calibration: the threshold sweep's confusion rows
must equal a pure-Python recount over the held-out (label, score)
pairs, and must satisfy the sweep identities (monotone tp, constant
tp+fn). The fit itself is cross-checked by q104's proven chain and the
q115 DuckDB oracle; these tests pin the NEW logic — the held-out
split, the one-pass conditional-sum sweep, and the derived ratios."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from cometbft_log_etl_spark.queries import catalog
from cometbft_log_etl_spark.queries.calibration import (
    _CAL_GRID,
    _CAL_HIST_CUT,
    _CAL_HIST_MOD,
)
from cometbft_log_etl_spark.queries.classifier import (
    _map_lit,
    _qc_doc_feats,
    _qc_pred_col,
    _W_DEC,
    fit_quality_classifier,
)
from cometbft_log_etl_spark.tables import load


@pytest.fixture(scope="module")
def held_scores(spark, sf_dir):
    """(y, score) for the held-out slice under the train-slice fit —
    the same builders q115 composes, collected once."""
    docs = load(spark, sf_dir, "documents")
    hist = (F.col("doc_id") % _CAL_HIST_MOD) < _CAL_HIST_CUT
    _, w = fit_quality_classifier(docs.filter(hist))
    wmap = _map_lit(list(w.items()), _W_DEC)
    rows = (
        _qc_doc_feats(docs.filter(~hist))
        .select("y", F.round(_qc_pred_col(wmap), 9).cast("double").alias("score"))
        .collect()
    )
    return [(r.y, r.score) for r in rows]


@pytest.fixture(scope="module")
def sweep(spark, sf_dir):
    out = catalog()["q115_classifier_calibration"].fn(spark, sf_dir).collect()
    return {r.threshold: r for r in out}


def test_confusion_matches_pure_python(held_scores, sweep):
    assert len(sweep) == len(_CAL_GRID)
    for t in _CAL_GRID:
        tp = sum(1 for y, s in held_scores if s >= t and y == 1.0)
        fp = sum(1 for y, s in held_scores if s >= t and y == 0.0)
        fn = sum(1 for y, s in held_scores if s < t and y == 1.0)
        r = sweep[t]
        assert (r.tp, r.fp, r.fn) == (tp, fp, fn), f"threshold {t}"
        want_prec = tp / (tp + fp) if tp + fp > 0 else None
        want_rec = tp / (tp + fn) if tp + fn > 0 else None
        assert r.prec == want_prec and r.rec == want_rec, f"threshold {t}"
        if want_prec is not None and want_rec is not None and want_prec + want_rec > 0:
            assert math.isclose(r.f1, 2 * want_prec * want_rec / (want_prec + want_rec))
        else:
            assert r.f1 is None


def test_sweep_identities(held_scores, sweep):
    n_pos = sum(1 for y, _ in held_scores if y == 1.0)
    n_neg = len(held_scores) - n_pos
    ordered = [sweep[t] for t in _CAL_GRID]
    for r in ordered:
        assert r.tp + r.fn == n_pos  # every positive is counted exactly once
        assert r.fp <= n_neg
    # flagged counts are monotone nonincreasing in the threshold
    for lo, hi in zip(ordered, ordered[1:]):
        assert hi.tp <= lo.tp and hi.fp <= lo.fp
    # the sweep is informative on the driver corpus: the trade-off
    # actually moves (a flat sweep would mean degenerate scores) and
    # both classes exist in the held-out slice
    assert n_pos > 0 and n_neg > 0
    assert len({(r.tp, r.fp) for r in ordered}) > 1
