"""Driver-environment regressions: queries must be correct under a
session the driver built (non-UTC timezone, no pre-tuning), and the
approximate similarity tiers must actually find near neighbours."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cometbft_log_etl_spark.queries import catalog
from cometbft_log_etl_spark.testing.compare import run_compare

# Timestamp-heavy + iterative + new queries: the ones with the most to
# lose if tune_session stops being called inside every query fn.
_TZ_SENSITIVE = [
    "q95_window_battery",
    "q23_sessionization",
    "q130_datetime_funcs",
    "q48_time_bucket_rollup",
    "q35_asof_enrich",
    "q37_neardup_clusters",
    # render→parse attestations format and re-parse RFC3339 strings:
    # a session-tz leak would shift both ts_us columns
    "q127_vote_parse",
    "q128_block_parse",
]


@pytest.mark.parametrize("name", _TZ_SENSITIVE)
def test_query_survives_hostile_session_timezone(spark, sf_dir, name):
    """The driver hands queries a session it configured; a non-UTC
    session timezone must not change results (every query fn calls
    tune_session internally — this guards that contract)."""
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Australia/Eucla")
        res = run_compare(spark, catalog()[name], sf_dir)
        assert res.ok, str(res)
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)


def test_ann_tiers_recall_vs_brute_force(spark, sf_dir):
    """q58 (LSH) and q39 (IVF) are approximations of q04's exact
    brute-force cosine ranking — on the fixed test corpus their top
    results must overlap the exact top-k for the shared probes
    (deterministic data → deterministic recall; this is a quality
    floor, not a tolerance)."""
    cat = catalog()
    exact = (
        cat["q04_cosine_topk"].fn(spark, sf_dir)
        .filter(F.col("probe_id") < 3)
        .filter(F.col("rank") <= 5)
    )
    exact_pairs = {(r.probe_id, r.cand_id) for r in exact.collect()}
    assert exact_pairs, "brute-force tier returned nothing"

    # IVF routes by actual cosine-to-centroid, so on any corpus it must
    # recover a meaningful share of the exact top-5.
    ivf = {(r.probe_id, r.cand_id) for r in cat["q39_ann_ivf"].fn(spark, sf_dir).collect()}
    recall = len(exact_pairs & ivf) / len(exact_pairs)
    assert recall >= 0.2, f"q39_ann_ivf recall@5 = {recall:.2f} — cell routing broken?"

    # Single-table 8-plane LSH has near-zero recall on this high-entropy
    # synthetic corpus (expected — recall needs multi-probe/more tables);
    # assert internal consistency instead: candidates exist and ranks
    # follow cosine order within each probe.
    lsh = cat["q86_ann_lsh"].fn(spark, sf_dir).collect()
    assert lsh, "LSH tier returned no candidates"
    by_probe: dict = {}
    for r in lsh:
        by_probe.setdefault(r.probe_id, []).append(r)
    for rows in by_probe.values():
        rows.sort(key=lambda r: r.rank)
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)

    # Multi-probe (q07) is the recall fix on top of q58: coarser cells +
    # least-confident bit-flip probes. It must strictly dominate the
    # single-probe tier and clear a real floor (measured 5/15 at
    # sf0.001, 11/15 at sf0.01; q58 finds 0 at both).
    lsh_pairs = {(r.probe_id, r.cand_id) for r in lsh}
    mp = {
        (r.probe_id, r.cand_id)
        for r in cat["q07_ann_multiprobe"].fn(spark, sf_dir).collect()
    }
    r_lsh = len(exact_pairs & lsh_pairs) / len(exact_pairs)
    r_mp = len(exact_pairs & mp) / len(exact_pairs)
    assert r_mp > r_lsh, f"multi-probe recall {r_mp:.2f} <= single-probe {r_lsh:.2f}"
    assert r_mp >= 0.3, f"q07_ann_multiprobe recall@5 = {r_mp:.2f} — probe set broken?"


def test_catalog_report_is_fresh():
    """CATALOG.md must match the registries — regenerating must be a
    no-op, so the doc can never drift from the code."""
    import os

    from tools.catalog_report import REPO, build_report

    path = os.path.join(REPO, "CATALOG.md")
    assert os.path.exists(path), "run: python tools/catalog_report.py --write"
    with open(path, encoding="utf-8") as f:
        assert f.read() == build_report()
