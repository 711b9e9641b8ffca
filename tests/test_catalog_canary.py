"""Environment-drift canary: analysis-time resolution of the ENTIRE
catalog under a hostile, driver-style session.

Round 3 died on an analysis-level break (Spark 4.x flipped tz-naive
parquet timestamps to TIMESTAMP_NTZ, which unix_micros rejects) that
only surfaced for the five timestamp queries the driver happened to
run. This canary builds the logical plan of ALL catalog queries —
`df.schema` forces full analysis but executes nothing — under session
confs reset to Spark defaults, so the next engine/testdata drift fails
here in seconds instead of in the driver's correctness gate.
"""

from __future__ import annotations

import pytest

from cometbft_log_etl_spark.queries import catalog

# Confs the driver does NOT set for us: flip them back to Spark-default
# values so the canary proves every query fn restores its own
# correctness environment via tune_session / tables.load.
_HOSTILE = {
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    "spark.sql.session.timeZone": "America/New_York",
}

# Queries whose *construction* executes jobs (eager localCheckpoints in
# iterative loops, driver-round-tripped model fits). Analysis is still
# covered — test_all_catalog_queries_resolve_under_hostile_session runs
# the FULL catalog; this set only exempts them from the plan-only time
# budget below, which would otherwise measure fit-job execution, not
# analysis. Membership criterion is mechanical: >= 3 Spark jobs during
# fn() construction at sf0.001 (a bare load() costs 1 parquet-footer
# job per table; the eager fits run 15-38). Audited round 14: the four
# r3-era names had never been extended as the catalog grew its eager
# tiers (q104 fit r11; q114/q116 CC maintenance loops; q115
# calibration fit; q121/q122 unigram fit r13; q135/q137 soft-EM fit
# r14) — ~51 s of fit execution was being charged against the 60 s
# plan-only budget, which finally tipped it over when the r14 build
# added the soft-EM pair.
_EAGER = {
    "q37_neardup_clusters",
    "q10_canonical_corpus",
    "q16_bpe_merges",
    "q18_bpe_token_counts",
    "q104_quality_classifier",
    "q114_incremental_clusters",
    "q115_classifier_calibration",
    "q116_incremental_canonical",
    "q121_unigram_fit",
    "q122_unigram_encode",
    "q135_unigram_soft_fit",
    "q137_unigram_soft_encode",
}


def test_all_catalog_queries_resolve_under_hostile_session(spark, sf_dir):
    originals = {}
    for k, v in _HOSTILE.items():
        originals[k] = spark.conf.get(k, None)
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    try:
        failures = []
        for name, qdef in catalog().items():
            # re-hostilize: each query fn's tune_session un-sets these,
            # so the NEXT query must survive a freshly hostile session
            # (the driver runs queries in arbitrary order).
            for k, v in _HOSTILE.items():
                try:
                    spark.conf.set(k, v)
                except Exception:
                    pass
            try:
                df = qdef.fn(spark, sf_dir)
                n_fields = len(df.schema.fields)  # forces analysis
                if n_fields == 0:
                    failures.append(f"{name}: empty schema")
            except Exception as exc:  # noqa: BLE001 — canary reports all
                failures.append(f"{name}: {type(exc).__name__}: {exc}")
        assert not failures, "analysis-time drift:\n" + "\n".join(failures)
    finally:
        for k, v in originals.items():
            try:
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
            except Exception:
                pass


def test_canary_is_fast(spark, sf_dir):
    """The canary must stay cheap enough to run every round: plan-only
    resolution for the non-eager catalog, well under the budget.

    Budget recalibrated round 14: 60 s dated from a ~100-query catalog;
    at 127 queries the non-eager loop measures ~45 s solo and ~65 s
    inside the full suite (shared-JVM heap/JIT state inflates Catalyst
    analysis), so 60 had no margin left and flaked on suite order. The
    failure mode this guards — a query's construction silently growing
    a job or an analysis blowup (the q09 CollapseProject class ran
    MINUTES) — is an order-of-magnitude signal, not a ±30% one; 120 s
    still catches it while not tripping on JVM state."""
    import time

    t0 = time.monotonic()
    for name, qdef in catalog().items():
        if name in _EAGER:
            continue
        _ = qdef.fn(spark, sf_dir).schema
    elapsed = time.monotonic() - t0
    assert elapsed < 120, f"canary took {elapsed:.1f}s — no longer plan-only?"
