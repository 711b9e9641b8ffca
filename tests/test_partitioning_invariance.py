"""Partition-count invariance: results must not depend on parallelism.

The driver compares against DuckDB at ONE partitioning; a query whose
result silently depends on partition count (unstable any_value /
first-wins picks, non-associative folds) can pass there and still be
nondeterministic on a real cluster. This gate re-runs the most
order-sensitivity-prone queries under deliberately odd parallelism
(3 shuffle partitions) and requires the oracle match to hold there
too. A full-catalog sweep at odd partitioning passed 92/92 when this
gate was introduced; the subset keeps CI time bounded.
"""

from __future__ import annotations

import pytest

from cometbft_log_etl_spark.queries import catalog
from cometbft_log_etl_spark.testing.compare import run_compare

# dedup keeps / first-per-group picks / any_value carries / argmax ties
_PRONE = [
    "q21_fifo_pairing",
    "q50_first_per_group",
    "q51_last_wins_dedup",
    "q28_exact_dedup",
    "q10_canonical_corpus",
    "q13_incremental_dedup",
    "q15_nb_langid",
    "q40_retention_cohorts",
    "q17_semantic_kmeans",  # argmax assignment + first(emb) carries
    "q25_semantic_dedup",  # min-id representative picks + member cap rank
    "q45_exact_substring_runs",  # per-gram occurrence cap rank + islands
    "q46_substring_scrub",  # inherits the cap + collect_list span sets
    "q70_source_token_budget",  # running-sum windows + boundary-group picks
    "q72_curation_funnel",  # min-id dedup winner + budget boundary picks
    # TWO argmax assignment fronts + min-id dup_of picks + member-cap
    # ranks, then a diff join — every prone pattern at once (round 14)
    "q134_semantic_refit",
    "q120_incremental_semdedup",  # the same class, single stored model
]


@pytest.fixture(scope="module")
def odd_spark(spark):
    """The shared session re-tuned to 3-way parallelism for this module.

    Every query calls tune_session internally, which reads the
    SPARK_GRAFT_CPUS env on each call — so the env var (not a one-shot
    conf set) is the lever that actually survives into the query plans.
    Restored afterwards so later modules run at normal width.
    """
    import os

    from cometbft_log_etl_spark.session import tune_session

    prev = os.environ.get("SPARK_GRAFT_CPUS")
    os.environ["SPARK_GRAFT_CPUS"] = "3"
    tune_session(spark)
    yield spark
    if prev is None:
        os.environ.pop("SPARK_GRAFT_CPUS", None)
    else:
        os.environ["SPARK_GRAFT_CPUS"] = prev
    tune_session(spark)


@pytest.mark.parametrize("name", _PRONE)
def test_result_invariant_under_odd_partitioning(odd_spark, sf_dir, name):
    res = run_compare(odd_spark, catalog()[name], sf_dir)
    assert res.ok, str(res)
