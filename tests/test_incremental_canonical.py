"""q116 incremental canonical churn: cross-query consistency with q114
(cluster membership / touched set) and q10 (the canonical selection
rule), plus a pure-Python recompute of the superseded canonicals.
The full fit-and-sweep cross-check runs through the DuckDB oracle."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cometbft_log_etl_spark.queries import catalog
from cometbft_log_etl_spark.tables import load


@pytest.fixture(scope="module")
def frames(spark, sf_dir):
    q114 = catalog()["q114_incremental_clusters"].fn(spark, sf_dir).collect()
    q116 = catalog()["q116_incremental_canonical"].fn(spark, sf_dir).collect()
    q10 = catalog()["q10_canonical_corpus"].fn(spark, sf_dir).collect()
    return q114, {r.cluster_id: r for r in q116}, {r.cluster_id: r for r in q10}


def test_touched_set_matches_q114(frames):
    q114, q116, _ = frames
    want = {r.cluster_id for r in q114 if r.is_batch}
    assert set(q116) == want
    assert want, "driver corpus has no touched clusters — vacuous test"


def test_canonical_matches_q10_rule(frames):
    """q10 resolves canonicals for EVERY cluster of the same union
    labels with the same quality rule — q116's rows must agree."""
    _, q116, q10 = frames
    for cid, r in q116.items():
        assert r.canonical_doc == q10[cid].canonical_doc, f"cluster {cid}"
        assert r.n_members == q10[cid].n_members, f"cluster {cid}"


def test_prev_canonical_pure_python(spark, sf_dir, frames):
    """Recompute the superseded canonicals independently: history
    labels from the machinery, quality ratios from quality_features,
    prev cluster = MIN absorbed history cluster id (NOT the surviving
    union id — a batch doc can win the min; the review finding this
    pins), winner = (uniq_ratio desc, doc_id asc) among that history
    cluster's HISTORY members."""
    from cometbft_log_etl_spark.queries.datapipe import quality_features
    from cometbft_log_etl_spark.queries.neardup import (
        cc_seed,
        dup_edges,
        hash_min_components,
        incremental_frontier,
    )

    q114, q116, _ = frames
    docs = load(spark, sf_dir, "documents")
    hist_sym, _ = incremental_frontier(dup_edges(docs))
    hist_labels = {
        r.doc_id: r.cluster_id
        for r in hash_min_components(cc_seed(hist_sym), hist_sym).collect()
    }
    uniq = {
        r.doc_id: r.uniq_ratio
        for r in quality_features(docs).select("doc_id", "uniq_ratio").collect()
    }
    hist_of = lambda d: hist_labels.get(d, d)  # noqa: E731
    clusters: dict[int, list[int]] = {}
    for r in q114:
        if not r.is_batch:
            clusters.setdefault(hist_of(r.doc_id), []).append(r.doc_id)
    # union-cluster -> absorbed history clusters
    absorbed: dict[int, set[int]] = {}
    for r in q114:
        if not r.is_batch:
            absorbed.setdefault(r.cluster_id, set()).add(hist_of(r.doc_id))
    saw_batch_won_min = False
    for cid, r in q116.items():
        hcs = absorbed.get(cid)
        if not hcs:
            assert r.prev_canonical is None, f"cluster {cid}"
            assert r.canonical_changed, f"cluster {cid}"
            continue
        prev_cluster = min(hcs)
        saw_batch_won_min |= prev_cluster != cid
        members = clusters[prev_cluster]
        want = min(
            members,
            key=lambda d: (-(uniq[d] if uniq[d] is not None else float("-inf")), d),
        )
        assert r.prev_canonical == want, f"cluster {cid}"
        assert r.canonical_changed == (r.canonical_doc != want), f"cluster {cid}"
        # the regression: any cluster with history members must report
        # the canonical it supersedes
        assert r.prev_canonical is not None, f"cluster {cid}"
    # the driver corpus actually exercises the batch-won-min case the
    # review found (6 rows at sf0.01; at least one here)
    assert saw_batch_won_min


def test_merge_events_imply_relabels(frames):
    """A cluster reporting n_hist_clusters >= 2 absorbed at least one
    history cluster whose id is not the surviving id — those members
    must read as relabeled in q114."""
    q114, q116, _ = frames
    relabeled_clusters = {r.cluster_id for r in q114 if r.relabeled}
    for cid, r in q116.items():
        if r.n_hist_clusters >= 2:
            assert cid in relabeled_clusters, f"cluster {cid}"
