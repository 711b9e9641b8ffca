"""q114 incremental near-dup cluster maintenance.

Two independent checks of the contraction algebra:

- synthetic edge graphs (no LSH involved) run the incremental pipeline
  pieces against a pure-Python union-find covering every structural
  case: a batch doc bridging two distinct history clusters, a
  batch-only cluster, an untouched history cluster, a batch doc joining
  one history cluster, isolated docs on both sides;
- end-to-end on the driver corpus, incremental labels must equal a
  full cluster_labels re-run doc for doc (the verdict's parity bar) —
  real LSH edges, both loops exercised.

The DuckDB-oracle cross-check (both clusterings via independent
recursive CTEs) runs in the driver window / check_correctness.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cometbft_log_etl_spark.queries.neardup import (
    _INC_HIST_CUT,
    _INC_HIST_MOD,
    cc_seed,
    cluster_labels,
    contract_frontier,
    hash_min_components,
    incremental_frontier,
)


def _union_find(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label per component, the Hash-Min contract
    comp = {}
    for i in n_ids:
        comp.setdefault(find(i), []).append(i)
    return {i: min(members) for r, members in comp.items() for i in members}


def _incremental_labels(spark, doc_ids, edges):
    """Run the q114 pipeline on a synthetic (doc_ids, undirected edges)
    graph and return {doc_id: (cluster_id, relabeled)}."""
    sym_rows = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    sym = spark.createDataFrame(sym_rows or [(None, None)], "a long, b long")
    if not sym_rows:
        sym = sym.filter(F.col("a").isNotNull())
    sym = sym.localCheckpoint(eager=True)
    hist_sym, frontier = incremental_frontier(sym)
    hist_labels = hash_min_components(cc_seed(hist_sym), hist_sym)
    contracted = contract_frontier(frontier, hist_labels)
    merged = hash_min_components(cc_seed(contracted), contracted)
    is_hist = (F.col("doc_id") % _INC_HIST_MOD) < _INC_HIST_CUT
    base = spark.createDataFrame([(i,) for i in doc_ids], "doc_id long").select(
        "doc_id", is_hist.alias("is_hist")
    )
    noded = base.join(hist_labels, "doc_id", "left").select(
        "doc_id", "is_hist", F.coalesce("cluster_id", "doc_id").alias("node")
    )
    m = merged.select(F.col("doc_id").alias("node"), F.col("cluster_id").alias("_m"))
    final = F.coalesce("_m", "node")
    out = noded.join(m, "node", "left").select(
        "doc_id",
        final.alias("cluster_id"),
        (F.col("is_hist") & (final != F.col("node"))).alias("relabeled"),
    )
    return {r.doc_id: (r.cluster_id, r.relabeled) for r in out.collect()}


# doc_id % 10 < 8 -> history; 8,9,18,19,... -> batch
CASES = {
    "batch_bridges_two_hist_clusters": (
        [0, 1, 2, 3, 8],
        # hist clusters {0,1} and {2,3} are disjoint until batch doc 8
        # connects them: ALL five must land in cluster 0, and 2,3 must
        # read as relabeled (their stored label was 2)
        [(0, 1), (2, 3), (8, 0), (8, 2)],
    ),
    "batch_only_cluster": ([0, 8, 9, 18], [(8, 9), (9, 18)]),
    "untouched_hist_cluster": ([0, 1, 2, 3, 8], [(0, 1), (2, 3), (8, 3)]),
    "batch_joins_one_cluster": ([4, 5, 19], [(4, 5), (19, 5)]),
    "isolated_everything": ([0, 7, 8, 29], []),
    "chain_through_batch_and_hist": (
        [0, 1, 10, 11, 8, 18],
        # 8 links {0,1} to 10; 18 links 11 to the same component
        [(0, 1), (8, 1), (8, 10), (18, 10), (18, 11)],
    ),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_incremental_matches_union_find(spark, case):
    doc_ids, edges = CASES[case]
    got = _incremental_labels(spark, doc_ids, edges)
    want = _union_find(doc_ids, edges)
    assert {i: lab for i, (lab, _) in got.items()} == want
    # relabeled: history docs whose history-only label differs from the
    # union label (batch docs are never flagged)
    hist_edges = [
        (a, b)
        for a, b in edges
        if a % _INC_HIST_MOD < _INC_HIST_CUT and b % _INC_HIST_MOD < _INC_HIST_CUT
    ]
    hist_ids = [i for i in doc_ids if i % _INC_HIST_MOD < _INC_HIST_CUT]
    hist_want = _union_find(hist_ids, hist_edges)
    for i in doc_ids:
        expected = i in hist_want and hist_want[i] != want[i]
        assert got[i][1] == expected, f"{case}: relabeled[{i}]"


def test_incremental_equals_full_rerun(spark, sf_dir):
    """End-to-end parity on the driver corpus: the incremental labels
    must be bit-identical to a full cluster_labels re-run over the
    union graph — the contraction theorem, exercised through the real
    MinHash/LSH front."""
    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.tables import load

    inc = catalog()["q114_incremental_clusters"].fn(spark, sf_dir)
    full = cluster_labels(load(spark, sf_dir, "documents"))
    inc_map = {r.doc_id: r.cluster_id for r in inc.collect()}
    full_map = {r.doc_id: r.cluster_id for r in full.collect()}
    assert inc_map == full_map
    # sanity: the corpus actually has near-dup structure (a vacuous
    # all-singletons pass would not test the merge path)
    assert any(v != k for k, v in full_map.items())


@pytest.mark.parametrize("seed", [7, 23, 41])
def test_iterated_maintenance_matches_full_clustering(spark, seed):
    """The daily-ingestion story: history H absorbs batch A, then the
    grown history absorbs batch B — two rounds of contraction — and
    the composed labels must equal one full clustering of the union
    graph (contraction exactness applied twice). Seeded random graphs;
    pure-Python union-find as the oracle."""
    import random

    rng = random.Random(seed)
    ids = list(range(60))
    h_ids = [i for i in ids if i % 10 < 6]
    a_ids = [i for i in ids if i % 10 in (6, 7)]
    b_ids = [i for i in ids if i % 10 >= 8]
    edges = [
        (a, b)
        for a in ids
        for b in ids
        if a < b and rng.random() < 2.0 / len(ids)
    ]

    def _sym_frame(es):
        rows = [(a, b) for a, b in es] + [(b, a) for a, b in es]
        if not rows:
            df = spark.createDataFrame([(0, 0)], "a long, b long").filter("a > 0")
        else:
            df = spark.createDataFrame(rows, "a long, b long")
        return df.localCheckpoint(eager=True)

    def _labels_frame(label_map):
        rows = [(k, v) for k, v in label_map.items() if k != v]
        if not rows:
            return spark.createDataFrame(
                [(0, 0)], "doc_id long, cluster_id long"
            ).filter("doc_id > 0")
        return spark.createDataFrame(rows, "doc_id long, cluster_id long")

    def _round(prev_labels, arriving, present):
        """Fold `arriving` ids into the clustering of `present` ids."""
        frontier = [
            (a, b) for a, b in edges
            if (a in arriving or b in arriving)
            and (a in present or a in arriving)
            and (b in present or b in arriving)
        ]
        contracted = contract_frontier(_sym_frame(frontier), _labels_frame(prev_labels))
        merged = {
            r.doc_id: r.cluster_id
            for r in hash_min_components(cc_seed(contracted), contracted).collect()
        }
        out = {}
        for v in list(present) + list(arriving):
            node = prev_labels.get(v, v)
            out[v] = merged.get(node, node)
        return out

    hist_edges = [(a, b) for a, b in edges if a in h_ids and b in h_ids]
    labels = _union_find(h_ids, hist_edges)  # the stored history state
    labels = _round(labels, a_ids, h_ids)
    labels = _round(labels, b_ids, h_ids + a_ids)
    want = _union_find(ids, edges)
    assert labels == want, f"seed {seed}"


def test_local_union_find_matches_distributed_loop(spark, sf_dir, monkeypatch):
    """The size-adaptive driver-local branch (round-14 verdict #3) must
    be bit-identical to the distributed Hash-Min loop on the same
    graph: run the real dup graph both ways by forcing the threshold
    (0 = always distributed, huge = always local) and compare label
    maps. Also pins the empty-graph shape both ways."""
    import cometbft_log_etl_spark.queries.neardup as nd
    from cometbft_log_etl_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    sym = nd.dup_edges(docs)
    monkeypatch.setattr(nd, "_CC_LOCAL_MAX_EDGES", 0)
    dist = {
        r.doc_id: r.cluster_id
        for r in nd.hash_min_components(nd.cc_seed(sym), sym).collect()
    }
    monkeypatch.setattr(nd, "_CC_LOCAL_MAX_EDGES", 10**9)
    loc = {
        r.doc_id: r.cluster_id
        for r in nd.hash_min_components(nd.cc_seed(sym), sym).collect()
    }
    assert loc == dist and dist  # identical, and the graph is non-trivial
    # empty graph: both branches return an empty frame with the schema
    empty = sym.filter(F.lit(False)).localCheckpoint(eager=True)
    assert nd.hash_min_components(nd.cc_seed(empty), empty).count() == 0
    monkeypatch.setattr(nd, "_CC_LOCAL_MAX_EDGES", 0)
    assert nd.hash_min_components(nd.cc_seed(empty), empty).count() == 0
