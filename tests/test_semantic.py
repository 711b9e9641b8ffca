"""Ground-truth attestations for the semantic-clustering family
(q17 k-means, q25 SemDeDup): an independent single-process NumPy
implementation of the SAME deterministic algorithm (fixed seeds, 2
Lloyd rounds, 1 mean update, cos-desc/min-id tie-breaks) must agree
with the distributed plans exactly — the same cross-check style the
BPE kernels carry (tests/test_tokenizer.py). The DuckDB oracles
already cross-check cell values; this adds a third, engine-free
implementation of the algorithm itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest


def _np_kmeans(sf_dir: str):
    """NumPy restatement of kmeans_assignments: 2 assignment rounds,
    1 centroid mean update, (cos DESC, cluster_id ASC) tie-break."""
    from cometbft_log_etl_spark.queries.neardup import _KM_K, _KM_SEED_STEP

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id"))
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    # mirror emb_finite_cond: finite, within the EMB_MAX_ABS magnitude
    # bound, AND some QUANTIZED square > 0 (dec12 rounds squares to 12
    # decimals; see _det.py)
    from cometbft_log_etl_spark.queries._det import EMB_MAX_ABS

    finite = (
        np.isfinite(emb).all(axis=1)
        & (np.abs(emb) < EMB_MAX_ABS).all(axis=1)
        & (np.round(emb * emb, 12) > 0).any(axis=1)
    )
    ids, emb = ids[finite], emb[finite]
    order = np.argsort(ids)
    ids, emb = ids[order], emb[order]
    nrm = np.sqrt((emb * emb).sum(axis=1))

    seed_ids = ids[(ids % _KM_SEED_STEP) == 0][:_KM_K]
    seed_idx = np.searchsorted(ids, seed_ids)

    def assign(cents, cent_ids, cnrm):
        cos = (emb @ cents.T) / (nrm[:, None] * cnrm[None, :])
        # argmax with (cos DESC, cluster_id ASC): ids ascend with the
        # column index, and np.argmax takes the FIRST max — exactly the
        # lowest-cluster_id winner on ties.
        best = np.argmax(cos, axis=1)
        return cent_ids[best], cos[np.arange(len(emb)), best], best

    c1, c1_ids = emb[seed_idx], seed_ids
    a1_cid, _, a1_col = assign(c1, c1_ids, nrm[seed_idx])
    cents2, cent2_ids = [], []
    for cid in c1_ids:
        members = emb[a1_cid == cid]
        if len(members):
            # round-to-9 mirrors the engine's quotient-cast rule
            c = np.round(members.sum(axis=0) / len(members), 9)
            # mirror the degenerate-centroid guard: a mean whose
            # quantized squares are all 0 is dropped, not divided by
            if (np.round(c * c, 12) > 0).any():
                cents2.append(c)
                cent2_ids.append(cid)
    cents2 = np.array(cents2)
    cent2_ids = np.array(cent2_ids)
    cnrm2 = np.sqrt((cents2 * cents2).sum(axis=1))
    a2_cid, a2_cos, _ = assign(cents2, cent2_ids, cnrm2)
    return ids, emb, nrm, a2_cid, a2_cos


def test_q17_kmeans_matches_numpy_reference(spark, sf_dir):
    from cometbft_log_etl_spark.queries.neardup import kmeans_assignments

    ids, _, _, a2_cid, a2_cos = _np_kmeans(sf_dir)
    got = {
        r["vec_id"]: (r["cluster_id"], r["cos"])
        for r in kmeans_assignments(spark, sf_dir).collect()
    }
    assert set(got) == set(ids.tolist())
    for i, vid in enumerate(ids.tolist()):
        cid, cos = got[vid]
        assert cid == a2_cid[i], f"vec {vid}: cluster {cid} != numpy {a2_cid[i]}"
        # decimal folds vs float64 dot: identical to ~1e-12
        assert abs(cos - a2_cos[i]) < 1e-9, f"vec {vid}: cos drift"


def test_q17_clusters_partition_the_corpus(spark, sf_dir):
    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.queries.neardup import _KM_K, _KM_SEED_STEP

    rows = catalog()["q17_semantic_kmeans"].fn(spark, sf_dir).collect()
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id"))
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    n_screened = int(
        (np.isfinite(emb).all(axis=1) & (np.round(emb * emb, 12) > 0).any(axis=1)).sum()
    )
    assert sum(r["n_members"] for r in rows) == n_screened
    seed_ids = set(np.sort(ids[(ids % _KM_SEED_STEP) == 0])[:_KM_K].tolist())
    assert all(r["cluster_id"] in seed_ids for r in rows)


def test_q25_semdedup_matches_numpy_reference(spark, sf_dir):
    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.queries.neardup import _KM_DUP_COS, _KM_MEMBER_CAP

    ids, emb, nrm, a2_cid, _ = _np_kmeans(sf_dir)
    # reference decision: within cluster (capped by cos-desc/min-id
    # rank), b dropped in favor of min lower-id partner with cos >= tau
    dup_of = {}
    for cid in np.unique(a2_cid):
        m = np.where(a2_cid == cid)[0]
        if len(m) > _KM_MEMBER_CAP:
            pytest.skip("corpus exceeds member cap; reference needs rank logic")
        for bi in m:
            cands = [
                ai
                for ai in m
                if ids[ai] < ids[bi]
                and (emb[ai] @ emb[bi]) / (nrm[ai] * nrm[bi]) >= _KM_DUP_COS
            ]
            if cands:
                dup_of[ids[bi]] = min(ids[ai] for ai in cands)
    rows = catalog()["q25_semantic_dedup"].fn(spark, sf_dir).collect()
    assert len(rows) == len(ids)
    for r in rows:
        want = dup_of.get(r["vec_id"])
        assert r["dup_of"] == want, f"vec {r['vec_id']}: {r['dup_of']} != {want}"
        assert r["is_kept"] == (want is None)
        if want is not None:
            assert want < r["vec_id"]


def test_q09_boilerplate_invariants(spark, sf_dir):
    from cometbft_log_etl_spark.queries import catalog

    rows = catalog()["q09_boilerplate_ngrams"].fn(spark, sf_dir).collect()
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    assert len(rows) == t.num_rows  # every document gets a verdict
    for r in rows:
        assert 0 <= r["n_boiler"] <= r["n_grams"]
        if r["n_grams"] == 0:
            assert r["boiler_frac"] == 0.0 and not r["is_flagged"]
        else:
            assert abs(r["boiler_frac"] - r["n_boiler"] / r["n_grams"]) < 1e-9
    # a boilerplate gram is shared: total boiler hits across docs of a
    # source must come in groups >= 2 (the _BP_MIN_DOCS floor)
    assert any(r["n_boiler"] > 0 for r in rows)  # non-trivial on testdata


def test_q12_audit_fires_on_poisoned_corpus(spark, sf_dir, tmp_path_factory):
    """The constraint audit must report violations when they exist —
    an all-zero report on poisoned input would mean dead checks."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from cometbft_log_etl_spark.queries import catalog

    out = tmp_path_factory.mktemp("poisoned-audit-sf")
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        head = pq.read_table(os.path.join(sf_dir, f"{t}.parquet")).slice(0, 8)
        if t == "orders":
            # orphan an order's custkey + null a totalprice
            cols = {f.name: head.column(f.name).to_pylist() for f in head.schema}
            cols["o_custkey"][0] = 10**12
            cols["o_totalprice"][1] = None
            cols["o_totalprice"][2] = -5.0
            head = pa.Table.from_pydict(cols, schema=head.schema)
        if t == "embeddings":
            cols = {f.name: head.column(f.name).to_pylist() for f in head.schema}
            cols["embedding"][0] = [float("nan")] + cols["embedding"][0][1:]
            cols["vec_id"][2] = cols["vec_id"][1]  # duplicate id
            head = pa.Table.from_pydict(cols, schema=head.schema)
        if t == "documents":
            cols = {f.name: head.column(f.name).to_pylist() for f in head.schema}
            cols["doc_id"][3] = cols["doc_id"][2]  # duplicate id
            head = pa.Table.from_pydict(cols, schema=head.schema)
        if t == "customer":
            cols = {f.name: head.column(f.name).to_pylist() for f in head.schema}
            cols["c_custkey"][1] = cols["c_custkey"][0]  # duplicate pk
            head = pa.Table.from_pydict(cols, schema=head.schema)
        pq.write_table(head, str(out / f"{t}.parquet"))

    rows = {
        r["check_name"]: r
        for r in catalog()["q12_data_quality_audit"].fn(spark, str(out)).collect()
    }
    assert rows["orders_custkey_fk"]["n_violations"] >= 1
    assert rows["orders_totalprice_complete"]["n_violations"] == 1
    assert rows["orders_totalprice_positive"]["n_violations"] == 1
    assert rows["embeddings_finite"]["n_violations"] == 1
    assert rows["customer_custkey_unique"]["n_violations"] == 1
    # id-keyed similarity queries REQUIRE unique doc_id/vec_id — the
    # audit is the gate that catches violations before they run
    assert rows["documents_docid_unique"]["n_violations"] == 1
    assert rows["embeddings_vecid_unique"]["n_violations"] == 1
    # lineitem rows reference the 8-order slice; orphans are expected
    assert rows["lineitem_orderkey_fk"]["n_checked"] == 8


def _variant_sf_dir(sf_dir, tmp_path_factory, name: str, vectors: list[list[float]]):
    """A full variant corpus dir (8-row slices of every table) whose
    embeddings are replaced by `vectors` at vec_ids 0..n-1 — so only
    vec_id 0 is a seed candidate (one cluster) and the round-2 centroid
    is fully under the test's control."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp(name)
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents",
    ):
        head = pq.read_table(os.path.join(sf_dir, f"{t}.parquet")).slice(0, 8)
        pq.write_table(head, str(out / f"{t}.parquet"))
    schema = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).schema
    emb = pa.Table.from_pydict(
        {
            "vec_id": list(range(len(vectors))),
            "embedding": vectors,
            "label": [0] * len(vectors),
        },
        schema=pa.schema([schema.field(n) for n in ("vec_id", "embedding", "label")]),
    )
    pq.write_table(emb, str(out / "embeddings.parquet"))
    return str(out)


@pytest.mark.parametrize(
    "vectors",
    [
        # exact cancellation: members sum to the zero vector
        [[1.0, 0.0], [-0.5, 0.9], [-0.5, -0.9]],
        # quantized-tiny cancellation: the mean's components survive as
        # ~1e-11 doubles but round-to-9 + dec12 squares make the
        # centroid norm 0 — the round-8-advice job-killer path
        [[1.0, 0.0], [-0.5, 3e-10], [-0.5, -4e-10]],
    ],
    ids=["exact-zero-mean", "quantized-tiny-mean"],
)
def test_degenerate_centroid_is_dropped_not_divided(
    spark, sf_dir, tmp_path_factory, vectors
):
    """A cluster mean whose quantized squares are all 0 must be DROPPED
    by _km_update_centroids (and the oracle's cnorm2 HAVING), never
    divided by: before the round-9 guard this corpus killed the job
    with ANSI DIVIDE_BY_ZERO. One seed (vec 0) → every vector joins
    that cluster → the round-2 mean cancels to (quantized) zero → the
    only centroid is dropped → round 2 assigns nothing: both engines
    return EMPTY, cell-exactly."""
    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.testing.compare import run_compare

    vdir = _variant_sf_dir(sf_dir, tmp_path_factory, "degen-centroid-sf", vectors)
    for qname in ("q17_semantic_kmeans", "q25_semantic_dedup"):
        res = run_compare(spark, catalog()[qname], vdir)
        assert res.ok, str(res)
        assert res.spark_rows == 0 and res.oracle_rows == 0


def test_surviving_centroid_absorbs_degenerate_clusters_members(
    spark, sf_dir, tmp_path_factory
):
    """Two seeds (vec 0, vec 23); cluster 0's mean cancels to zero while
    cluster 23 survives — round 2 must reassign EVERY vector to the
    survivor, matching the oracle's inner-join semantics."""
    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.testing.compare import run_compare

    # Seed 0 is tiny-but-valid ([1e-6,0,0]: its own quantized square
    # 1e-12 passes the input screen). Members 1, 2 are orthogonal to
    # BOTH seeds — the cosine tie breaks to the lower cluster id, so
    # cluster 0 = {0, 1, 2} with mean [3.3e-7, 0, 0], whose quantized
    # square (1.1e-13) rounds to 0 at 12 decimals: degenerate. Seed 23
    # keeps itself: mean [0, 1, 0] survives. Round 2 must assign all
    # FOUR vectors to cluster 23.
    vectors = {
        0: [1e-6, 0.0, 0.0],
        1: [0.0, 0.0, 1.0],
        2: [0.0, 0.0, -1.0],
        23: [0.0, 1.0, 0.0],
    }
    vdir = _variant_sf_dir_with_ids(sf_dir, tmp_path_factory, vectors)
    res = run_compare(spark, catalog()["q17_semantic_kmeans"], vdir)
    assert res.ok, str(res)
    rows = catalog()["q17_semantic_kmeans"].fn(spark, vdir).collect()
    assert [(r.cluster_id, r.n_members) for r in rows] == [(23, 4)]


def _variant_sf_dir_with_ids(sf_dir, tmp_path_factory, id_to_vec: dict):
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("degen-centroid-two-seed-sf")
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents",
    ):
        head = pq.read_table(os.path.join(sf_dir, f"{t}.parquet")).slice(0, 8)
        pq.write_table(head, str(out / f"{t}.parquet"))
    schema = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).schema
    ids = sorted(id_to_vec)
    emb = pa.Table.from_pydict(
        {"vec_id": ids, "embedding": [id_to_vec[i] for i in ids], "label": [0] * len(ids)},
        schema=pa.schema([schema.field(n) for n in ("vec_id", "embedding", "label")]),
    )
    pq.write_table(emb, str(out / "embeddings.parquet"))
    return str(out)


def test_oversized_component_is_screened_not_fatal(
    spark, sf_dir, tmp_path_factory
):
    """A finite component with |x| >= EMB_MAX_ABS would overflow the
    screen's own DECIMAL(28,12) square under ANSI — the round-9
    magnitude bound screens the vector instead, identically in both
    engines (the fourth garbage class next to NaN/Inf/zero-norm)."""
    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.queries.neardup import kmeans_assignments
    from cometbft_log_etl_spark.testing.compare import run_compare

    vectors = {
        0: [1.0, 0.5],
        1: [1e9, 1.0],  # oversized — must vanish, not CAST_OVERFLOW
        2: [0.5, 1.0],
    }
    vdir = _variant_sf_dir_with_ids(sf_dir, tmp_path_factory, vectors)
    res = run_compare(spark, catalog()["q17_semantic_kmeans"], vdir)
    assert res.ok, str(res)
    assigned = {r.vec_id for r in kmeans_assignments(spark, vdir).collect()}
    assert assigned == {0, 2}


def test_sum_of_squares_overflow_is_screened_not_fatal(
    spark, sf_dir, tmp_path_factory
):
    """The fold-accumulator surface (round-9 review find): components
    whose SQUARES each fit DECIMAL(28,12) but whose SUM overflows it
    ([8e7, 8e7] → 1.28e16) killed the Spark norm fold under ANSI while
    DuckDB's widening sum succeeded — a job-killer and an engine
    divergence at once. EMB_MAX_ABS bounds the sum for any dimension;
    such vectors screen out identically in both engines."""
    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.queries.neardup import kmeans_assignments
    from cometbft_log_etl_spark.testing.compare import run_compare

    vectors = {
        0: [1.0, 0.5],
        1: [8e7, 8e7],  # per-term squares fit; their sum does not
        2: [0.5, 1.0],
    }
    vdir = _variant_sf_dir_with_ids(sf_dir, tmp_path_factory, vectors)
    for qname in ("q17_semantic_kmeans", "q27_embedding_stats"):
        res = run_compare(spark, catalog()[qname], vdir)
        assert res.ok, str(res)
    assigned = {r.vec_id for r in kmeans_assignments(spark, vdir).collect()}
    assert assigned == {0, 2}
