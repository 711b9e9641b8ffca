"""q134 semantic refit-transition report (the q116 pattern at the MODEL
level: old stored model vs full refit, assignment + decision diff).

Three independent checks:

- the bounded-pair-scan exactness claim, Spark vs Spark: q134 (whose
  pair tiers run behind the changed-or-over-cap broadcast semi-join)
  must equal an UNRESTRICTED diff composed here from the same building
  blocks (full decisions over every cluster on both sides);
- an engineered transition corpus: a batch-only direction earns its own
  seed under the refit — its vectors must appear as reassignments with
  the predicted actions ('reinstate' for the new cluster's
  representative, 'move' for its duplicates), the untouched cluster
  must contribute zero rows, and stable-decision members of the shrunk
  cluster must stay out of the report;
- cross-query consistency with q120: q134's old-model decision columns
  (dup_of_old) must agree with q120's post-maintenance state (dup_of)
  on every reported vector in a batch-touched cluster — the stored
  model q134 diffs FROM is exactly the state q120's maintenance left
  behind.

The DuckDB oracle cross-check (full unrestricted decision tiers as
CTEs — itself a second proof the bounding is lossless) runs in the
driver window / check_correctness.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from pyspark.sql import functions as F


def _models(spark, sf_dir):
    """(old_assign, new_assign) under the stored and refit models —
    rebuilt from the shared building blocks so the parity test composes
    the unrestricted diff itself."""
    from cometbft_log_etl_spark.queries._det import dnrm12, finite_embeddings
    from cometbft_log_etl_spark.queries.neardup import (
        _inc_is_hist,
        _km_assign_round,
        _km_seed_centroids,
        _km_update_centroids,
    )
    from cometbft_log_etl_spark.session import default_parallelism
    from cometbft_log_etl_spark.tables import load

    emb = (
        finite_embeddings(load(spark, sf_dir, "embeddings"))
        .repartition(default_parallelism())
        .select(
            "vec_id",
            F.col("embedding").alias("emb"),
            dnrm12(F.col("embedding")).alias("nrm"),
        )
    )
    hist = emb.filter(_inc_is_hist(F.col("vec_id")))
    stored = _km_update_centroids(_km_assign_round(hist, _km_seed_centroids(hist)))
    old_assign = _km_assign_round(emb, stored)
    a1 = _km_assign_round(emb, _km_seed_centroids(emb))
    new_assign = _km_assign_round(
        a1.select("vec_id", "emb", "nrm"), _km_update_centroids(a1)
    )
    return old_assign, new_assign


def test_refit_equals_unrestricted_diff(spark, sf_dir):
    """The scan-set bound is lossless: q134 == the diff built from FULL
    (unrestricted) decision tiers on both sides."""
    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.queries.neardup import _semdedup_dups

    old_assign, new_assign = _models(spark, sf_dir)
    old_assign, new_assign = old_assign.cache(), new_assign.cache()
    try:
        old_c = {r.vec_id: r.cluster_id for r in old_assign.collect()}
        new_c = {r.vec_id: r.cluster_id for r in new_assign.collect()}
        dup_old = {r.vec_id: r.dup_of for r in _semdedup_dups(old_assign).collect()}
        dup_new = {r.vec_id: r.dup_of for r in _semdedup_dups(new_assign).collect()}
        want = {
            v: (old_c[v], new_c[v], dup_old.get(v), dup_new.get(v))
            for v in old_c
            if old_c[v] != new_c[v]
            or (v in dup_old) != (v in dup_new)
        }
        got = {
            r.vec_id: r
            for r in catalog()["q134_semantic_refit"].fn(spark, sf_dir).collect()
        }
        assert set(got) == set(want), (
            set(got) ^ set(want)
        )
        assert want, "driver corpus exercises no replay row — fixture too weak"
        saw_flip = False
        for v, (co, cn, do, dn) in want.items():
            r = got[v]
            assert (r.cluster_old, r.cluster_new) == (co, cn)
            assert r.reassigned == (co != cn)
            assert r.dup_of_old == do and r.dup_of_new == dn
            assert r.was_kept == (do is None) and r.is_kept == (dn is None)
            if r.was_kept != r.is_kept:
                saw_flip = True
                assert r.action == ("prune" if r.was_kept else "reinstate")
            else:
                assert r.action == "move" and r.reassigned
        assert saw_flip, "driver corpus exercises no decision flip"
    finally:
        old_assign.unpersist()
        new_assign.unpersist()


def test_refit_engineered_transition(spark, sf_dir, tmp_path_factory):
    """A batch-only direction C earns its own seed under the refit
    (69 % 23 == 0 but 69 % 10 == 9, so the history fit never saw it as
    a seed): C's members leave cluster B, the C representative is
    reinstated, its near-duplicates re-point, cluster A (untouched,
    under cap) contributes zero rows, and B's surviving members (same
    decision, same cluster) stay out of the report."""
    import os

    import pyarrow as pa

    from cometbft_log_etl_spark.queries import catalog

    id_to_vec = {
        0: [1.0, 0.0],      # dir A seed (history; 0 % 23 == 0)
        1: [0.999, 0.01],   # dir A history dup of 0
        23: [0.0, 1.0],     # dir B seed (history; 23 % 23 == 0)
        24: [0.01, 0.999],  # dir B history dup of 23
        69: [0.6, 0.8],     # dir C BATCH (69 % 10 == 9) — refit seed
        78: [0.606, 0.795], # dir C BATCH dup of 69
        79: [0.594, 0.804], # dir C BATCH dup of 69
    }
    out = tmp_path_factory.mktemp("refit-sf")
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents",
    ):
        head = pq.read_table(os.path.join(sf_dir, f"{t}.parquet")).slice(0, 8)
        pq.write_table(head, str(out / f"{t}.parquet"))
    schema = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).schema
    ids = sorted(id_to_vec)
    emb = pa.Table.from_pydict(
        {
            "vec_id": ids,
            "embedding": [id_to_vec[i] for i in ids],
            "label": [0] * len(ids),
        },
        schema=pa.schema([schema.field(n) for n in ("vec_id", "embedding", "label")]),
    )
    pq.write_table(emb, str(out / "embeddings.parquet"))

    rows = catalog()["q134_semantic_refit"].fn(spark, str(out)).collect()
    by_id = {r.vec_id: r for r in rows}
    # only the C movers are replay rows: A is untouched; 23/24 keep
    # their cluster and their decision (24 stays a dup of 23)
    assert set(by_id) == {69, 78, 79}, set(by_id)
    for v in (69, 78, 79):
        r = by_id[v]
        assert r.reassigned and r.cluster_old == 23 and r.cluster_new == 69
    # old model: every C vector was a dup of 23 (cos to the B members
    # ~0.8 >= 0.38); refit: 69 is C's min-id representative
    assert by_id[69].dup_of_old == 23 and by_id[69].dup_of_new is None
    assert by_id[69].action == "reinstate" and by_id[69].is_kept
    for v in (78, 79):
        assert by_id[v].dup_of_old == 23 and by_id[v].dup_of_new == 69
        assert by_id[v].action == "move"
        assert by_id[v].was_kept is False and by_id[v].is_kept is False


def test_refit_old_model_agrees_with_q120_state(spark, sf_dir):
    """The model q134 diffs FROM is the state q120's maintenance
    produced: on every reported vector whose old cluster is
    batch-touched, dup_of_old must equal q120's dup_of."""
    from cometbft_log_etl_spark.queries import catalog

    q120 = {
        r.vec_id: r
        for r in catalog()["q120_incremental_semdedup"].fn(spark, sf_dir).collect()
    }
    rows = catalog()["q134_semantic_refit"].fn(spark, sf_dir).collect()
    checked = 0
    for r in rows:
        if r.vec_id in q120 and q120[r.vec_id].cluster_id == r.cluster_old:
            checked += 1
            assert r.dup_of_old == q120[r.vec_id].dup_of
            assert r.was_kept == q120[r.vec_id].is_kept
    assert checked, "no reported vector sits in a batch-touched cluster"
