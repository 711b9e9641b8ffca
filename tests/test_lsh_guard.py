"""Degenerate-bucket guard: a boilerplate corpus of identical documents
must produce a BOUNDED pair count (C(cap, 2), not C(n, 2)) through the
LSH banding tier, and the cap must keep the deterministic lowest-id
members so the DuckDB oracles can mirror it."""

from __future__ import annotations

from pyspark.sql import functions as F

from cometbft_log_etl_spark.queries.neardup import (
    _BANDS,
    _BUCKET_CAP,
    _minhash_sigs,
    lsh_band_pairs,
)

N_DOCS = 1000
_TEXT = "the same boilerplate sentence repeated across every document in the corpus"


def _identical_docs(spark):
    return spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"), F.lit(_TEXT).alias("text")
    )


def test_identical_corpus_pair_count_is_capped(spark):
    sigs = _minhash_sigs(_identical_docs(spark))
    pairs = lsh_band_pairs(sigs).cache()
    try:
        n_pairs = pairs.count()
        # identical docs → identical sigs → every band collides; the cap
        # keeps doc_ids 0..cap-1, so exactly C(cap, 2) distinct pairs,
        # each seen in all bands — NOT C(1000, 2) = 499500.
        assert n_pairs == _BUCKET_CAP * (_BUCKET_CAP - 1) // 2
        assert pairs.agg(F.min("n_shared_bands")).first()[0] == _BANDS
        assert pairs.agg(F.max(F.greatest("doc_a", "doc_b"))).first()[0] == _BUCKET_CAP - 1
    finally:
        pairs.unpersist()


def test_cap_keeps_lowest_ids_deterministically(spark):
    sigs = _minhash_sigs(_identical_docs(spark))
    kept = (
        lsh_band_pairs(sigs, cap=8)
        .select(F.explode(F.array("doc_a", "doc_b")).alias("d"))
        .distinct()
    )
    assert sorted(r.d for r in kept.collect()) == list(range(8))


def test_hash_min_components_converges_on_path_graph(spark, monkeypatch):
    import pytest

    import cometbft_log_etl_spark.queries.neardup as nd
    from cometbft_log_etl_spark.queries.neardup import hash_min_components

    # Path graph 0-1-...-199: worst case for min-label propagation
    # (diameter 199 > the default 30-iteration bound — propagate-only
    # Hash-Min moves a label ONE hop per iteration and would trip the
    # backstop on this legitimate input). The pointer-jump step makes
    # convergence logarithmic in diameter, so the default bound holds
    # with two orders of magnitude to spare. Forced onto the
    # DISTRIBUTED path — the round-15 driver-local branch would solve
    # this sub-threshold graph without iterating (its exactness has
    # its own parity test in test_incremental_clusters.py); this test
    # pins the loop's convergence and its backstop.
    monkeypatch.setattr(nd, "_CC_LOCAL_MAX_EDGES", 0)
    n = 200
    edges = spark.range(n - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = spark.range(n).select(
        F.col("id").alias("doc_id"), F.col("id").alias("cluster_id")
    )
    out = hash_min_components(labels, sym, max_iters=30).collect()
    assert {r.cluster_id for r in out} == {0}
    assert len(out) == n

    # The bound is a hard backstop on the distributed path: too few
    # iterations fails LOUD instead of returning half-propagated
    # labels. (The local branch computes exact components regardless
    # of diameter, so the bound never applies below the threshold.)
    with pytest.raises(RuntimeError, match="no fixpoint"):
        hash_min_components(labels, sym, max_iters=2)


def test_hash_min_components_keeps_stdout_clean(spark, capsys):
    """The convergence note must go to stderr, never stdout: bench.py's
    driver contract is ONE JSON line on stdout, and q37 (which runs this
    loop) is in the timed headline set — a stdout print there corrupts
    the recorded BENCH artifact."""
    from cometbft_log_etl_spark.queries.neardup import hash_min_components

    edges = spark.createDataFrame([(0, 1)], "a long, b long")
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = spark.range(2).select(
        F.col("id").alias("doc_id"), F.col("id").alias("cluster_id")
    )
    hash_min_components(labels, sym, max_iters=5).collect()
    captured = capsys.readouterr()
    assert captured.out == ""
    # either branch (local union-find below the threshold, loop above)
    # must note itself on stderr only
    assert "local union-find" in captured.err or "converged" in captured.err


def test_hash_min_components_matches_union_find_on_random_graphs(spark):
    """Cross-check the distributed CC (propagate + gated pointer-jump)
    against an independent single-process union-find on random graphs —
    including sparse ones whose long chains exercise the jump branch."""
    import random

    from cometbft_log_etl_spark.queries.neardup import hash_min_components

    for seed, n, m in [(1, 40, 15), (2, 60, 30), (3, 80, 200), (4, 50, 8)]:
        rng = random.Random(seed)
        edge_list = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        # chain a long path into seed 4's graph so the jump branch runs
        if seed == 4:
            edge_list += [(i, i + 1) for i in range(5, n - 1)]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edge_list:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # expected label = min node id of each component
        comp_min = {}
        for v in range(n):
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        expected = {v: comp_min[find(v)] for v in range(n)}

        edges = spark.createDataFrame(
            [(a, b) for a, b in edge_list if a != b] or [(0, 0)], "a long, b long"
        )
        sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        labels = spark.range(n).select(
            F.col("id").alias("doc_id"), F.col("id").alias("cluster_id")
        )
        got = {
            r.doc_id: r.cluster_id
            for r in hash_min_components(labels, sym).collect()
        }
        assert got == expected, f"seed {seed}: CC labels diverge from union-find"


def test_identical_corpus_substring_runs_are_capped(spark):
    """The exact-substring tier's degenerate bound: N identical documents
    share EVERY gram, but the per-gram occurrence cap keeps only the
    _SUB_CAP lowest (doc_id, p) rows, so the run output is exactly one
    full-length maximal run per pair of the first _SUB_CAP docs —
    C(cap, 2) rows, independent of N."""
    from cometbft_log_etl_spark.queries.datapipe import (
        _SUB_CAP,
        _SUB_K,
        exact_substring_runs,
    )

    runs = exact_substring_runs(_identical_docs(spark)).cache()
    try:
        n_tokens = len(_TEXT.split(" "))
        rows = runs.collect()
        assert len(rows) == _SUB_CAP * (_SUB_CAP - 1) // 2
        # every run is the whole document, aligned at 0, between two
        # of the first cap doc ids
        assert all(
            r.run_tokens == n_tokens and r.start_a == 0 and r.start_b == 0
            for r in rows
        )
        assert all(r.doc_a < r.doc_b < _SUB_CAP for r in rows)
        assert n_tokens >= _SUB_K  # fixture long enough to gram
    finally:
        runs.unpersist()


def test_substring_scrub_invariants(spark, sf_dir):
    """Scrub semantics on the real corpus: the lower doc_id of every
    pair keeps its copy (only doc_b spans are cut), counts reconcile
    with the run table, and a fully-duplicated doc scrubs to ''."""
    from cometbft_log_etl_spark.queries import catalog

    out = {r.doc_id: r for r in catalog()["q46_substring_scrub"].fn(spark, sf_dir).collect()}
    runs = catalog()["q45_exact_substring_runs"].fn(spark, sf_dir).collect()
    scrubbed_docs = {r.doc_b for r in runs}
    only_a_docs = {r.doc_a for r in runs} - scrubbed_docs
    # every doc that is only ever the LOWER id of a pair is untouched
    assert all(out[d].n_removed == 0 for d in only_a_docs if d in out)
    # every doc_b lost at least one token; removal never exceeds length
    assert all(
        0 < out[d].n_removed <= out[d].n_tokens for d in scrubbed_docs if d in out
    )
    # cleaned text token count == n_tokens - n_removed (reconstruction
    # is exactly the kept tokens)
    for r in out.values():
        n_clean = len([t for t in r.cleaned_text.split(" ") if t]) if r.cleaned_text else 0
        assert n_clean == r.n_tokens - r.n_removed


def test_q47_parity_with_duplicate_batch_doc_id(spark, sf_dir, tmp_path_factory):
    """A duplicated doc_id in the BATCH slice must stay cell-exact:
    both engines count that id's grams once per ROW (per-row
    list_distinct / array_distinct — round-9 review find: a cross-row
    DISTINCT in the oracle silently collapsed what Spark kept)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.testing.compare import run_compare

    out = tmp_path_factory.mktemp("q47-dup-batch-id")
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "embeddings",
    ):
        head = pq.read_table(os.path.join(sf_dir, f"{t}.parquet")).slice(0, 4)
        pq.write_table(head, str(out / f"{t}.parquet"))
    d = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    ids = d.column("doc_id").to_pylist()
    batch_pos = next(i for i, v in enumerate(ids) if v % 10 >= 8)
    dup = pa.concat_tables([d, d.slice(batch_pos, 1)])
    pq.write_table(dup, str(out / "documents.parquet"))
    res = run_compare(spark, catalog()["q47_substring_containment"], str(out))
    assert res.ok, str(res)


def test_selfrepetitive_corpus_runs_are_capped(spark):
    """The intra-doc tier's degenerate bound: a document that repeats
    one token M times has a SINGLE gram at every position, but the
    per-(doc, gram) cap keeps only the first _SUB_CAP positions — so
    the run output is exactly one maximal run per nonzero diagonal of
    the capped position set, (_SUB_CAP - 1) rows per doc, independent
    of M."""
    from cometbft_log_etl_spark.queries.datapipe import (
        _SELF_K,
        _SUB_CAP,
        selfrep_runs,
    )

    n_docs, m = 20, 300
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.lit(" ".join(["spam"] * m)).alias("text")
    )
    rows = selfrep_runs(docs).collect()
    assert len(rows) == n_docs * (_SUB_CAP - 1)
    for r in rows:
        d = r.start_b - r.start_a
        # diagonal d's island spans the capped positions 0.._SUB_CAP-1-d
        assert r.start_a == 0 and 1 <= d < _SUB_CAP
        assert r.run_tokens == (_SUB_CAP - d) + _SELF_K - 1


def test_selfrep_scrub_periodic_docs(spark):
    """Engineered stutter semantics: a perfectly periodic document
    scrubs down to its first period (the FIRST occurrence stays, every
    later copy's span is cut); a repeat-free doc is untouched."""
    from cometbft_log_etl_spark.queries.datapipe import selfrep_scrub

    docs = spark.createDataFrame(
        [
            (0, "a b c a b c a b c"),
            (1, "x x x x x"),
            (2, "no internal repeats in this document at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in selfrep_scrub(docs).collect()}
    assert out[0].cleaned_text == "a b c" and out[0].n_removed == 6
    assert out[1].cleaned_text == "x" and out[1].n_removed == 4
    assert out[2].n_removed == 0
    assert out[2].cleaned_text == "no internal repeats in this document at all"


def test_selfrep_scrub_invariants(spark, sf_dir):
    """Scrub semantics on the real corpus: only docs with detected
    self-runs lose tokens, removal never exceeds length, and the
    cleaned text is exactly the kept tokens."""
    from cometbft_log_etl_spark.queries import catalog

    out = {r.doc_id: r for r in catalog()["q66_selfrep_scrub"].fn(spark, sf_dir).collect()}
    runs = catalog()["q63_selfrep_runs"].fn(spark, sf_dir).collect()
    rep_docs = {r.doc_id for r in runs}
    assert all(out[d].n_removed == 0 for d in set(out) - rep_docs)
    assert all(0 < out[d].n_removed <= out[d].n_tokens for d in rep_docs if d in out)
    for r in out.values():
        n_clean = len([t for t in r.cleaned_text.split(" ") if t]) if r.cleaned_text else 0
        assert n_clean == r.n_tokens - r.n_removed


def test_selfrep_parity_with_duplicate_doc_id(spark, sf_dir, tmp_path_factory):
    """A duplicated (doc_id, text) row must stay cell-exact for the
    RUN half of the intra-doc tier: the merged position multiset
    expands to the same pair multiset in both engines ONLY because the
    strict d > 0 filter drops the in-array expansion's
    position-paired-with-its-own-copy rows that the oracle's
    b.p > a.p join never produces. The SCRUB half (q103) diverges by
    construction — per-row output where the oracle's final GROUP BY
    collapses the duplicate — joining the documented id-uniqueness
    contract family exactly as q46 did (pinned in
    test_duplicate_id_divergence_family)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.testing.compare import run_compare

    out = tmp_path_factory.mktemp("selfrep-dup-id")
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "embeddings",
    ):
        head = pq.read_table(os.path.join(sf_dir, f"{t}.parquet")).slice(0, 4)
        pq.write_table(head, str(out / f"{t}.parquet"))
    d = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    dup = pa.concat_tables([d, d.slice(0, 1)])
    pq.write_table(dup, str(out / "documents.parquet"))
    res = run_compare(spark, catalog()["q63_selfrep_runs"], str(out))
    assert res.ok, f"q63_selfrep_runs: {res}"


def test_identical_corpus_duplicated_spans_stay_linear(spark):
    """The UNCAPPED tier's degenerate bound (q119): N identical docs
    share every gram, but the output is one full-length span PER DOC —
    linear in the corpus — because duplication needs only the per-gram
    COUNT, never the occurrence list or a pair expansion. This is the
    boilerplate corpus that would go quadratic if anyone 'optimized'
    the count into a pair tier."""
    from cometbft_log_etl_spark.queries.datapipe import _SUB_K, duplicated_spans

    spans = duplicated_spans(_identical_docs(spark)).cache()
    try:
        n_tokens = len(_TEXT.split(" "))
        rows = spans.collect()
        assert len(rows) == N_DOCS  # one maximal span per doc, not C(N,2)
        assert all(
            r.span_start == 0
            and r.span_tokens == n_tokens
            and r.n_dup_grams == n_tokens - _SUB_K + 1
            for r in rows
        )
        assert sorted(r.doc_id for r in rows) == list(range(N_DOCS))
    finally:
        spans.unpersist()


def test_duplicated_spans_python_recount(spark, sf_dir):
    """q119 vs an independent pure-Python recount on the driver corpus:
    md5 gram counting, gap>k islanding, maximal spans — the whole
    semantics re-derived outside both engines."""
    import hashlib
    from collections import Counter

    import pyarrow.parquet as pq

    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.queries.datapipe import _SUB_K

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    grams: Counter = Counter()
    pos: dict = {}
    for d, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        toks = [x for x in txt.split(" ") if x != ""]
        pos[d] = []
        for p in range(len(toks) - _SUB_K + 1):
            g = hashlib.md5(" ".join(toks[p : p + _SUB_K]).encode()).hexdigest()
            grams[g] += 1
            pos[d].append((p, g))
    want = []
    for d, pl in pos.items():
        dup = [p for p, g in pl if grams[g] >= 2]
        if not dup:
            continue
        start = prev = dup[0]
        n = 1
        for p in dup[1:]:
            if p - prev > _SUB_K:
                want.append((d, start, prev + _SUB_K - start, n))
                start, n = p, 0
            prev = p
            n += 1
        want.append((d, start, prev + _SUB_K - start, n))
    got = [
        (r.doc_id, r.span_start, r.span_tokens, r.n_dup_grams)
        for r in catalog()["q119_duplicated_spans"].fn(spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(want)
    assert want, "driver corpus has no duplicated span — fixture too weak"


def test_duplicated_spans_cover_capped_runs(spark, sf_dir):
    """Cross-tier consistency: every q45 pair run (defined over the
    CAPPED occurrence set — a subset of all duplicated positions) must
    lie inside one q119 span of each participating doc; run positions
    are consecutive, so gap<=k islanding can never split them."""
    from cometbft_log_etl_spark.queries import catalog

    spans: dict = {}
    for r in catalog()["q119_duplicated_spans"].fn(spark, sf_dir).collect():
        spans.setdefault(r.doc_id, []).append((r.span_start, r.span_tokens))
    runs = catalog()["q45_exact_substring_runs"].fn(spark, sf_dir).collect()
    assert runs, "driver corpus has no cross-doc run — fixture too weak"
    for r in runs:
        for doc, start in ((r.doc_a, r.start_a), (r.doc_b, r.start_b)):
            assert any(
                s <= start and start + r.run_tokens <= s + ln
                for s, ln in spans.get(doc, [])
            ), f"run {r} not covered by q119 spans of doc {doc}"


def test_duplicated_scrub_reconciles_with_spans(spark, sf_dir):
    """q132 removes exactly q119's spans: per doc, n_removed equals the
    summed span lengths (maximal spans are disjoint by construction),
    the cleaned text is the kept tokens in order, and a doc whose
    whole token range is one span scrubs to ''."""
    from cometbft_log_etl_spark.queries import catalog

    spans: dict = {}
    for r in catalog()["q119_duplicated_spans"].fn(spark, sf_dir).collect():
        spans.setdefault(r.doc_id, []).append((r.span_start, r.span_tokens))
    out = {r.doc_id: r for r in catalog()["q132_duplicated_scrub"].fn(spark, sf_dir).collect()}
    assert spans, "no duplicated spans on the driver corpus — fixture too weak"
    saw_empty = False
    for d, sl in spans.items():
        r = out[d]
        assert r.n_removed == sum(ln for _, ln in sl), (d, sl, r)
        n_clean = len([t for t in r.cleaned_text.split(" ") if t]) if r.cleaned_text else 0
        assert n_clean == r.n_tokens - r.n_removed
        if r.n_removed == r.n_tokens:
            assert r.cleaned_text == ""
            saw_empty = True
    # docs without spans are untouched
    for d, r in out.items():
        if d not in spans:
            assert r.n_removed == 0
    assert saw_empty or all(o.n_removed < o.n_tokens for o in out.values())
