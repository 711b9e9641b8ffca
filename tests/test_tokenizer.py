"""Ground-truth attestation of the distributed BPE fit: the Spark merge
sequence must equal an independent single-process implementation of the
same greedy-leftmost / lexicographic-tiebreak algorithm."""

from __future__ import annotations

from collections import Counter

from cometbft_log_etl_spark.queries.tokenizer import bpe_fit
from cometbft_log_etl_spark.tables import load


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    syms = {w: list(w) for w in word_freqs}
    merges = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, freq in word_freqs.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += freq
        if not counts:
            break
        # argmax: highest count, then lexicographic (left, right)
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = left + right
        merges.append(
            {"step": step, "left": left, "right": right, "merged": merged, "pair_count": cnt}
        )
        for w in syms:
            s, out = syms[w], []
            for tok in s:
                if out and out[-1] == left and tok == right:
                    out[-1] = merged
                else:
                    out.append(tok)
            syms[w] = out
    return merges


def test_bpe_matches_reference_implementation(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    got = bpe_fit(docs, n_merges=6)

    freqs = Counter()
    for r in docs.select("text").collect():
        for w in r.text.split(" "):
            if w:
                freqs[w] += 1
    want = _reference_bpe(dict(freqs), n_merges=6)
    assert got == want
    assert len(got) == 6 and all(m["pair_count"] > 0 for m in got)


def test_bpe_greedy_leftmost_merge():
    """'aaa' with pair (a,a) merges leftmost-non-overlapping: [aa, a]."""
    want = _reference_bpe({"aaa": 1}, n_merges=1)
    assert want[0]["left"] == "a" and want[0]["right"] == "a"
    # count includes overlap (two adjacent (a,a) positions)
    assert want[0]["pair_count"] == 2


def test_q16_catalog_entry(spark, sf_dir):
    from cometbft_log_etl_spark.queries import catalog

    df = catalog()["q16_bpe_merges"].fn(spark, sf_dir)
    rows = df.collect()
    assert [r.step for r in rows] == list(range(1, len(rows) + 1))
    assert all(r.merged == r.left + r.right for r in rows)


def test_oracle_delimiter_contract(sf_dir):
    """The DuckDB oracle encodes symbol boundaries with chr(31); words
    containing it are screened from the vocab in BOTH engines. Today
    that screen must be a no-op: the corpus contains no chr(31)."""
    import os

    import duckdb

    n = duckdb.connect().execute(
        "SELECT count(*) FROM read_parquet(?) WHERE contains(text, chr(31))",
        [os.path.join(sf_dir, "documents.parquet")],
    ).fetchone()[0]
    assert n == 0


def test_oracle_greedy_replace_equivalence():
    """The delimiter-encoded replace() IS greedy-leftmost-non-overlapping
    merge: property-check the SQL rewrite against the reference Python
    merge on adversarial symbol runs (overlaps, boundary bleed, no-ops)."""
    import duckdb

    cases = [
        (["a", "a", "a"], ("a", "a")),
        (["a", "a", "a", "a"], ("a", "a")),
        (["b", "a", "a"], ("a", "a")),  # 'ba'+'a' boundary must not match
        (["ba", "a", "a"], ("a", "a")),
        (["aa", "a"], ("aa", "a")),
        (["a", "ab", "b"], ("ab", "b")),
        (["x"], ("a", "a")),
        (["ab", "ab", "ab"], ("ab", "ab")),
    ]
    con = duckdb.connect()
    for syms, (l, r) in cases:
        got = con.execute(
            "SELECT string_split(trim(replace("
            "  chr(31) || array_to_string(?, chr(31)||chr(31)) || chr(31),"
            "  chr(31) || ? || chr(31)||chr(31) || ? || chr(31),"
            "  chr(31) || ? || chr(31)), chr(31)), chr(31)||chr(31))",
            [syms, l, r, l + r],
        ).fetchone()[0]
        out: list = []
        for tok in syms:
            if out and out[-1] == l and tok == r:
                out[-1] = l + r
            else:
                out.append(tok)
        assert got == out, (syms, l, r, got, out)


def test_oracle_survives_merge_exhaustion(spark, sf_dir, tmp_path_factory):
    """A corpus with fewer than _N_MERGES possible merges: the Spark
    loop breaks early; the oracle's per-step CTEs must carry the symbol
    state through the merge-less steps (LEFT JOIN), not empty it (a
    cross join against an empty best_i zeroed q18's oracle — caught on
    this exact corpus)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.testing.compare import run_compare

    out = tmp_path_factory.mktemp("bpe-exhausted-sf")
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "embeddings",
    ):
        head = pq.read_table(os.path.join(sf_dir, f"{t}.parquet")).slice(0, 4)
        pq.write_table(head, str(out / f"{t}.parquet"))
    schema = pq.read_table(os.path.join(sf_dir, "documents.parquet")).schema
    docs = pa.Table.from_pydict(
        {
            "doc_id": [1, 2],
            "text": ["ab", "cd ab"],  # 2 merges possible, then exhausted
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [2, 5],
        },
        schema=pa.schema([schema.field(n) for n in
                          ("doc_id", "text", "lang", "source", "n_chars")]),
    )
    pq.write_table(docs, str(out / "documents.parquet"))
    for qname in ("q16_bpe_merges", "q18_bpe_token_counts"):
        res = run_compare(spark, catalog()[qname], str(out))
        assert res.ok, str(res)
    merges = catalog()["q16_bpe_merges"].fn(spark, str(out)).collect()
    assert 0 < len(merges) < 8  # genuinely exhausted before _N_MERGES


def test_bpe_encode_matches_reference(spark, sf_dir):
    """Encode attestation: per-word subtoken counts under the fitted
    merges equal the reference implementation's."""
    from cometbft_log_etl_spark.queries.tokenizer import bpe_encode_word_lengths

    docs = load(spark, sf_dir, "documents")
    merges = bpe_fit(docs, n_merges=6)
    got = {r.w: r.n_subtokens for r in bpe_encode_word_lengths(docs, merges).collect()}

    def encode(word):
        s = list(word)
        for m in merges:
            out = []
            for tok in s:
                if out and out[-1] == m["left"] and tok == m["right"]:
                    out[-1] = m["merged"]
                else:
                    out.append(tok)
            s = out
        return len(s)

    want = {w: encode(w) for w in got}
    assert got == want and len(got) > 0
    assert any(v < len(w) for w, v in got.items())  # some merge actually applied


def test_q18_catalog_entry(spark, sf_dir):
    from cometbft_log_etl_spark.queries import catalog

    df = catalog()["q18_bpe_token_counts"].fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    # merges only ever shorten: n_bpe_tokens <= total chars, >= n_words
    assert all(r.n_bpe_tokens >= r.n_words for r in rows)
