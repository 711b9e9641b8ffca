"""Line-dedup tier (q111/q112): pure-Python ground truth on an
engineered multi-line corpus, plus Spark-vs-DuckDB oracle parity on
the same corpus (the driver corpus has no newlines, so the real
line semantics are exercised here)."""

from __future__ import annotations

import hashlib
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cometbft_log_etl_spark.session import persistent_rdd_ids, release_new_persists
from cometbft_log_etl_spark.tables import load

from .conftest import TEST_SF_DIR


def _pynorm(line: str) -> str:
    return " ".join(t for t in line.split(" ") if t).lower()


def _reference_scrub(rows):
    """Independent spec implementation: (doc_id -> (source, n_lines,
    n_removed, scrubbed_text)). A line is removed iff its non-empty
    normalized md5 occurs in >= 2 per-document distinct occurrences."""
    votes: dict[str, int] = {}
    for _did, _src, text in rows:
        if text is None:
            continue
        seen = set()
        for l in text.split("\n"):
            n = _pynorm(l)
            if n:
                seen.add(hashlib.md5(n.encode()).hexdigest())
        for h in seen:
            votes[h] = votes.get(h, 0) + 1
    dup = {h for h, c in votes.items() if c >= 2}
    out = {}
    for did, src, text in rows:
        if text is None:
            continue
        ls = text.split("\n")
        kept = [
            l
            for l in ls
            if _pynorm(l) == ""
            or hashlib.md5(_pynorm(l).encode()).hexdigest() not in dup
        ]
        out[did] = (src, len(ls), len(ls) - len(kept), "\n".join(kept))
    return out


_DOCS = [
    # (doc_id, source, text) — banner recurs under case/whitespace
    # variants (must collapse under the normalization); "footer nav
    # bar" recurs verbatim; "repeat me" repeats only INTRA-doc (one
    # distinct occurrence -> never removed); blank and whitespace-only
    # lines are structural and always kept; doc 3 is pure boilerplate
    # (scrubs to ''); doc 6 has null text (excluded).
    (1, "web", "intro line one\nAccept Cookies To Continue\nunique body a\n\nfooter nav bar"),
    (2, "web", "accept   cookies to continue\nunique body b\nfooter nav bar\n"),
    (3, "web", "ACCEPT COOKIES TO CONTINUE"),
    (4, "wiki", "unique body c\nrepeat me\nrepeat me\nunique body d"),
    (5, "wiki", "   \nunique body e"),
    (6, "wiki", None),
    (7, "web", "footer nav bar\nunique body f"),
]


@pytest.fixture(scope="module")
def multiline_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("linedup")
    # full schema-faithful sibling tables so the oracle's view
    # registration and any cross-table query still bind
    for f in os.listdir(TEST_SF_DIR):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copy(os.path.join(TEST_SF_DIR, f), out / f)
    pq.write_table(
        pa.table(
            {
                "doc_id": [d for d, _, _ in _DOCS],
                "text": [t for _, _, t in _DOCS],
                "lang": ["en"] * len(_DOCS),
                "source": [s for _, s, _ in _DOCS],
                "n_chars": [len(t) if t else 0 for _, _, t in _DOCS],
            }
        ),
        str(out / "documents.parquet"),
    )
    return str(out)


def _engine_scrub(spark, sf_dir):
    from cometbft_log_etl_spark.queries.linedup import line_scrub

    before = persistent_rdd_ids(spark)
    try:
        rows = line_scrub(load(spark, sf_dir, "documents")).collect()
    finally:
        release_new_persists(spark, before)
    return {r.doc_id: (r.source, r.n_lines, r.n_removed, r.scrubbed_text) for r in rows}


def test_scrub_matches_reference_on_multiline_corpus(spark, multiline_dir):
    got = _engine_scrub(spark, multiline_dir)
    want = _reference_scrub(_DOCS)
    assert got == want
    # the hand-auditable anchors of the engineered corpus
    assert got[3] == ("web", 1, 1, "")  # pure boilerplate scrubs to ''
    assert got[1][2] == 2  # banner + footer removed
    assert got[4][2] == 0  # intra-doc repeat alone never removed
    assert got[2][1] == 4  # trailing newline -> trailing empty line counted


def test_scrub_matches_reference_on_real_corpus(spark, sf_dir):
    tab = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    rows = list(
        zip(
            tab.column("doc_id").to_pylist(),
            tab.column("source").to_pylist(),
            tab.column("text").to_pylist(),
        )
    )
    got = _engine_scrub(spark, sf_dir)
    assert got == _reference_scrub(rows)
    # the newline-free corpus degenerates to one-line docs (whole-doc
    # dedup): every doc is a single line in both implementations
    assert got and all(v[1] == 1 for v in got.values())


def test_report_is_scrub_rollup(spark, multiline_dir):
    from cometbft_log_etl_spark.queries import catalog

    before = persistent_rdd_ids(spark)
    try:
        rep = {
            r.source: (r.n_docs, r.n_lines, r.n_removed, r.n_docs_affected)
            for r in catalog()["q111_line_dedup"].fn(spark, multiline_dir).collect()
        }
    finally:
        release_new_persists(spark, before)
    ref = _reference_scrub(_DOCS)
    want: dict[str, list[int]] = {}
    for _did, (src, nl, nr, _t) in ref.items():
        acc = want.setdefault(src, [0, 0, 0, 0])
        acc[0] += 1
        acc[1] += nl
        acc[2] += nr
        acc[3] += 1 if nr else 0
    assert rep == {k: tuple(v) for k, v in want.items()}


@pytest.mark.parametrize("name", ["q111_line_dedup", "q112_line_scrub"])
def test_oracle_parity_on_multiline_corpus(spark, multiline_dir, name):
    from cometbft_log_etl_spark.queries import catalog
    from cometbft_log_etl_spark.testing.compare import run_compare

    before = persistent_rdd_ids(spark)
    try:
        res = run_compare(spark, catalog()[name], multiline_dir)
    finally:
        release_new_persists(spark, before)
    assert res.ok, str(res)
