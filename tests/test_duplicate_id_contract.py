"""Catalog-wide duplicate-id probe as CI (round-9 verdict item #6).

An engineered corpus carries exact-duplicate id rows in `documents`
(one history-slice id, one batch-slice id, plus the first row) and
`embeddings` (first two rows). Every oracle-checked query runs
Spark-vs-DuckDB on it; the divergence set must equal
contracts.ID_UNIQUENESS_CONTRACT_FAMILY exactly, in BOTH directions:

- a query OUTSIDE the family that diverges = a new silent member —
  the contract family grew without adjudication;
- a query INSIDE the family that suddenly matches = its semantics
  changed (e.g. someone grafted a silent id-dedup into the plan) —
  the validate-don't-repair posture was violated.

The fixture recipe is deterministic (fixed row positions), so family
membership is stable; if a future corpus change legitimately moves a
query across the line, adjudicate it in COVERAGE.md and update the
ONE list in contracts.py in the same commit.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cometbft_log_etl_spark.queries import catalog
from cometbft_log_etl_spark.queries.contracts import ID_UNIQUENESS_CONTRACT_FAMILY

_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def dupid_sf_dir(sf_dir, tmp_path_factory):
    """Single-file parquet tables (the DuckDB views read one file) with
    duplicate-id rows appended to documents and embeddings."""
    out = tmp_path_factory.mktemp("dupid-sf")
    for t in _TABLES:
        tab = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        if t == "documents":
            ids = tab.column("doc_id").to_pylist()
            extra = [tab.slice(0, 1)]
            # one batch-slice id (doc_id % 10 >= 8: exercises q47/q13's
            # incremental side) and one history-slice id
            for want in (lambda i: i % 10 >= 8, lambda i: i % 10 < 8):
                for j, i in enumerate(ids):
                    if want(i):
                        extra.append(tab.slice(j, 1))
                        break
            tab = pa.concat_tables([tab, *extra])
        elif t == "embeddings":
            tab = pa.concat_tables([tab, tab.slice(0, 2)])
        pq.write_table(tab, str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize(
    "name", sorted(n for n, q in catalog().items() if q.oracle)
)
def test_duplicate_id_divergence_set_is_exactly_the_family(
    spark, dupid_sf_dir, name
):
    from cometbft_log_etl_spark.testing.compare import run_compare

    res = run_compare(spark, catalog()[name], dupid_sf_dir)
    if name in ID_UNIQUENESS_CONTRACT_FAMILY:
        assert not res.ok, (
            f"{name} is in ID_UNIQUENESS_CONTRACT_FAMILY but now MATCHES "
            f"on a duplicate-id corpus — its semantics changed (silent "
            f"id-dedup?). Adjudicate in COVERAGE.md and update "
            f"contracts.py in the same commit. {res}"
        )
    else:
        assert res.ok, (
            f"{name} diverged on a duplicate-id corpus but is NOT in "
            f"ID_UNIQUENESS_CONTRACT_FAMILY — a new silent member. "
            f"Adjudicate in COVERAGE.md and update contracts.py in the "
            f"same commit. {res}"
        )


def test_family_names_exist_in_catalog():
    missing = ID_UNIQUENESS_CONTRACT_FAMILY - set(catalog())
    assert not missing, f"contracts.py names not in catalog: {sorted(missing)}"
