"""Degenerate-input robustness: every catalog query must execute (not
necessarily return rows) against EMPTY tables with the production
schemas — at lake scale, empty partitions/sources are routine and an
operator that crashes on them takes the whole job down."""

from __future__ import annotations

import os

import pytest

from cometbft_log_etl_spark.queries import catalog
from cometbft_log_etl_spark.tables import load

# Queries whose construction loops eagerly (CC / BPE) are exercised too —
# they must converge instantly on empty input, not spin or raise.
_SKIP: set[str] = set()


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty-sf")
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        df = load(spark, sf_dir, t).limit(0)
        df.coalesce(1).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", sorted(catalog()))
def test_query_survives_empty_corpus(spark, empty_sf_dir, name):
    if name in _SKIP:
        pytest.skip("excluded")
    df = catalog()[name].fn(spark, empty_sf_dir)
    assert df.count() >= 0


@pytest.fixture(scope="module")
def tiny_sf_dir(spark, sf_dir, tmp_path_factory):
    """One row per table — stresses windows, quantile positions, and
    self-joins at the opposite degenerate extreme (the round-4
    short-doc shingle crash was exactly this class)."""
    out = tmp_path_factory.mktemp("tiny-sf")
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        df = load(spark, sf_dir, t).limit(1)
        df.coalesce(1).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", sorted(catalog()))
def test_query_survives_single_row_corpus(spark, tiny_sf_dir, name):
    df = catalog()[name].fn(spark, tiny_sf_dir)
    assert df.count() >= 0
