"""Every catalog query must match its DuckDB oracle cell-exactly.

This mirrors (strictly) the driver's CORRECTNESS check at sf=0.01; tests
default to sf=0.001 for speed (override with SPARK_GRAFT_TEST_SF_DIR).
"""

from __future__ import annotations

import pytest

from cometbft_log_etl_spark.queries import catalog
from cometbft_log_etl_spark.testing.compare import run_compare

_CATALOG = catalog()


@pytest.mark.parametrize("name", sorted(_CATALOG))
def test_query_matches_oracle(spark, sf_dir, name):
    res = run_compare(spark, _CATALOG[name], sf_dir)
    assert res.ok, str(res)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_contract_shapes():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert qs, "queries() must not be empty"
    for name in os_:
        assert name in qs, f"oracle_sql has {name} not in queries()"
