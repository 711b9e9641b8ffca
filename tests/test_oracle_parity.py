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


def test_compare_catches_dtype_drift():
    """Regression for round-1 q16/q23/q29: DuckDB types windowed sum()
    over integers as HUGEINT (fetched as float64) while Spark returns
    BIGINT. The driver's value hash renders 1 vs 1.0 differently, so the
    local comparator must FAIL on an int-vs-float column even when every
    value is numerically equal."""
    import pandas as pd

    from cometbft_log_etl_spark.testing.compare import compare_frames

    spark_side = pd.DataFrame({"k": [1, 2], "v": pd.array([10, 20], dtype="int64")})
    oracle_side = pd.DataFrame({"k": [1, 2], "v": pd.array([10.0, 20.0], dtype="float64")})
    res = compare_frames("dtype_drift", spark_side, oracle_side)
    assert not res.ok
    assert any("dtype-family" in e for e in res.errors)


def test_prefix_hugeint_oracle_fails_locally(sf_dir):
    """The PRE-fix q29 oracle (windowed sum without CAST) must fail the
    local gate — proving the gate now predicts the driver's hash check."""
    import duckdb
    import pandas as pd

    from cometbft_log_etl_spark.testing.compare import compare_frames, duckdb_connection

    con = duckdb_connection(sf_dir)
    try:
        uncast = con.execute(
            """
            SELECT user_id,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS n_errors_last4
            FROM events WHERE event_type = 'error'
            """
        ).fetchdf()
    finally:
        con.close()
    assert uncast["n_errors_last4"].dtype.kind == "f", "HUGEINT should fetch as float64"
    as_bigint = uncast.copy()
    as_bigint["n_errors_last4"] = as_bigint["n_errors_last4"].astype("int64")
    res = compare_frames("prefix_hugeint", as_bigint, uncast)
    assert not res.ok, "local gate must flag BIGINT-vs-HUGEINT drift"
