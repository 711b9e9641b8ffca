"""two_phase_fanout contract (plans/registry.py): cache-sharing family
serial-first, independent rest concurrent, deterministic result order,
fail-fast with every additional failure logged. The action is arbitrary,
so these run without a Spark session."""

from __future__ import annotations

import threading

import pytest

from cometbft_log_etl_spark.plans.registry import two_phase_fanout


def test_cache_family_runs_serially_first_and_order_is_preserved():
    calls: list[str] = []
    lock = threading.Lock()

    def action(name, df):
        with lock:
            calls.append(name)
        return f"done:{df}"

    tables = {
        "vote_latencies": 1,
        "network_latency_measurements": 2,
        "p2p_messages": 3,
        "network_latency_global_stats": 4,
    }
    out = two_phase_fanout(tables, action)
    # the cache-sharing family executed before anything else, in order
    assert calls[:2] == ["network_latency_measurements", "network_latency_global_stats"]
    # results come back keyed and in `tables` order regardless of
    # completion order
    assert list(out) == list(tables)
    assert out == {n: f"done:{v}" for n, v in tables.items()}


def test_first_failure_reraised_with_cause_and_rest_logged(caplog):
    def action(name, df):
        if name.startswith("bad"):
            raise ValueError(f"boom:{name}")
        return df

    tables = {"ok_a": 1, "bad_one": 2, "bad_two": 3, "ok_b": 4}
    with pytest.raises(RuntimeError, match="fan-out of") as exc_info:
        with caplog.at_level("ERROR"):
            two_phase_fanout(tables, action)
    # the original exception is chained, not swallowed
    assert isinstance(exc_info.value.__cause__, ValueError)
    # the OTHER failure is logged rather than silently discarded
    assert any("also failed" in r.message for r in caplog.records)


def test_single_worker_degenerates_to_serial():
    calls: list[str] = []
    out = two_phase_fanout(
        {"a": 1, "b": 2}, lambda n, df: calls.append(n) or df, max_workers=1
    )
    assert list(out) == ["a", "b"] and set(calls) == {"a", "b"}
