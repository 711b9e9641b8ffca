"""CLI entry point — the reference main() workflow on Spark.

Mirrors /root/reference/main.go:24-81 + internal/config/config.go:24-46:
`-dir` is required; `-simulation` defaults to a generated
`cometbft_sim_<ts>_<rand>` id exactly like the reference's generated
database name (internal/storage/mongo.go:99-112) — repeated runs never
clobber each other. Plugins are config-selectable — either a comma
list (`--plugins`) or the reference's YAML plugin block
(`--config config.yaml`, internal/config/config.go:48-63) — and every enabled
plugin's result tables land under <out>/<simulation>/ — the
table-per-collection layout with parquet standing in for MongoDB
(SURVEY.md §2.5 O2-O4) — and/or in MongoDB itself with `--mongo-uri`
(the reference's -mongo-uri flag; db = simulation id, collection per
family, distributed batched inserts — sinks.MongoResultSink).

    python -m cometbft_log_etl_spark \
        --dir /path/to/logs --simulation run42 \
        (--out /data/lake | --mongo-uri mongodb://host:27017) \
        [--plugins vote-latency,network-latency | --config config.yaml] \
        [--stream] [--no-strict] [--partition-by-date] [--cpus 32]

`--stream` ingests through the Structured-Streaming path (the
reference's dormant ParseStream entry) with an availableNow drain into
the lake's exactly-once file sink before the plugin fan-out — same
results, checkpointed restartable ingestion.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cometbft_log_etl_spark", description=__doc__)
    ap.add_argument("--dir", required=True, help="directory containing per-node NDJSON .log files")
    ap.add_argument("--simulation", default=None, help="simulation id (output namespace); generated cometbft_sim_<ts>_<rand> when omitted")
    ap.add_argument("--out", default=None, help="output lake root; tables land under <out>/<simulation>/")
    ap.add_argument("--mongo-uri", default=None, help="MongoDB URI (reference -mongo-uri); store results there, db = simulation id")
    ap.add_argument("--plugins", default=None, help="comma-separated plugin subset (default: all)")
    ap.add_argument("--config", default=None, help="YAML config path with the reference's plugins block (ignored when --plugins is given)")
    ap.add_argument("--stream", action="store_true", help="ingest via Structured Streaming (availableNow drain into the lake, exactly-once file sink) instead of the batch reader; requires --out")
    ap.add_argument("--no-strict", action="store_true", help="tolerate files without identity lines")
    ap.add_argument("--with-rejects", action="store_true", help="also emit the per-file parse-drop counters table")
    ap.add_argument("--partition-by-date", action="store_true", help="hive-partition events on event_date")
    ap.add_argument("--cpus", type=int, default=None, help="local[N] parallelism")
    args = ap.parse_args(argv)
    if not args.out and not args.mongo_uri:
        ap.error("provide an output: --out lake root and/or --mongo-uri")
    if args.stream and not args.out:
        ap.error("--stream requires --out (the lake write is the streaming materialization the plugin fan-out reads)")

    from .pipeline import etl_events, generate_sim_id, write_events
    from .plans.registry import run_plugins
    from .session import get_spark

    sim_id = args.simulation or generate_sim_id()
    spark = get_spark(app_name=f"cometbft-log-etl-{sim_id}", cpus=args.cpus)
    if args.plugins:
        enabled = args.plugins.split(",")
    else:
        from .config import enabled_plugin_names

        enabled = enabled_plugin_names(args.config)

    t0 = time.time()
    # One materialization either way (see run_pipeline): with a lake
    # destination the sorted events write IS the materialization and
    # plugins fan out from the columnar staged table; otherwise an eager
    # localCheckpoint truncates lineage for the fan-out.
    dests = []
    if args.out:
        if args.stream:
            # Streaming ingest (the reference's dormant ParseStream entry,
            # dispatcher.go:101-121) drained into the lake with the
            # exactly-once file sink; the plugin fan-out then reads the
            # drained columnar table — same staged shape as the batch
            # path, minus the global time sort (a stream cannot sort;
            # event_date partitioning is the pruned-read replacement).
            from .streaming.ingest import stream_events
            from .streaming.sink import stream_events_to_lake

            # schema probe only — strict=False so the eager identity
            # validation job runs ONCE (inside stream_events_to_lake),
            # not twice; the schema is identical either way
            schema = stream_events(spark, args.dir, strict=False).schema
            q, out_root = stream_events_to_lake(
                spark,
                args.dir,
                args.out,
                sim_id=sim_id,
                strict=not args.no_strict,
                partition_by_date=args.partition_by_date,
            )
            q.awaitTermination()
        else:
            out_root = f"{args.out.rstrip('/')}/{sim_id}"
            staged = etl_events(spark, args.dir, strict=not args.no_strict)
            write_events(staged, out_root, partition_by_date=args.partition_by_date)
            schema = staged.schema
        # explicit schema so a zero-event run reads back as an empty
        # table instead of failing parquet schema inference
        if args.partition_by_date:
            from pyspark.sql import types as T

            schema = schema.add(T.StructField("event_date", T.DateType()))
        events = spark.read.schema(schema).parquet(f"{out_root}/events")
        dests.append(out_root)
    else:
        events = etl_events(spark, args.dir, strict=not args.no_strict, materialize=True)
    n_events = events.count()
    results = run_plugins(events, enabled=enabled)
    if args.with_rejects:
        from .sources.logs import read_parse_rejects

        results["parse_rejects"] = read_parse_rejects(spark, args.dir)
    # Result tables fan out concurrently (cache-sharing family serial
    # first) — the same two-phase discipline as run_pipeline, so the CLI
    # and the library path can't drift apart on first-touch behavior.
    from .plans.registry import two_phase_fanout

    if args.out:
        two_phase_fanout(
            results,
            lambda name, df: df.write.mode("overwrite").parquet(f"{out_root}/{name}"),
        )
    if args.mongo_uri:
        from .sinks import MongoResultSink

        sink = MongoResultSink(args.mongo_uri, sim_id)
        sink.store("events", events)
        two_phase_fanout(results, lambda name, df: sink.store(name, df))
        dests.append(f"{args.mongo_uri}/{sim_id}")
    print(
        f"processed {n_events} events -> {len(results) + 1} tables "
        f"at {' and '.join(dests)} in {time.time() - t0:.1f}s",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
