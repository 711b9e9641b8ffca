"""End-to-end batch ETL: log dir → normalized, metadata-stamped events.

Mirrors the reference main() pipeline (/root/reference/main.go:24-81):
parse directory → convert → attach per-file metadata → (sort) → sink →
fan out to plugin analytics. The Spark restatement (SURVEY.md §3.1):
read → normalize (one wide DF) → materialize once (staged parquet
with a sink, localCheckpoint without) → write events → run each
enabled plugin off the materialized table → write result tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators.metadata import attach_metadata, file_identities
from .operators.normalize import normalize
from .session import tune_session
from .sources.logs import read_raw_events


def etl_events(
    spark: SparkSession,
    log_dir: str,
    strict: bool = True,
    persist_raw: bool = False,
    materialize: bool = False,
) -> DataFrame:
    """Parse + normalize + enrich a directory of CometBFT node logs.

    The normalize step is two branches over the same parsed lines (the
    single-pass consensus projection + the P2P decode branch); with
    file_identities that is three consumers of raw. ``persist_raw``
    defaults to FALSE — measured and reasoned:

    - without the persist boundary, Catalyst's JSON-expression pruning
      rewrites each consumer's ``from_json`` to only the fields it
      touches (identities parses 2 of 23 union-schema fields, the P2P
      branch ~6), so the re-reads are pruned parses, not full ones
      (locally: ~35% faster warm, equal cold);
    - a MEMORY_AND_DISK persist of the full 23-field structs writes and
      re-reads MORE bytes than the source text (deserialized wide
      structs are several× the NDJSON size), so at 100 TB the persist
      costs more IO than the ~2 extra pruned text scans it saves.

    Set ``persist_raw=True`` only when the source itself is expensive
    to rescan (e.g. decompress-heavy input); or stage
    `read_raw_events` to parquet once and run `normalize` off that
    (same plan shape, columnar input).

    With ``materialize=True`` the result is eagerly localCheckpoint-ed
    and the raw persist is released. For the N-plugin fan-out this is
    decisively better than ``.cache()``: a cached DataFrame keeps its
    FULL logical lineage, so every one of the ~15 downstream plugin
    plans re-analyzes and re-optimizes the whole parse→8-family-union
    tree (measured: ~7 s of driver-side planning + per-job overhead at
    the bench scale); the checkpoint truncates lineage to a LogicalRDD
    and downstream planning touches only the plugin's own operators
    (~2 s, plugins phase halved). Trade-off: the checkpoint stores row
    data (no columnar InMemoryRelation compression / column pruning)
    and drops recompute-on-failure — at 100 TB the equivalent pattern
    is staging events to the parquet sink once and fanning plugins out
    from that columnar, pruned scan (see run_pipeline).
    """
    from pyspark import StorageLevel

    from .session import default_parallelism

    tune_session(spark)
    raw = read_raw_events(spark, log_dir)
    if persist_raw:
        raw = raw.persist(StorageLevel.MEMORY_AND_DISK)
    events = normalize(raw)
    ids = file_identities(raw, strict=strict)
    # attach_metadata's own strict check scans the JOINED events — which
    # executes the whole 8-family normalize once more just to verify an
    # invariant that already holds here by construction: `ids` contains
    # every file_path in `raw` (it is a groupBy over raw), events derive
    # from the same raw, and strict file_identities above already
    # rejected null identities. Skip the redundant event-side execution;
    # callers joining foreign identity tables keep the strict path.
    out = attach_metadata(events, ids, strict=False)
    # The 2-branch union doubles partition count (one set per branch);
    # every downstream job over the cached events would pay that
    # task-scheduling tax on each scan. Coalesce (narrow, no shuffle)
    # back to cluster parallelism: same work in fewer, fuller tasks.
    out = out.coalesce(default_parallelism())
    if materialize:
        out = out.localCheckpoint(eager=True)
        if persist_raw:
            raw.unpersist()
    return out


def write_events(
    events: DataFrame,
    out_dir: str,
    sort_by_time: bool = True,
    partition_by_date: bool = False,
) -> None:
    """O1/O2: event sink. The global time sort becomes a range-partitioned
    write (orderBy before write ⇒ parquet files are time-ordered without a
    single-reducer bottleneck). With partition_by_date the lake layout is
    hive-partitioned on event_date — at 100 TB that is what makes
    time-bounded reads partition-prune instead of scanning the corpus."""
    from pyspark.sql import functions as F

    df = events.orderBy("timestamp") if sort_by_time else events
    path = f"{out_dir.rstrip('/')}/events"
    if partition_by_date:
        df = df.withColumn("event_date", F.to_date("timestamp"))
        df.write.mode("overwrite").partitionBy("event_date").parquet(path)
    else:
        df.write.mode("overwrite").parquet(path)


def generate_sim_id() -> str:
    """Generated simulation id, `cometbft_sim_<YYYYMMDDTHHMMSS>_<8 hex>` —
    parity with the reference's generated database name for runs without
    an explicit simulation id (internal/storage/mongo.go:99-112)."""
    import secrets
    import time

    return f"cometbft_sim_{time.strftime('%Y%m%dT%H%M%S')}_{secrets.token_hex(4)}"


def run_pipeline(
    spark: SparkSession,
    log_dir: str,
    out_dir: str | None = None,
    plugins: list[str] | None = None,
    strict: bool = True,
    sim_id: str | None = None,
    with_rejects: bool = False,
) -> dict[str, DataFrame]:
    """Full fan-out: normalized events + every enabled plugin's result
    tables (O5/O6 — the single shared scan becomes one materialized
    events table every plugin reads).

    With an ``out_dir``, tables land under ``<out_dir>/<sim_id>/`` —
    the reference's database-per-simulation naming (O4), with a
    generated `cometbft_sim_…` id when none is passed, so repeated runs
    never clobber each other.

    The shared events table is materialized exactly once before the
    fan-out, two ways by destination:

    - with an ``out_dir``: the time-sorted events parquet (O1/O2) is
      written FIRST and plugins read it back — the staged table is
      columnar and compressed, every plugin scan is column-pruned, the
      lineage is one FileScan, and the sink write doubles as the
      materialization (no second pass). This is the 100 TB shape:
      measured faster than localCheckpoint from ~10⁶ rows up, and the
      checkpoint's deserialized row store stops being an option long
      before a real corpus;
    - without: eager localCheckpoint (see etl_events) — no disk
      location to stage to, and at in-memory scales the two are equal.
    """
    from .plans.registry import run_plugins

    root = None
    if out_dir is not None:
        root = f"{out_dir.rstrip('/')}/{sim_id or generate_sim_id()}"
        staged = etl_events(spark, log_dir, strict=strict)
        write_events(staged, root)
        # explicit schema: a zero-event run writes no part files, and a
        # bare read would fail schema inference instead of returning the
        # empty table the old cached path produced
        events = spark.read.schema(staged.schema).parquet(f"{root}/events")
    else:
        events = etl_events(spark, log_dir, strict=strict, materialize=True)
    results: dict[str, DataFrame] = {"events": events}
    if with_rejects:
        # per-file drop-reason counters — the ingest job's data-quality
        # table, one extra pruned pass
        from .sources.logs import read_parse_rejects

        results["parse_rejects"] = read_parse_rejects(spark, log_dir)
    results.update(run_plugins(events, enabled=plugins))
    if root is not None:
        from .plans.registry import two_phase_fanout

        to_write = {n: df for n, df in results.items() if n != "events"}
        two_phase_fanout(
            to_write,
            lambda name, df: df.write.mode("overwrite").parquet(f"{root}/{name}"),
        )
    return results
