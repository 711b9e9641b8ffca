"""S1-S5: NDJSON log-directory source.

Reference: internal/app/app.go:25-65 (directory scan + line scan) and
internal/parser/dispatcher.go:69-97 (tag peek + dispatch).

Spark-first: `spark.read.text` replaces the hand-rolled scanner (no
64 MB line limit to manage), `input_file_name()` carries per-file
lineage for M1/M2 metadata, and one `from_json` against the union
schema replaces the 23 typed unmarshals — the `_msg` tag then routes
rows columnarly. Dropped classes reproduce dispatcher semantics:
missing `_msg` (dispatcher.go:74-77), "with invalid args"
(dispatcher.go:81-84), unknown tags (dispatcher.go:89-93).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas.raws import TAG_KINDS, UNION_SCHEMA

# Plain and gzip-rotated node logs (Hadoop {a,b} glob alternation).
LOG_GLOB = "{root}/{{*.log,*.log.gz}}"


def read_log_lines(spark: SparkSession, path: str) -> DataFrame:
    """S1/S2: every line of every *.log / *.log.gz file under `path`,
    with file lineage.

    Compressed rotated logs are the common archival layout; Spark's
    text source decompresses *.gz transparently (each gzip file is one
    non-splittable partition — fine for per-node logs, which parallel
    across files). The reference reads only plain *.log
    (internal/app/app.go:25-45); accepting the compressed sibling is a
    capability superset, not a semantic change: identical lines parse
    identically, and per-file identity capture keys on the lineage path
    either way.

    Guard: a stem present in BOTH forms (x.log AND x.log.gz — a
    compress-without-delete race or `gzip -k`) would silently
    double-ingest every line; that layout fails loudly instead.
    """
    root = path.rstrip("/")
    _reject_compressed_twins(spark, root)
    # One Hadoop brace-alternation glob covers both layouts (and, unlike
    # a list of separate globs, tolerates either alternative matching
    # nothing as long as the other does); an entirely empty directory
    # still fails loudly, like the reference's empty-directory error.
    return spark.read.text(LOG_GLOB.format(root=root)).select(
        F.col("value"), F.input_file_name().alias("file_path")
    )


def _reject_compressed_twins(spark: SparkSession, root: str) -> None:
    """Fail if any stem matches both *.log and *.log.gz (double-ingest
    hazard). One globStatus metadata call; works on any FS scheme."""
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path(f"{root}/*.log.gz")
    st = hp.getFileSystem(spark._jsc.hadoopConfiguration()).globStatus(hp)
    if not st:
        return
    gz_stems = {f.getPath().getName()[: -len(".gz")] for f in st}
    pp = jvm.org.apache.hadoop.fs.Path(f"{root}/*.log")
    pst = pp.getFileSystem(spark._jsc.hadoopConfiguration()).globStatus(pp)
    plain = {f.getPath().getName() for f in (pst or [])}
    twins = sorted(gz_stems & plain)
    if twins:
        raise ValueError(
            f"both plain and gzip forms present for {twins} under {root} — "
            "each would ingest twice; remove one form"
        )


def _kind_map_expr():
    return F.create_map(*[x for tag, kind in TAG_KINDS.items() for x in (F.lit(tag), F.lit(kind))])


def _reject_reason_expr():
    """The ONE definition of the drop rules (dispatcher.go:74-93), shared
    by parse_raw (keeps reason-null rows) and parse_rejects (counts the
    rest) — the two can't drift apart. Evaluated over (tag, kind)
    columns; NULL means the line is accepted."""
    return (
        # no `_msg` (or unparseable JSON → NULL struct)
        F.when(F.col("tag").isNull(), "no_tag")
        # spurious "... with invalid args" transitions
        .when(F.col("tag").contains("with invalid args"), "invalid_args")
        # tag not in the 23-family dispatch map
        .when(F.col("kind").isNull(), "unknown_tag")
    )


def _tagged(lines: DataFrame) -> DataFrame:
    parsed = lines.select(
        "file_path", F.from_json("value", UNION_SCHEMA).alias("j")
    ).withColumn("tag", F.lower(F.col("j._msg")))
    return parsed.withColumn("kind", _kind_map_expr().getItem(F.col("tag")))


def parse_raw(lines: DataFrame) -> DataFrame:
    """S3-S5: tag peek, drop rules, and the single union-schema JSON parse.

    Output: one row per *recognized* line with columns
    (file_path, tag, kind, j: struct<union schema>).
    """
    return _tagged(lines).filter(_reject_reason_expr().isNull())


def read_raw_events(spark: SparkSession, path: str) -> DataFrame:
    return parse_raw(read_log_lines(spark, path))


def parse_rejects(lines: DataFrame) -> DataFrame:
    """Observability twin of parse_raw: per-file counts of DROPPED lines
    by drop rule — (file_path, reason, n).

    The reference logs each skipped line as it goes
    (dispatcher.go:74-93); at lake scale per-line logs are useless, so
    the same information becomes an aggregate the ingest job can emit
    next to its output and alert on (a node suddenly producing unknown
    tags or malformed JSON shows up as a counter, not a grep). Reasons
    mirror parse_raw's filters exactly:

    - ``no_tag``: unparseable JSON or missing ``_msg``
    - ``invalid_args``: the "with invalid args" transition spam
    - ``unknown_tag``: tag not in the 23-family dispatch map

    One projection + one (file, reason) aggregation; accepted lines
    never enter the plan's grouped side. Reasons come from the SAME
    _reject_reason_expr parse_raw filters on, so the accepted/rejected
    split is exhaustive and exclusive by construction.
    """
    return (
        _tagged(lines)
        .withColumn("reason", _reject_reason_expr())
        .filter(F.col("reason").isNotNull())
        .groupBy("file_path", "reason")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def read_parse_rejects(spark: SparkSession, path: str) -> DataFrame:
    """Directory-level composition, matching read_raw_events."""
    return parse_rejects(read_log_lines(spark, path))
