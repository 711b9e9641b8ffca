"""Columnar scalar helpers mirroring the reference's lib/ package.

All are pure Spark Column expressions (JVM-side, codegen'd) — none of
these need a Python UDF. Invalid inputs yield NULL (the reference
returns an error and the row is skipped; callers filter on NULL to get
the same drop semantics).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def parse_rfc3339(ts) -> Column:
    """RFC3339Nano string → TimestampType (UTC, microsecond precision).

    Reference: lib/time.go:5-13 (MustParseUtcTimestamp — panics on
    malformed input; here malformed → NULL and the caller drops the row,
    matching the log-and-skip contract of app.go:69-73).
    Sub-microsecond digits are truncated by Spark's ISO-8601 cast.
    """
    return _col(ts).cast("timestamp")


def format_step(step) -> Column:
    """"RoundStepPrecommitWait" → "precommitWait".

    Reference: lib/format.go:49-55 (strip "RoundStep" prefix +
    lowerCamel). No prefix → NULL (reference errors).
    """
    c = _col(step)
    stripped = F.substring(c, len("RoundStep") + 1, 2_000_000)
    lower_camel = F.concat(F.lower(F.substring(stripped, 1, 1)), F.substring(stripped, 2, 2_000_000))
    return F.when(c.startswith("RoundStep") & (F.length(c) > len("RoundStep")), lower_camel)


def parse_round_info(triple) -> tuple[Column, Column, Column]:
    """"height/round/RoundStepX" → (height long, round long, step lowerCamel).

    Reference: lib/parse.go:15-37 (ParseRoundInfo). Any malformed part
    → that component NULL; callers require all three non-NULL.
    """
    c = _col(triple)
    parts = F.split(c, "/")
    ok = F.size(parts) == 3
    height = F.when(ok, F.element_at(parts, 1).cast("long"))
    rnd = F.when(ok, F.element_at(parts, 2).cast("long"))
    step = F.when(ok, format_step(F.element_at(parts, 3)))
    return height, rnd, step


def extract_peer_id(peer) -> Column:
    """"id@ip:port" → "id"; no '@' → input unchanged.

    Reference: lib/format.go:57-62 (ExtractPeerIdOnly).
    `substring_index(s, '@', 1)` has exactly these semantics.
    """
    return F.substring_index(_col(peer), "@", 1)


def format_source_peer(peer) -> Column:
    """"Peer{MConn{addr} id dir}" → "id@addr".

    Reference: lib/format.go:15-47 (FormatSourcePeer; unused by the main
    pipeline but public API surface). Malformed → NULL.
    """
    c = _col(peer)
    addr = F.regexp_extract(c, r"^Peer\{MConn\{([^}]*)\}\s+(\S+)", 1)
    pid = F.regexp_extract(c, r"^Peer\{MConn\{([^}]*)\}\s+(\S+)", 2)
    return F.when((addr != "") & (pid != ""), F.concat(pid, F.lit("@"), addr))


# Go duration unit → milliseconds (time.ParseDuration vocabulary).
_GO_DUR_RE = r"([0-9]*\.?[0-9]+)(ns|us|µs|μs|ms|s|m|h)"


def go_duration_ms(dur) -> Column:
    """Go duration string ("3s", "100ms", "1h2m3.5s") → milliseconds (long).

    Reference: time.ParseDuration as used by timeout-analysis
    (/root/reference/ossplugins/timeout-analysis/processor.go:209-214,
    which returns 0 on parse failure — reproduced via coalesce).
    Composite durations sum their parts; a leading '-' negates.
    """
    c = _col(dur)
    parts = F.regexp_extract_all(c, F.lit(_GO_DUR_RE), 0)
    total = F.aggregate(
        parts,
        F.lit(0.0),
        lambda acc, p: acc
        + F.regexp_extract(p, _GO_DUR_RE, 1).cast("double")
        * F.when(F.regexp_extract(p, _GO_DUR_RE, 2) == "ns", 1e-6)
        .when(F.regexp_extract(p, _GO_DUR_RE, 2).isin("us", "µs", "μs"), 1e-3)
        .when(F.regexp_extract(p, _GO_DUR_RE, 2) == "ms", 1.0)
        .when(F.regexp_extract(p, _GO_DUR_RE, 2) == "s", 1000.0)
        .when(F.regexp_extract(p, _GO_DUR_RE, 2) == "m", 60_000.0)
        .otherwise(3_600_000.0),
    )
    signed = F.when(c.startswith("-"), -total).otherwise(total)
    # Parse failure (no unit matched) → 0, like the reference.
    return F.coalesce(
        F.when(F.size(parts) > 0, signed.cast("long")), F.lit(0).cast("long")
    )
