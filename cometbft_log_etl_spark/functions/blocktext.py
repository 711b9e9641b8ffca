"""C9/C14: parsers for CometBFT's stringified Block / Vote renderings.

The second imperative kernel (SURVEY.md §4): multi-line recursive-descent
text, too irregular for regexp columns. Mirrors /root/reference/lib/
parse.go — ParseVoteString (:110-221), ParseBlockString + blockParser
(:223-516), parseConsensusVersion (:519-555), parseBlockID (:557-591),
parseCommitSig (:616-647). Renderers (the inverse, matching the public
cometbft Block.StringIndented shape the parser consumes) exist for
round-trip property tests, following the reference's own test strategy
(lib/parse_test.go:47-121,333-437).

Spark-side: `parse_block_udf` is an Arrow-batched pandas UDF returning
one nested struct column; apply it AFTER filtering to committed_block
rows so the scan stays pruned.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# C14 — vote strings (parse.go:110-221)

_RFC3339 = "%Y-%m-%dT%H:%M:%S.%f%z"
_FRAC_RE = re.compile(r"\.(\d+)")


def _parse_ts(s: str) -> datetime:
    """RFC3339Nano → UTC datetime; nanoseconds truncate to micros
    (Python datetime resolution — same floor DuckDB applies)."""
    s = s.strip().replace("Z", "+00:00")
    m = _FRAC_RE.search(s)
    if m:
        s = s[: m.start()] + "." + m.group(1)[:6].ljust(1, "0") + s[m.end():]
    else:
        tail = s[-6:] if s[-6] in "+-" else ""
        s = (s[: len(s) - len(tail)] if tail else s) + ".0" + tail
    return datetime.strptime(s, _RFC3339).astimezone(timezone.utc)


def parse_vote_string(s: str) -> dict | None:
    """`[Vote Vote{idx:addr h/r/TYPE(name) blockHash psHash psTotal
    [sig [ext]] @ ts}]` → dict; "nil-Vote" → None. Raises ValueError on
    malformed input (the reference returns an error)."""
    s = s.strip()
    if s == "nil-Vote":
        return None
    if s.startswith("[") and s.endswith("]"):
        s = s[1:-1]
    s = s.removeprefix("Vote ")
    if not (s.startswith("Vote{") and s.endswith("}")):
        raise ValueError(f"unexpected vote format: {s!r}")
    parts = s[len("Vote{"):-1].split()
    try:
        at_idx = parts.index("@")
    except ValueError:
        raise ValueError("missing '@' in vote string") from None
    if at_idx < 5:
        raise ValueError(f"not enough fields before '@': {parts[:at_idx]}")
    vi, _, addr = parts[0].partition(":")
    if not addr and ":" not in parts[0]:
        raise ValueError(f"invalid validator info {parts[0]!r}")
    hrt = parts[1].split("/", 2)
    if len(hrt) != 3:
        raise ValueError(f"invalid height/round/type {parts[1]!r}")
    raw_type = hrt[2]
    m = re.search(r"\(([^)]*)\)", raw_type)
    vote_type = m.group(1) if m else raw_type
    if at_idx + 1 >= len(parts):
        raise ValueError("missing timestamp after '@'")
    sig_ext = parts[5:at_idx]
    return {
        "type": vote_type.lower(),
        "height": int(hrt[0]),
        "round": int(hrt[1]),
        "block_id": {
            "hash": parts[2],
            "part_set_header": {"total": int(parts[4]), "hash": parts[3]},
        },
        "timestamp": _parse_ts(parts[at_idx + 1]),
        "validator_address": addr,
        "validator_index": int(vi),
        "signature": sig_ext[0] if len(sig_ext) >= 1 else "",
        "extension": sig_ext[1] if len(sig_ext) >= 2 else "",
    }


def render_vote(v: dict) -> str:
    """Inverse of parse_vote_string (the cometbft Vote.String shape)."""
    sig = f" {v['signature']}" if v.get("signature") else ""
    ext = f" {v['extension']}" if v.get("extension") else ""
    ts = v["timestamp"].strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
    bid = v["block_id"]
    return (
        f"[Vote Vote{{{v['validator_index']}:{v['validator_address']} "
        f"{v['height']}/{v['round']:02d}/SIGNED_MSG_TYPE_{v['type'].upper()}({v['type'].capitalize()}) "
        f"{bid['hash']} {bid['part_set_header']['hash']} {bid['part_set_header']['total']:012d}"
        f"{sig}{ext} @ {ts}}}]"
    )


# --------------------------------------------------------------------------
# C9 — block strings (parse.go:223-516)

_HEADER_HASH_FIELDS = {
    "LastCommit:": "last_commit_hash",
    "Data:": "data_hash",
    "Validators:": "validators_hash",
    "NextValidators:": "next_validators_hash",
    "App:": "app_hash",
    "Consensus:": "consensus_hash",
    "Results:": "last_results_hash",
    "Evidence:": "evidence_hash",
}

_VERSION_RE1 = re.compile(r"\{(\d+)\s+(\d+)\}")
_VERSION_RE2 = re.compile(r"\{Block:(\d+)\s+App:(\d+)\}")
_TX_RE = re.compile(r"([0-9A-F]+) \(\d+ bytes\)")
_COMMIT_SIG_RE = re.compile(r"CommitSig\{([0-9A-F]+) by ([0-9A-F]+) on (\d+) @ ([^}]+)\}")
_PSH_RE = re.compile(r"\{(\d+):([0-9A-F]+)\}")


def parse_consensus_version(s: str) -> dict:
    m = _VERSION_RE1.search(s) or _VERSION_RE2.search(s)
    if not m:
        raise ValueError(f"invalid version format: {s}")
    return {"block": int(m.group(1)), "app": int(m.group(2))}


def parse_block_id(s: str) -> dict:
    parts = s.split(":")
    if len(parts) < 2:
        raise ValueError(f"invalid BlockID format: {s}")
    out = {"hash": parts[0], "part_set_header": {"total": 0, "hash": ""}}
    if len(parts) >= 3:
        try:
            out["part_set_header"] = {"total": int(parts[1]), "hash": parts[2]}
        except ValueError:
            pass
    elif "{" in s:
        m = _PSH_RE.search(s)
        if m:
            out["part_set_header"] = {"total": int(m.group(1)), "hash": m.group(2)}
    return out


def parse_commit_sig(s: str) -> dict:
    m = _COMMIT_SIG_RE.search(s)
    if not m:
        if "nil-CommitSig" in s or "BlockIDFlagAbsent" in s:
            # NewCommitSigAbsent: flag=1, everything else zero
            return {"block_id_flag": 1, "validator_address": "", "timestamp": None, "signature": ""}
        raise ValueError(f"invalid CommitSig format: {s}")
    ts_raw = m.group(4)
    try:
        ts = _parse_ts(ts_raw)
    except ValueError as e:
        raise ValueError(f"failed to parse timestamp: {ts_raw}") from e
    return {
        "block_id_flag": int(m.group(3)),
        "validator_address": m.group(2),
        "timestamp": ts,
        "signature": m.group(1),
    }


@dataclass
class _Lines:
    lines: list[str]
    pos: int = 0

    def next(self) -> str:
        if self.pos >= len(self.lines):
            raise ValueError("unexpected end of input")
        line = self.lines[self.pos]
        self.pos += 1
        return line

    def expect_section(self, name: str) -> None:
        line = self.next()
        if name not in line:
            raise ValueError(f"expected {name!r}, got {line!r}")


def parse_block_string(s: str) -> dict | None:
    """Multi-line `Block{Header{…} Data{…} EvidenceData{…} Commit{…}}#H`
    → nested dict; "nil-Block" → None."""
    if s == "nil-Block":
        return None
    p = _Lines(s.splitlines())
    if not p.next().startswith("Block{"):
        raise ValueError("expected 'Block{'")

    p.expect_section("Header{")
    header: dict = {
        "version": None, "chain_id": None, "height": None, "time": None,
        "last_block_id": None, "proposer_address": None,
        **{v: None for v in _HEADER_HASH_FIELDS.values()},
    }
    for _ in range(14):
        parts = p.next().strip().split(" ", 1)
        if len(parts) < 2:
            continue
        name, value = parts[0], parts[1].strip()
        if name == "Version:":
            header["version"] = parse_consensus_version(value)
        elif name == "ChainID:":
            header["chain_id"] = value
        elif name == "Height:":
            header["height"] = int(value)
        elif name == "Time:":
            header["time"] = _parse_ts(value)
        elif name == "LastBlockID:":
            header["last_block_id"] = parse_block_id(value)
        elif name in _HEADER_HASH_FIELDS:
            header[_HEADER_HASH_FIELDS[name]] = value
        elif name == "Proposer:":
            header["proposer_address"] = value
    p.next()  # header's closing "}#hash"

    p.expect_section("Data{")
    txs: list[str] = []
    while True:
        line = p.next().strip()
        if line.startswith("}#"):
            break
        if " bytes)" in line:
            m = _TX_RE.search(line)
            if m:
                txs.append(m.group(1))  # hex, as the reference hex-decodes

    p.expect_section("EvidenceData{")
    while not p.next().strip().startswith("}#"):
        pass

    p.expect_section("Commit{")
    commit: dict = {"height": 0, "round": 0, "block_id": None, "signatures": []}
    line = p.next()
    if "Height:" in line:
        commit["height"] = int(line.split("Height:", 1)[1].strip())
    line = p.next()
    if "Round:" in line:
        commit["round"] = int(line.split("Round:", 1)[1].strip())
    line = p.next()
    if "BlockID:" in line:
        try:
            commit["block_id"] = parse_block_id(line.split("BlockID:", 1)[1].strip())
        except ValueError:
            pass
    line = p.next()
    if "Signatures:" not in line:
        raise ValueError(f"expected 'Signatures:', got {line!r}")
    while True:
        line = p.next().strip()
        if line.startswith("}#"):
            break
        if line.startswith("CommitSig{"):
            try:
                commit["signatures"].append(parse_commit_sig(line))
            except ValueError:
                pass

    if not p.next().strip().startswith("}#"):
        raise ValueError("expected closing brace with hash")
    return {"header": header, "data": {"txs": txs}, "last_commit": commit}


def render_block(b: dict, block_hash: str = "F00D") -> str:
    """Inverse of parse_block_string: the cometbft StringIndented shape
    (14 header fields, }#hash section closers) for round-trip tests."""
    h = b["header"]
    lb = h["last_block_id"]
    c = b["last_commit"]
    cb = c["block_id"]
    tx_lines = "".join(
        f"    {tx} ({len(tx) // 2} bytes)\n" for tx in b["data"]["txs"]
    )
    sig_lines = "".join(
        "    CommitSig{%s by %s on %d @ %s}\n"
        % (s["signature"], s["validator_address"], s["block_id_flag"],
           s["timestamp"].strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z")
        for s in c["signatures"]
    )
    return (
        "Block{\n"
        "  Header{\n"
        f"    Version:        {{{h['version']['block']} {h['version']['app']}}}\n"
        f"    ChainID:        {h['chain_id']}\n"
        f"    Height:         {h['height']}\n"
        f"    Time:           {h['time'].strftime('%Y-%m-%dT%H:%M:%S.%f')}Z\n"
        f"    LastBlockID:    {lb['hash']}:{lb['part_set_header']['total']}:{lb['part_set_header']['hash']}\n"
        f"    LastCommit:     {h['last_commit_hash']}\n"
        f"    Data:           {h['data_hash']}\n"
        f"    Validators:     {h['validators_hash']}\n"
        f"    NextValidators: {h['next_validators_hash']}\n"
        f"    App:            {h['app_hash']}\n"
        f"    Consensus:      {h['consensus_hash']}\n"
        f"    Results:        {h['last_results_hash']}\n"
        f"    Evidence:       {h['evidence_hash']}\n"
        f"    Proposer:       {h['proposer_address']}\n"
        "  }#HEADERHASH\n"
        "  Data{\n"
        f"{tx_lines}"
        "  }#DATAHASH\n"
        "  EvidenceData{\n"
        "  }#EVHASH\n"
        "  Commit{\n"
        f"    Height:     {c['height']}\n"
        f"    Round:      {c['round']}\n"
        f"    BlockID:    {cb['hash']}:{cb['part_set_header']['total']}:{cb['part_set_header']['hash']}\n"
        "    Signatures:\n"
        f"{sig_lines}"
        "  }#COMMITHASH\n"
        f"}}#{block_hash}"
    )


# --------------------------------------------------------------------------
# Spark integration

_PSH_T = T.StructType(
    [T.StructField("total", T.LongType()), T.StructField("hash", T.StringType())]
)
_BLOCK_ID_T = T.StructType(
    [T.StructField("hash", T.StringType()), T.StructField("part_set_header", _PSH_T)]
)
BLOCK_SCHEMA = T.StructType(
    [
        T.StructField(
            "header",
            T.StructType(
                [
                    T.StructField(
                        "version",
                        T.StructType(
                            [T.StructField("block", T.LongType()), T.StructField("app", T.LongType())]
                        ),
                    ),
                    T.StructField("chain_id", T.StringType()),
                    T.StructField("height", T.LongType()),
                    T.StructField("time", T.TimestampType()),
                    T.StructField("last_block_id", _BLOCK_ID_T),
                    T.StructField("last_commit_hash", T.StringType()),
                    T.StructField("data_hash", T.StringType()),
                    T.StructField("validators_hash", T.StringType()),
                    T.StructField("next_validators_hash", T.StringType()),
                    T.StructField("app_hash", T.StringType()),
                    T.StructField("consensus_hash", T.StringType()),
                    T.StructField("last_results_hash", T.StringType()),
                    T.StructField("evidence_hash", T.StringType()),
                    T.StructField("proposer_address", T.StringType()),
                ]
            ),
        ),
        T.StructField("data", T.StructType([T.StructField("txs", T.ArrayType(T.StringType()))])),
        T.StructField(
            "last_commit",
            T.StructType(
                [
                    T.StructField("height", T.LongType()),
                    T.StructField("round", T.LongType()),
                    T.StructField("block_id", _BLOCK_ID_T),
                    T.StructField(
                        "signatures",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("block_id_flag", T.LongType()),
                                    T.StructField("validator_address", T.StringType()),
                                    T.StructField("timestamp", T.TimestampType()),
                                    T.StructField("signature", T.StringType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
    ]
)


@F.pandas_udf(BLOCK_SCHEMA)
def parse_block_udf(block_raw: pd.Series) -> pd.DataFrame:
    """Arrow-batched C9 kernel: block text → nested struct. Malformed
    text yields an all-NULL struct (log-and-skip, app.go:87-91)."""
    rows = []
    for raw in block_raw:
        rec = {"header": None, "data": None, "last_commit": None}
        if raw:
            try:
                parsed = parse_block_string(raw)
                if parsed is not None:
                    rec = parsed
            except ValueError:
                pass
        rows.append(rec)
    return pd.DataFrame(rows, columns=["header", "data", "last_commit"])


def block_struct(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return parse_block_udf(c)
