"""Minimal protobuf wire-format codec for CometBFT consensus messages.

The reference decodes hex/base64 p2p payloads with the CometBFT protobuf
Go bindings (/root/reference/internal/parser/decoder.go:17-113). Those
bindings aren't available here, so this module hand-rolls the wire
format for exactly the message shapes the reference consumes —
`tendermint.consensus.Message` and its 10 inner types, per the public
CometBFT proto definitions (proto/tendermint/consensus/types.proto,
proto/tendermint/types/types.proto).

The v1 / v1beta1 distinction in the reference (decoder.go:24-53) is a Go
type-registry concern only: the two revisions share field numbers and
inner shapes for every message the pipeline consumes, so one byte-level
decoder covers both.

Pure functions over `bytes` — the Spark integration wraps `decode_message`
in a pandas UDF (operators/decode.py); `encode_message` exists for
round-trip property tests and fixture generation (mirroring the
reference's render→parse round-trip test strategy, lib/parse_test.go).
"""

from __future__ import annotations

from typing import Any

# --- wire primitives ---------------------------------------------------


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        if i >= len(buf):
            raise ValueError("truncated varint")
        b = buf[i]
        out |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return out, i
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _write_varint(n: int) -> bytes:
    if n < 0:
        n &= (1 << 64) - 1  # two's-complement 64-bit, proto int32/int64 encoding
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zig64(n: int) -> int:
    return n - (1 << 64) if n >= (1 << 63) else n


def _iter_fields(buf: bytes):
    """Yield (field_no, wire_type, value) triples; value is int for
    varint/fixed, bytes for length-delimited."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 1:
            if i + 8 > n:
                raise ValueError("truncated fixed64")
            v = int.from_bytes(buf[i : i + 8], "little")
            i += 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            if i + ln > n:
                raise ValueError("truncated bytes")
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            if i + 4 > n:
                raise ValueError("truncated fixed32")
            v = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


def _fields(buf: bytes) -> dict[int, Any]:
    """Last-value-wins field map (proto3 semantics for scalars);
    repeated fields collect into lists under key (fno, 'rep')."""
    out: dict[int, Any] = {}
    for fno, _wt, v in _iter_fields(buf):
        rep_key = (fno, "rep")
        if fno in out and rep_key not in out:
            out[rep_key] = [out[fno]]
        if rep_key in out:
            out[rep_key].append(v)
        out[fno] = v
    return out


# --- message shapes (public CometBFT proto definitions) ----------------

SIGNED_MSG_TYPES = {1: "prevote", 2: "precommit", 32: "proposal"}
# cstypes.RoundStepType, rendered lowerCamel like the reference's
# typeslib.StepIntToString.
ROUND_STEPS = {
    1: "newHeight",
    2: "newRound",
    3: "propose",
    4: "prevote",
    5: "prevoteWait",
    6: "precommit",
    7: "precommitWait",
    8: "commit",
}

# tendermint.consensus.Message oneof field numbers.
MSG_KINDS = {
    1: "new_round_step",
    2: "new_valid_block",
    3: "proposal",
    4: "proposal_pol",
    5: "block_part",
    6: "vote",
    7: "has_vote",
    8: "vote_set_maj23",
    9: "vote_set_bits",
    10: "has_proposal_block_part",
}
KIND_TO_FNO = {v: k for k, v in MSG_KINDS.items()}


def _part_set_header(buf: bytes) -> dict:
    f = _fields(buf)
    return {"total": f.get(1, 0), "hash": (f.get(2, b"") or b"").hex()}


def _block_id(buf: bytes) -> dict:
    f = _fields(buf)
    psh = _part_set_header(f.get(2, b"")) if isinstance(f.get(2), bytes) else {"total": 0, "hash": ""}
    return {"hash": (f.get(1, b"") or b"").hex(), "ps_total": psh["total"], "ps_hash": psh["hash"]}


def _bit_array(buf: bytes) -> dict:
    f = _fields(buf)
    elems = f.get((2, "rep"), [f[2]] if 2 in f else [])
    return {"bits": _zig64(f.get(1, 0)), "elems": [int(e) for e in elems]}


def _timestamp(buf: bytes) -> str:
    """google.protobuf.Timestamp → RFC3339Nano-ish string (UTC)."""
    f = _fields(buf)
    secs, nanos = _zig64(f.get(1, 0)), f.get(2, 0)
    import datetime

    dt = datetime.datetime.fromtimestamp(secs, tz=datetime.timezone.utc)
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    return f"{base}.{nanos:09d}Z"


def decode_message(data: bytes) -> dict:
    """Decode a tendermint.consensus.Message; returns a flat dict with
    'kind' plus kind-specific fields. Raises ValueError on malformed
    input (caller drops the row, mirroring the reference's skip)."""
    if not data:
        raise ValueError("empty payload")
    outer = _fields(data)
    kind_fno = next((fno for fno in MSG_KINDS if fno in outer), None)
    if kind_fno is None:
        raise ValueError("no known oneof field")
    kind = MSG_KINDS[kind_fno]
    body = outer[kind_fno]
    if not isinstance(body, bytes):
        raise ValueError("oneof body not length-delimited")
    f = _fields(body)
    out: dict[str, Any] = {"kind": kind}

    def i32(v):  # proto int32 encoded as 64-bit varint
        v = _zig64(v)
        return v - (1 << 32) if v >= (1 << 31) else v

    if kind == "new_round_step":
        out.update(
            height=_zig64(f.get(1, 0)),
            round=i32(f.get(2, 0)),
            step=ROUND_STEPS.get(f.get(3, 0), "unknown"),
            seconds_since_start_time=_zig64(f.get(4, 0)),
            last_commit_round=i32(f.get(5, 0)),
        )
    elif kind == "new_valid_block":
        psh = _part_set_header(f.get(3, b"")) if isinstance(f.get(3), bytes) else {"total": 0, "hash": ""}
        ba = _bit_array(f.get(4, b"")) if isinstance(f.get(4), bytes) else {"bits": 0, "elems": []}
        out.update(
            height=_zig64(f.get(1, 0)),
            round=i32(f.get(2, 0)),
            ps_total=psh["total"],
            ps_hash=psh["hash"],
            bits=ba["bits"],
            elems=ba["elems"],
            is_commit=bool(f.get(5, 0)),
        )
    elif kind == "proposal":
        # consensus.Proposal wraps types.Proposal in field 1
        inner = _fields(f.get(1, b"")) if isinstance(f.get(1), bytes) else {}
        bid = _block_id(inner.get(5, b"")) if isinstance(inner.get(5), bytes) else _block_id(b"")
        out.update(
            vote_type=SIGNED_MSG_TYPES.get(inner.get(1, 0), "unknown"),
            height=_zig64(inner.get(2, 0)),
            round=i32(inner.get(3, 0)),
            pol_round=i32(inner.get(4, 0)),
            bid_hash=bid["hash"],
            ps_total=bid["ps_total"],
            ps_hash=bid["ps_hash"],
            msg_ts=_timestamp(inner.get(6, b"")) if isinstance(inner.get(6), bytes) else None,
            signature=(inner.get(7, b"") or b"").hex(),
        )
    elif kind == "proposal_pol":
        ba = _bit_array(f.get(3, b"")) if isinstance(f.get(3), bytes) else {"bits": 0, "elems": []}
        out.update(
            height=_zig64(f.get(1, 0)),
            pol_round=i32(f.get(2, 0)),
            bits=ba["bits"],
            elems=ba["elems"],
        )
    elif kind == "block_part":
        part = _fields(f.get(3, b"")) if isinstance(f.get(3), bytes) else {}
        out.update(
            height=_zig64(f.get(1, 0)),
            round=i32(f.get(2, 0)),
            part_index=part.get(1, 0),
            part_bytes=(part.get(2, b"") or b"").hex(),
        )
    elif kind == "vote":
        # consensus.Vote wraps types.Vote in field 1
        inner = _fields(f.get(1, b"")) if isinstance(f.get(1), bytes) else {}
        bid = _block_id(inner.get(4, b"")) if isinstance(inner.get(4), bytes) else _block_id(b"")
        out.update(
            vote_type=SIGNED_MSG_TYPES.get(inner.get(1, 0), "unknown"),
            height=_zig64(inner.get(2, 0)),
            round=i32(inner.get(3, 0)),
            bid_hash=bid["hash"],
            ps_total=bid["ps_total"],
            ps_hash=bid["ps_hash"],
            msg_ts=_timestamp(inner.get(5, b"")) if isinstance(inner.get(5), bytes) else None,
            validator_address=(inner.get(6, b"") or b"").hex(),
            validator_index=i32(inner.get(7, 0)),
            signature=(inner.get(8, b"") or b"").hex(),
            extension=(inner.get(9, b"") or b"").hex(),
        )
    elif kind == "has_vote":
        out.update(
            height=_zig64(f.get(1, 0)),
            round=i32(f.get(2, 0)),
            vote_type=SIGNED_MSG_TYPES.get(f.get(3, 0), "unknown"),
            vote_index=i32(f.get(4, 0)),
        )
    elif kind in ("vote_set_maj23", "vote_set_bits"):
        bid = _block_id(f.get(4, b"")) if isinstance(f.get(4), bytes) else _block_id(b"")
        out.update(
            height=_zig64(f.get(1, 0)),
            round=i32(f.get(2, 0)),
            vote_type=SIGNED_MSG_TYPES.get(f.get(3, 0), "unknown"),
            bid_hash=bid["hash"],
            ps_total=bid["ps_total"],
            ps_hash=bid["ps_hash"],
        )
        if kind == "vote_set_bits":
            ba = _bit_array(f.get(5, b"")) if isinstance(f.get(5), bytes) else {"bits": 0, "elems": []}
            out.update(bits=ba["bits"], elems=ba["elems"])
    elif kind == "has_proposal_block_part":
        out.update(
            height=_zig64(f.get(1, 0)),
            round=i32(f.get(2, 0)),
            part_index=i32(f.get(3, 0)),
        )
    return out


# --- encoder (fixtures + round-trip tests) ------------------------------


def _tag(fno: int, wt: int) -> bytes:
    return _write_varint((fno << 3) | wt)


def _enc_varint_field(fno: int, v: int) -> bytes:
    return _tag(fno, 0) + _write_varint(v) if v else b""


def _enc_bytes_field(fno: int, v: bytes) -> bytes:
    return _tag(fno, 2) + _write_varint(len(v)) + v if v else b""


def _enc_msg_field(fno: int, v: bytes) -> bytes:
    # nested messages are emitted even when empty=absent semantics differ;
    # skip empties to keep canonical proto3 encoding
    return _tag(fno, 2) + _write_varint(len(v)) + v if v else b""


def _enc_part_set_header(total: int, hash_hex: str) -> bytes:
    return _enc_varint_field(1, total) + _enc_bytes_field(2, bytes.fromhex(hash_hex))


def _enc_block_id(hash_hex: str, ps_total: int, ps_hash_hex: str) -> bytes:
    return _enc_bytes_field(1, bytes.fromhex(hash_hex)) + _enc_msg_field(
        2, _enc_part_set_header(ps_total, ps_hash_hex)
    )


def _enc_bit_array(bits: int, elems: list[int]) -> bytes:
    out = _enc_varint_field(1, bits)
    for e in elems:
        out += _tag(2, 0) + _write_varint(e)
    return out


def _enc_timestamp(rfc3339: str) -> bytes:
    import datetime

    base, _, frac = rfc3339.rstrip("Z").partition(".")
    dt = datetime.datetime.strptime(base, "%Y-%m-%dT%H:%M:%S").replace(tzinfo=datetime.timezone.utc)
    nanos = int((frac or "0").ljust(9, "0")[:9])
    return _enc_varint_field(1, int(dt.timestamp())) + _enc_varint_field(2, nanos)


_TYPE_CODES = {v: k for k, v in SIGNED_MSG_TYPES.items()}
_STEP_CODES = {v: k for k, v in ROUND_STEPS.items()}


def encode_message(kind: str, **kw) -> bytes:
    """Encode a consensus Message for tests/fixtures (inverse of
    decode_message for the supported field subset)."""
    if kind == "new_round_step":
        body = (
            _enc_varint_field(1, kw.get("height", 0))
            + _enc_varint_field(2, kw.get("round", 0))
            + _enc_varint_field(3, _STEP_CODES[kw.get("step", "newHeight")])
            + _enc_varint_field(4, kw.get("seconds_since_start_time", 0))
            + _enc_varint_field(5, kw.get("last_commit_round", 0))
        )
    elif kind == "new_valid_block":
        body = (
            _enc_varint_field(1, kw.get("height", 0))
            + _enc_varint_field(2, kw.get("round", 0))
            + _enc_msg_field(3, _enc_part_set_header(kw.get("ps_total", 0), kw.get("ps_hash", "")))
            + _enc_msg_field(4, _enc_bit_array(kw.get("bits", 0), kw.get("elems", [])))
            + _enc_varint_field(5, 1 if kw.get("is_commit") else 0)
        )
    elif kind == "proposal":
        inner = (
            _enc_varint_field(1, _TYPE_CODES.get(kw.get("vote_type", "proposal"), 32))
            + _enc_varint_field(2, kw.get("height", 0))
            + _enc_varint_field(3, kw.get("round", 0))
            + _enc_varint_field(4, kw.get("pol_round", 0))
            + _enc_msg_field(5, _enc_block_id(kw.get("bid_hash", ""), kw.get("ps_total", 0), kw.get("ps_hash", "")))
            + (_enc_msg_field(6, _enc_timestamp(kw["msg_ts"])) if kw.get("msg_ts") else b"")
            + _enc_bytes_field(7, bytes.fromhex(kw.get("signature", "")))
        )
        body = _enc_msg_field(1, inner)
    elif kind == "proposal_pol":
        body = (
            _enc_varint_field(1, kw.get("height", 0))
            + _enc_varint_field(2, kw.get("pol_round", 0))
            + _enc_msg_field(3, _enc_bit_array(kw.get("bits", 0), kw.get("elems", [])))
        )
    elif kind == "block_part":
        part = (
            _enc_varint_field(1, kw.get("part_index", 0))
            + _enc_bytes_field(2, bytes.fromhex(kw.get("part_bytes", "")))
        )
        body = (
            _enc_varint_field(1, kw.get("height", 0))
            + _enc_varint_field(2, kw.get("round", 0))
            + _enc_msg_field(3, part)
        )
    elif kind == "vote":
        inner = (
            _enc_varint_field(1, _TYPE_CODES.get(kw.get("vote_type", "prevote"), 1))
            + _enc_varint_field(2, kw.get("height", 0))
            + _enc_varint_field(3, kw.get("round", 0))
            + _enc_msg_field(4, _enc_block_id(kw.get("bid_hash", ""), kw.get("ps_total", 0), kw.get("ps_hash", "")))
            + (_enc_msg_field(5, _enc_timestamp(kw["msg_ts"])) if kw.get("msg_ts") else b"")
            + _enc_bytes_field(6, bytes.fromhex(kw.get("validator_address", "")))
            + _enc_varint_field(7, kw.get("validator_index", 0))
            + _enc_bytes_field(8, bytes.fromhex(kw.get("signature", "")))
            + _enc_bytes_field(9, bytes.fromhex(kw.get("extension", "")))
        )
        body = _enc_msg_field(1, inner)
    elif kind == "has_vote":
        body = (
            _enc_varint_field(1, kw.get("height", 0))
            + _enc_varint_field(2, kw.get("round", 0))
            + _enc_varint_field(3, _TYPE_CODES.get(kw.get("vote_type", "prevote"), 1))
            + _enc_varint_field(4, kw.get("vote_index", 0))
        )
    elif kind in ("vote_set_maj23", "vote_set_bits"):
        body = (
            _enc_varint_field(1, kw.get("height", 0))
            + _enc_varint_field(2, kw.get("round", 0))
            + _enc_varint_field(3, _TYPE_CODES.get(kw.get("vote_type", "prevote"), 1))
            + _enc_msg_field(4, _enc_block_id(kw.get("bid_hash", ""), kw.get("ps_total", 0), kw.get("ps_hash", "")))
        )
        if kind == "vote_set_bits":
            body += _enc_msg_field(5, _enc_bit_array(kw.get("bits", 0), kw.get("elems", [])))
    elif kind == "has_proposal_block_part":
        body = (
            _enc_varint_field(1, kw.get("height", 0))
            + _enc_varint_field(2, kw.get("round", 0))
            + _enc_varint_field(3, kw.get("part_index", 0))
        )
    else:
        raise ValueError(f"unknown kind {kind!r}")
    return _enc_msg_field(KIND_TO_FNO[kind], body)
