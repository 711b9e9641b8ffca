#!/usr/bin/env python
"""Per-suffix driver-attestation currency report (round-12 verdict #4).

The driver attests only the first 50 catalog names per round
(alphabetical window), so a query's CORRECTNESS row can go stale as the
catalog grows. Rotations rename a query's ORDINAL but never its SUFFIX
(the `q62_subword_budget -> q113_subword_budget` precedent), so the
suffix is the stable identity: this tool scans every CORRECTNESS_r*.json
in the repo root, maps suffix -> latest round with a driver row, and
prints the current catalog sorted by staleness. Exit code 1 if any
catalog suffix has NO driver row at all (a q113-style ledger gap).

Usage: python tools/attestation_report.py [--max-rows N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def suffix(name: str) -> str:
    return name.split("_", 1)[1] if "_" in name else name


def last_attested(root: str) -> dict[str, tuple[int, str]]:
    """suffix -> (latest round with a driver row, the name it ran under)."""
    out: dict[str, tuple[int, str]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except (OSError, json.JSONDecodeError) as exc:
            print(f"# skipping unreadable {path}: {exc}", file=sys.stderr)
            continue
        for name in rows:
            s = suffix(name)
            if s not in out or rnd > out[s][0]:
                out[s] = (rnd, name)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-rows", type=int, default=0, help="limit output rows (0 = all)")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen = last_attested(root)

    from cometbft_log_etl_spark import queries as q

    cat = sorted(q.catalog())
    window = set(cat[:50])  # the driver's alphabetical attestation window
    rows = sorted(
        (seen.get(suffix(name), (0, ""))[0], name) for name in cat
    )
    never = [name for rnd, name in rows if rnd == 0]
    if args.max_rows:
        rows = rows[: args.max_rows]
    print(f"{'last_round':>10}  {'in_next_window':>14}  name")
    for rnd, name in rows:
        print(f"{rnd or 'NEVER':>10}  {str(name in window):>14}  {name}")
    print(f"# catalog: {len(cat)} names; window covers first 50 alphabetically")
    if never:
        print(f"# LEDGER GAP — never driver-attested: {never}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
