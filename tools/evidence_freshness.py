#!/usr/bin/env python
"""Aggregate driver correctness records into an evidence-freshness
histogram: for every gate ever checked, the most recent round whose
driver run was hash-green, plus any gate that has EVER gone red.

This mechanically reproduces the "no evidence older than rN" claim the
SURVEY cites (VERDICT r11 item 7) — one command, no by-hand JSON
spelunking:

    python tools/evidence_freshness.py            # human summary
    python tools/evidence_freshness.py --json     # machine record
    python tools/evidence_freshness.py --oldest 9 # exit 1 if any gate's
                                                  # latest green < r9

The driver writes one ``CORRECTNESS_r<N>.json`` per round with a dict
of gate → {rows_match, schema_match, hash_match, err}; gates absent
from a round's window simply keep their previous evidence round.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def collect(repo: str = REPO) -> dict:
    latest_green: dict[str, int] = {}
    ever_red: dict[str, list[int]] = {}
    rows_only: dict[str, int] = {}  # latest round checked without hash
    rounds: list[int] = []
    # r15: the r1-r9 artifact tail lives in archive/ (BENCH_HISTORY.md
    # indexes it); the cumulative histogram reads both locations
    paths = glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")) + glob.glob(
        os.path.join(repo, "archive", "CORRECTNESS_r*.json")
    )
    for path in sorted(paths, key=os.path.basename):
        rn = int(re.search(r"_r(\d+)\.json$", path).group(1))
        rounds.append(rn)
        with open(path) as f:
            data = json.load(f)
        for gate, rec in data.items():
            if not isinstance(rec, dict):
                continue
            if rec.get("hash_match"):
                latest_green[gate] = rn
                rows_only.pop(gate, None)
            elif rec.get("err") == "no_oracle":
                # weaker rows-only evidence (gate had no oracle_sql
                # that round — the driver records spark rows only)
                if latest_green.get(gate, -1) < rn:
                    rows_only[gate] = rn
            elif rec.get("err") or rec.get("rows_match") is False or (
                rec.get("hash_match") is False
            ):
                ever_red.setdefault(gate, []).append(rn)
    hist = Counter(latest_green.values())
    return {
        "rounds_seen": rounds,
        "gates_total": len(set(latest_green) | set(rows_only)),
        "gates_hash_green_ever": len(latest_green),
        "latest_green_histogram": {
            str(k): hist[k] for k in sorted(hist)
        },
        "oldest_green_round": min(latest_green.values()) if latest_green else None,
        "gates_rows_only_currently": sorted(rows_only),
        "gates_ever_red": {k: v for k, v in sorted(ever_red.items())},
        "latest_green_by_gate": dict(sorted(latest_green.items())),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument(
        "--oldest", type=int, default=None,
        help="fail (exit 1) if any gate's latest green predates this round",
    )
    args = ap.parse_args()
    rec = collect()
    if args.json:
        print(json.dumps(rec, indent=1))
    else:
        print(
            f"gates: {rec['gates_total']} total,"
            f" {rec['gates_hash_green_ever']} ever hash-green,"
            f" {len(rec['gates_ever_red'])} ever red"
        )
        print("latest-green histogram (round: gates):")
        for k, v in rec["latest_green_histogram"].items():
            print(f"  r{k}: {v}")
        print(f"oldest evidence: r{rec['oldest_green_round']}")
        if rec["gates_rows_only_currently"]:
            print("rows-only (no hash oracle):",
                  ", ".join(rec["gates_rows_only_currently"]))
        for gate, rounds in rec["gates_ever_red"].items():
            print(f"RED ever: {gate} in rounds {rounds}")
    if args.oldest is not None and rec["oldest_green_round"] is not None:
        if rec["oldest_green_round"] < args.oldest:
            stale = [
                g for g, r in rec["latest_green_by_gate"].items()
                if r < args.oldest
            ]
            print(
                f"STALE: {len(stale)} gates predate r{args.oldest}:"
                f" {', '.join(stale[:10])}{'…' if len(stale) > 10 else ''}",
                file=sys.stderr,
            )
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
