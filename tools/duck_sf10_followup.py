"""Follow-up DuckDB-only timings for the two sf10 rows whose oracle hit
the 600 s sweep cap (op_ngram_jaccard, op_dedup_clusters) — one run each
at a larger cap so BENCH_SCALING_r12 can carry a real ratio instead of
an upper bound.  Spark times are NOT re-measured (the sweep's stand).

Usage: python tools/duck_sf10_followup.py [cap_sec]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod  # noqa: E402
from bench_scaling import duck_con, duck_timed_capped  # noqa: E402


def main() -> int:
    cap = float(sys.argv[1]) if len(sys.argv) > 1 else 2700.0
    repo = Path(__file__).resolve().parent.parent
    oracles = entrymod.oracle_sql()
    out = {}
    scale = entrymod.scale_oracle_sql()
    for name in ("op_ngram_jaccard", "op_dedup_clusters"):
        con = duck_con(str(repo / ".scratch" / "sf10"))
        dt, capped, _rows, _cols = duck_timed_capped(
            con, scale.get(name, oracles[name]), cap
        )
        con.close()
        out[name] = {"duck_sf10": None if capped else dt,
                     "capped_at": cap if capped else None}
        print(name, out[name], flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
