"""PPJoin prefix-filter ON-case scaling on the Zipfian corpus.

The r10 decision-rule measurement (PERF_NOTES_r10.md) showed prefix
filtering is the difference between 3.55 s (ON) and 198.6 s (OFF) on
the 30k-doc Zipf corpus, while REGRESSING on the flat synthetic corpus
(26.8 s -> 177 s) — hence OFF by default with a documented two-sided
rule.  This tool adds the scaling evidence (VERDICT r10 item 6, extended to
a second decade per VERDICT r11 item 4): ngram_jaccard_pairs(
prefix_filter=True) at 30k, 300k and 3M docs, with the planted-pair
count checked (pairs scale linearly with the corpus, so a lossy
filter would show up as a short count).

The OFF case is deliberately not re-run at 300k: extrapolating the
measured quadratic blowup puts it in hours; the 30k ON/OFF pair is the
committed decision-rule evidence.  A DuckDB twin is likewise omitted
here — the inverted-index oracle pays exactly the hot-gram blowup the
prefix filter exists to avoid (that is the point of the corpus); the
300-doc driver gate `op_ngram_zipf_prefix` already hash-proves the ON
case lossless on this corpus shape.

Usage: python tools/bench_zipf.py   (expects .scratch/zipf{,300000,
3000000} — generate with
  python tools/gen_scale.py zipf
  SPARK_GRAFT_ZIPF_N=300000 python tools/gen_scale.py zipf
  SPARK_GRAFT_ZIPF_N=3000000 python tools/gen_scale.py zipf)
Prints one JSON document and writes BENCH_ZIPF_r<N>.json (round from
$SPARK_GRAFT_ROUND, default 13); the 3M row is single-shot (a 2x
timing error does not change a decade trend).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pql_spark.operators.dedup import ngram_jaccard_pairs  # noqa: E402
from pql_spark.sources import build_session  # noqa: E402


def main() -> int:
    repo = Path(__file__).resolve().parent.parent
    spark = build_session("bench-zipf")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {
        "metric": "zipf_ppjoin_on_scaling",
        "unit": "sec",
        "r10_decision_rule": {
            "zipf30k_on_sec": 3.55,
            "zipf30k_off_sec": 198.6,
            "flat_sf1_on_sec": 177.0,
            "flat_sf1_off_sec": 26.8,
        },
    }
    for sub, key, runs in (
        ("zipf", "zipf30k", 2),
        ("zipf300000", "zipf300k", 2),
        ("zipf3000000", "zipf3m", 1),
    ):
        p = repo / ".scratch" / sub / "documents.parquet"
        if not p.exists():
            print(f"missing {p}; skip", file=sys.stderr)
            continue
        docs = spark.read.parquet(str(p))
        best, pairs = float("inf"), -1
        for _ in range(runs):
            t0 = time.perf_counter()
            pairs = ngram_jaccard_pairs(
                docs, shingle_k=3, threshold=0.6, prefix_filter=True
            ).count()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[f"{key}_on_sec"] = round(best, 3)
        out[f"{key}_pairs"] = pairs
        out[f"{key}_docs"] = docs.count()
    rec = json.dumps(out)
    import os

    rnd = os.environ.get("SPARK_GRAFT_ROUND", "13")
    (repo / f"BENCH_ZIPF_r{rnd}.json").write_text(rec + "\n")
    print(rec)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
