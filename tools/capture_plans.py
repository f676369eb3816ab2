"""Capture ``.explain("formatted")`` output for declared queries.

Usage: python tools/capture_plans.py <suffix> [query ...]

Writes ``plans/$PLANS_DIR/<query>_<suffix>.txt`` (default r16) for each named query (all
queries when none given).  Plan capture never executes the query — it
compiles the physical plan only — EXCEPT for builders that are eager by
design (documented per-operator); those run whatever jobs they run.

A one-line summary per query (Exchange count, join strategies, Python
eval nodes) goes to stdout so plan-shape diffs are greppable.
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from pql_spark.sources import build_session  # noqa: E402


def summarize(plan: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", plan))
    joins = re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        plan,
    )
    py = re.findall(
        r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
        r"FlatMapGroupsInPandas|AQEShuffleRead)\b",
        plan,
    )
    from collections import Counter

    def fmt(c):
        return ",".join(f"{k}x{v}" for k, v in sorted(Counter(c).items()))

    return f"Exchange={n_ex} joins=[{fmt(joins)}] py=[{fmt(py)}]"


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / os.environ.get("PLANS_DIR", "r16")
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = build_session("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    targets = names or list(qs)
    for name in targets:
        if name not in qs:
            print(f"?? unknown query {name}", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}", file=sys.stderr)
            continue
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"{name}: {summarize(plan)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
