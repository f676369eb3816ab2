"""Per-query micro-profiler: where does a bench gate's time go?

Usage: python tools/profile_query.py <query> [query ...]

For each query, runs bench.py's exact methodology (2 runs, best
reported) but splits the timing into:

* build_s   — the ``fn(spark, sf_dir)`` call (eager builders pay their
              decision/centroid jobs here);
* collect_s — ``df.collect()``;
* jobs      — Spark jobs launched during the run (statusTracker);
* stages    — total stages those jobs ran.

Same session shape as bench.py (warm parquet + python workers first).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from pql_spark.operators._util import unpersist_tracked  # noqa: E402
from pql_spark.sources import build_session  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("PROFILE_RUNS", "2"))
    spark = build_session("query-profile")
    spark.sparkContext.setLogLevel("ERROR")
    warm = spark.read.parquet(str(Path(sf_dir) / "region.parquet"))
    warm.groupBy("r_name").count().collect()
    cores = spark.sparkContext.defaultParallelism
    # Python daemon pool warmup sized for PEAK demand, not one stage:
    # AQE runs independent mapInPandas stages concurrently, so a cold
    # session can demand 2-3x cores of python workers at once.  On this
    # sandbox a fork+numpy-import storm runs at ~40% kernel time and
    # inflated isolated first-runs of the curation pipeline 3-10x
    # (measured 16.9/14.0/7.2/6.2 s across 4 identical runs).  Two
    # concurrent wide jobs pre-fork ~2x cores workers.
    from concurrent.futures import ThreadPoolExecutor

    def _warm_py(_):
        spark.range(0, cores, 1, cores).mapInPandas(
            lambda it: it, "id long"
        ).count()

    with ThreadPoolExecutor(max_workers=2) as pool:
        list(pool.map(_warm_py, range(2)))

    qs = entrymod.queries()
    tracker = spark.sparkContext.statusTracker()
    for name in names:
        fn = qs[name]
        best = None
        for run in range(n_runs):
            jobs0 = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            n = len(df.collect())
            t2 = time.perf_counter()
            jobs1 = set(tracker.getJobIdsForGroup(None) or [])
            new_jobs = sorted(jobs1 - jobs0)
            stages = 0
            for j in new_jobs:
                info = tracker.getJobInfo(j)
                if info is not None:
                    stages += len(info.stageIds)
            rec = (t2 - t0, t1 - t0, t2 - t1, len(new_jobs), stages, n)
            if best is None or rec[0] < best[0]:
                best = rec
            unpersist_tracked()
            spark.catalog.clearCache()
            print(
                f"{name} run{run}: total={rec[0]:.3f}s build={rec[1]:.3f}s"
                f" collect={rec[2]:.3f}s jobs={rec[3]} stages={rec[4]}"
                f" rows={rec[5]}",
                file=sys.stderr,
            )
        print(
            f"{name}: best total={best[0]:.3f}s build={best[1]:.3f}s"
            f" collect={best[2]:.3f}s jobs={best[3]} stages={best[4]}"
            f" rows={best[5]}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
