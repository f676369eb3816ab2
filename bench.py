"""Benchmark harness: runs the headline queries from ``__spark_entry__``
on one scale-factor directory and prints ONE JSON line.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default all cores).

Each query is timed end-to-end (plan build + execute + collect to the
driver).  The session is warmed with one trivial action first so JVM
startup is not attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod  # noqa: E402
from pql_spark.operators._util import unpersist_tracked  # noqa: E402
from pql_spark.sources import build_session  # noqa: E402


# Streaming per-gate startup floors (PERF_NOTES_r10.md, revised r13):
# a JVM-only transient micro-batch gate floors at ~0.9 s (null-drain /
# passthrough micro-benchmarks), a Python-stateful one at ~1.4 s;
# op_stream_near_dup adds its measured 64-perm minhash Arrow kernel
# (~1.2 s).  op_stream_sink_upsert's floor is re-derived with REAL
# file writes (PERF_NOTES_r13 §1): a 1-row foreachBatch upsert pays an
# extra merge-write job + directory swap + parquet read-back on top of
# the drain, measured 1.05-1.11 s on a quiet session — the old 0.9 s
# null-drain floor understated the gate shape and made its 2× bar
# reachable by ordinary session spread.  The target is machine-checked
# here: per-gate best-of-2 must sit within _STREAM_DELTA_MAX of its
# floor AND the 8-gate family within _STREAM8_FAMILY_MAX, else the
# record carries stream_perf_flag=true.
_STREAM_FLOORS = {
    "op_stream_windowed": 0.9,
    "op_stream_sink_upsert": 1.1,
    "op_stream_dedup": 0.9,
    "op_stream_stateful": 1.4,
    "op_stream_sequence_detect": 1.4,
    "op_stream_interval_join": 1.4,
    "op_stream_sessionize": 1.4,
    "op_stream_near_dup": 2.6,
}
_STREAM_DELTA_MAX = 0.5
_STREAM8_FAMILY_MAX = 14.0
# Quiet-session cost of the canonical null drain (_stream_sentinel):
# median of 3 one-row availableNow memory-sink drains, measured 0.35-
# 0.40 s on an idle 32-core builder session.  The floors above are
# expressed in this unit's session, so a session whose drain runs slow
# scales every hard bar by the same measured factor (capped — a >3×
# drain means the session is unusable for perf claims, and the flag
# should fire rather than stretch further).
_STREAM_SENTINEL_REF = 0.37
_STREAM_INFLATION_CAP = 3.0
# the tight (0.5 s-delta) tier only arms when the stream sentinel
# itself reads quiet: a session whose null drain runs >15% over the
# reference has a measurably slow micro-batch path, and the batch
# instruments (pql_count sentinel, loadavg) provably cannot sense
# that (the r12 driver record; re-confirmed by a same-day builder
# session reading inflation 1.48 with clean batch sentinels)
_STREAM_TIGHT_MAX_INFLATION = 1.15


def compute_stream_flag(
    times: dict[str, float],
    session_clean: bool,
    floors: dict[str, float] = _STREAM_FLOORS,
    inflation: float = 1.0,
) -> tuple[dict[str, float], float, bool]:
    """Streaming perf check → (per-gate floor deltas, 8-gate family
    sum, flag).  Two tiers (VERDICT r11 item 6 — the old single 0.5 s
    per-delta margin also tripped on session spread, training readers
    to ignore it):

    * HARD, always on: the 8-gate family sum must stay ≤ 14 s, and no
      gate may exceed 2× its measured startup floor — a real floor
      exceedance, not noise.  Both bars scale by ``inflation``, the
      measured micro-batch-path slowdown of THIS session (stream
      sentinel / quiet reference, ≥ 1, capped): the r12 driver record
      proved a session can inflate the whole stateful family ~1.5×
      while the BATCH sentinel reads clean (loadavg_start 5.77,
      pql_count 0.185 s), because the micro-batch scheduler/state-
      store path degrades under contention the batch path doesn't
      sense.  Floor-dominated gates inflate BY the session factor, so
      an unscaled 2× bar is reachable by session spread alone —
      exactly the r12 false-positive (sink_upsert 2.219 s vs builder
      sessions' 1.2-1.45 s on identical code).
    * NOISE-GATED: the tight 0.5 s per-delta margin (vs RAW floors)
      applies only when the record's own noise instruments are clean —
      batch (sentinel drift and loadavg, the ``session_clean`` input)
      AND stream (``inflation`` ≤ 1.15: the floors are quiet-session
      numbers, so holding a 0.5 s margin against them is only
      meaningful when THIS session's micro-batch path measures quiet
      too).  A noisy session cannot trip it, and the hard tier still
      catches genuine regressions.
    """
    infl = min(max(inflation, 1.0), _STREAM_INFLATION_CAP)
    deltas = {
        q: round(times[q] - f, 3)
        for q, f in floors.items()
        if q in times and times[q] == times[q]
    }
    family = round(
        sum(times[q] for q in floors if q in times and times[q] == times[q]),
        3,
    )
    hard = family > _STREAM8_FAMILY_MAX * infl or any(
        times[q] > 2.0 * floors[q] * infl for q in deltas
    )
    tight = (
        session_clean
        and infl <= _STREAM_TIGHT_MAX_INFLATION
        and any(d > _STREAM_DELTA_MAX for d in deltas.values())
    )
    return deltas, family, bool(hard or tight)


def compute_session_clean(
    contended: bool,
    sentinel_first: float,
    sentinel_last: float,
    load_at_launch_1m: float,
    ncpu: int,
) -> bool:
    """A record is 'clean' (arming the tight noise-gated tier) only if
    no contention instrument fired: the contended flag, sentinel drift
    > 1.5×, or a loaded machine at LAUNCH (> 0.15×ncpu 1-min loadavg —
    the r12 driver record was marked clean at loadavg 5.77 because the
    batch sentinels were fast, and its contention-inflated streaming
    rows then read as trustworthy; VERDICT r12 item 2)."""
    return (
        not contended
        and sentinel_last <= 1.5 * sentinel_first
        and load_at_launch_1m <= 0.15 * ncpu
    )


def _stream_sentinel(spark) -> float:
    """Median-of-3 of the canonical null drain: a one-row parquet
    stream drained through an availableNow memory sink — the exact
    micro-benchmark the 0.9 s streaming floors were derived from
    (PERF_NOTES_r10).  Run in the SAME session as the streaming gates,
    it measures how fast THIS session's micro-batch path is; the ratio
    to _STREAM_SENTINEL_REF scales the hard flag bars.  One untimed
    warm drain first (the cold micro-batch machinery costs ~1.2 s that
    belongs to session setup, not the path's steady state)."""
    import shutil
    import tempfile

    from pql_spark.streaming import run_available_now

    shm = Path("/dev/shm")
    d = Path(tempfile.mkdtemp(
        prefix="pql_ssent_", dir=str(shm) if shm.is_dir() else None
    ))
    try:
        spark.createDataFrame([(1,)], "id long").write.parquet(
            str(d / "one")
        )
        schema = spark.read.parquet(str(d / "one")).schema

        def drain() -> None:
            s = spark.readStream.schema(schema).parquet(str(d / "one"))
            run_available_now(s.select("id"), "append")

        drain()  # warm (untimed)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            drain()
            runs.append(time.perf_counter() - t0)
        return round(sorted(runs)[1], 3)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _sentinel(spark, sf_dir: str) -> float:
    """Median-of-3 of a fixed-cost query (``pql_count``).  Run FIRST and
    LAST: at equal machine load the two medians agree within noise, so a
    large last/first ratio — or a high loadavg — machine-flags a record
    whose absolute times were inflated by concurrent work (the r9
    artifact showed 3-7x inflation with nothing in the JSON to say so).
    """
    fn = entrymod.queries()["pql_count"]
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        runs.append(time.perf_counter() - t0)
    return round(sorted(runs)[1], 3)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.removeprefix("sf") or "0.1")

    # loadavg at LAUNCH, before this process has done any work: the
    # only reading that is purely the neighbors'.  The post-warmup
    # loadavg_start includes our own 32-thread warmup burst and the
    # r12 driver record showed a session can decay to clean sentinels
    # while its start-of-run contention inflated the early gates.
    load_at_launch = os.getloadavg()

    spark = build_session("pql_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm fixed machinery once (JIT/codegen infra, parquet reader
    # classes, shuffle system, Python/Arrow workers) so per-query
    # timings measure the queries, not class loading.  The Python-worker
    # warmup runs one task per core: each executor thread forks its own
    # python daemon that imports pandas/numpy (~1 s each, all at once
    # when cold — this used to land on the first wide mapInPandas query).
    warm = spark.read.parquet(str(Path(sf_dir) / "region.parquet"))
    warm.groupBy("r_name").count().collect()
    cores = spark.sparkContext.defaultParallelism
    spark.range(0, cores, 1, cores).mapInPandas(
        lambda it: it, "id long"
    ).count()

    load_start = os.getloadavg()
    sentinel_first = _sentinel(spark, sf_dir)
    stream_sentinel_first = _stream_sentinel(spark)

    # Steady-state methodology (JMH-style): each query runs twice and
    # the BEST time is reported.  Run 1 pays one-time costs that are
    # irrelevant to sustained throughput at scale — whole-stage-codegen
    # compilation of the query's generated classes, JIT warmup, and
    # stop-the-world GC noise from neighboring queries (observed ±10×
    # swings on sub-second queries).  Run 2 measures the plan itself:
    # scan + shuffle + compute.  Cold totals are reported alongside.
    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        runs: list[float] = []
        n = 0
        for _ in range(2):
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                n = len(df.collect())
            except Exception as e:  # noqa: BLE001
                print(f"bench: {name} failed: {e}", file=sys.stderr)
                break
            runs.append(time.perf_counter() - t0)
            # drop any persisted state a pipeline left behind so later
            # runs aren't timed under another query's cache pressure:
            # drain the operator-level persist registry first (releases
            # the Python-side strong refs too), then clear any remaining
            # cached plans
            unpersist_tracked()
            spark.catalog.clearCache()
        if not runs or len(runs) < 2:
            times[name] = float("nan")
            cold[name] = float("nan")
            continue
        times[name] = round(min(runs), 3)
        cold[name] = round(runs[0], 3)
        print(
            f"bench: {name}: {times[name]}s best / {cold[name]}s cold"
            f" ({n} rows)",
            file=sys.stderr,
        )

    sentinel_last = _sentinel(spark, sf_dir)
    stream_sentinel_last = _stream_sentinel(spark)
    load_end = os.getloadavg()
    # contention flag: the fixed-cost sentinel drifted >2x across the
    # run, or the 1-min loadavg exceeded the core count at either end
    # (this process alone keeps loadavg ~= its own core usage; anything
    # far above means a neighbor was competing for the same cores).
    ncpu = os.cpu_count() or 1
    contended = bool(
        sentinel_last > 2.0 * sentinel_first
        or max(load_start[0], load_end[0]) > 1.5 * ncpu
    )

    total = round(sum(t for t in times.values() if t == t), 3)
    cold_total = round(sum(t for t in cold.values() if t == t), 3)
    full_record = {
        "metric": "e2e_all_queries",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "methodology": "best-of-2 per query (steady-state);"
        " cold run 1 totals in cold_sec",
        "cold_sec": cold_total,
        "sentinel_first_sec": sentinel_first,
        "sentinel_last_sec": sentinel_last,
        "stream_sentinel_first_sec": stream_sentinel_first,
        "stream_sentinel_last_sec": stream_sentinel_last,
        "loadavg_at_launch": [round(x, 2) for x in load_at_launch],
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in load_end],
        "contended": contended,
    }
    # The full ~170-query map is ~7 KB; the round driver captures only
    # the LAST 2000 chars of stdout, so a full-map stdout line arrives
    # truncated and unparseable (r7/r8 artifacts have "parsed": null).
    # Two-channel fix: the complete record goes to BENCH_FULL.json (a
    # committed repo artifact), and stdout carries ONE digest line that
    # fits the capture window — totals for every query plus the
    # per-query rows under active perf watch (streaming family,
    # scale-study operators, headline).
    full_path = Path(__file__).resolve().parent / "BENCH_FULL.json"
    stream_family = [q for q in times if q.startswith("op_stream_")] + [
        "op_near_dup_incremental",
        "op_curate_stream",
    ]
    watch = stream_family + [
        "op_curate_corpus",
        "op_minhash_dups",
        "op_ngram_jaccard",
        "op_dedup_clusters",
        "op_embedding_dups",
        "op_semantic_dedup",
        # bare rows: the operator-only regression surface (the
        # instrumented gates above also pay their in-query oracles)
        "op_semantic_dedup_bare",
        "op_lsh_topk_bare",
        "op_ivf_topk_bare",
        "op_knn_skew",
        "op_langid",
        "op_bm25",
        "op_line_dedup",
        "pql_sequence_detect",
        "pql_session_count",
        "pql_scan_funnel",
        "pql_scan_var_window",
        "pql_q1_pricing",
        "pql_count",
    ]
    digest_q = {q: times[q] for q in watch if q in times}
    # extra rows flagged at run time — these are the rows someone
    # explicitly asked to see, so under overflow they are evicted LAST
    env_keys = {
        q
        for q in os.environ.get("SPARK_GRAFT_BENCH_WATCH", "").split(",")
        if q in times
    }
    for q in env_keys:
        digest_q[q] = times[q]
    stream_total = round(
        sum(times[q] for q in stream_family if q in times and times[q] == times[q]),
        3,
    )
    # revised-target check (VERDICT r10 item 4, de-noised r12): per-gate
    # delta over the measured startup floors + the 8-gate family sum,
    # recorded and flagged so the ≤14 s target is machine-checked, not
    # prose.  The tight 0.5 s per-delta check only fires on records
    # whose own noise instruments are clean; 2× floor exceedance and
    # the family sum are hard regardless (compute_stream_flag).  Note
    # stream_family_sec is the WIDER 10-row sum (8 op_stream_* gates
    # plus op_near_dup_incremental and op_curate_stream); the target
    # applies to stream8_family_sec.
    session_clean = compute_session_clean(
        contended, sentinel_first, sentinel_last, load_at_launch[0], ncpu
    )
    # hard-bar inflation: the micro-batch path's measured slowdown in
    # THIS session, from whichever stream sentinel read slower (the
    # family gates are spread through the sweep, so contention at
    # either end counts)
    stream_inflation = round(
        max(stream_sentinel_first, stream_sentinel_last)
        / _STREAM_SENTINEL_REF,
        3,
    )
    stream_deltas, stream8_total, stream_perf_flag = compute_stream_flag(
        times, session_clean, inflation=stream_inflation
    )
    full_record["stream8_family_sec"] = stream8_total
    full_record["stream_floor_deltas"] = stream_deltas
    full_record["stream_inflation"] = stream_inflation
    full_record["stream_perf_flag"] = stream_perf_flag
    full_record["session_clean"] = session_clean
    # evidence-freshness summary (VERDICT r11 item 7): the bench record
    # itself reproduces the "no evidence older than rN" claim from the
    # committed CORRECTNESS files — tools/evidence_freshness.py has the
    # full per-gate view
    try:
        sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))
        from evidence_freshness import collect as _ef_collect

        _ef = _ef_collect()
        full_record["evidence_freshness"] = {
            "oldest_green_round": _ef["oldest_green_round"],
            "latest_green_histogram": _ef["latest_green_histogram"],
            "gates_hash_green_ever": _ef["gates_hash_green_ever"],
        }
    except Exception:  # noqa: BLE001 — no CORRECTNESS files yet
        full_record["evidence_freshness"] = None
    full_path.write_text(json.dumps(full_record) + "\n")
    digest = dict(full_record)
    digest["queries"] = digest_q
    digest["n_queries"] = len(times)
    digest["stream_family_sec"] = stream_total
    digest["full_record"] = "BENCH_FULL.json"
    line = json.dumps(digest, separators=(",", ":"))
    while len(line) > 1900 and digest_q:  # stay inside the 2000-char tail
        # evict from the static watch tail first; env-requested rows
        # only go once nothing else remains
        evictable = [q for q in digest_q if q not in env_keys] or list(
            digest_q
        )
        digest_q.pop(evictable[-1])
        line = json.dumps(digest, separators=(",", ":"))
    print(line)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
