"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark and the
matching ``oracle_sql()`` through DuckDB on the same parquet tables, then
compares row count, column names, and values (columns sorted by name,
floats rounded) — approximating the driver's hash compare.

Usage: python tools/check_oracle.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from pql_spark.sources import build_session  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (list, tuple, dict)):
        # the driver's pandas row-sort raises on unhashable cells — an
        # array/map/struct in a final output is a guaranteed driver FAIL
        raise TypeError(
            f"non-scalar cell in output ({type(v).__name__}): driver "
            "hash-compare cannot sort it"
        )
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows), key=repr
    )
    return sorted_cols, out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = build_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # spark-written directory table (e.g. .scratch/sf1)
            con.execute(
                f"CREATE VIEW {t} AS SELECT *"
                f" FROM read_parquet('{p}/*.parquet')"
            )
        elif p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            otypes = [str(t) for t in rel.types]
            orows = [tuple(r) for r in rel.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        # HUGEINT guard: DuckDB widens BIGINT arithmetic/window sums to
        # int128, which the driver's value hash treats differently from
        # Spark's long even when the numbers match (the exact failure
        # class behind the 2-round-red pql_activity_metrics) — the
        # numeric normalization below would HIDE it, so flag it here
        huge = [c for c, t in zip(ocols, otypes) if "HUGEINT" in t.upper()]
        if huge:
            print(
                f"FAIL  {name}: oracle returns HUGEINT column(s)"
                f" {huge} — CAST(... AS BIGINT) in the oracle SQL"
            )
            failures.append(name)
            continue
        sc, sr = _normalize(scols, srows)
        oc, orn = _normalize(ocols, orows)
        dt = time.time() - t0
        if sc != oc:
            print(f"FAIL  {name}: columns {sc} != {oc}")
            failures.append(name)
        elif len(sr) != len(orn):
            print(f"FAIL  {name}: rowcount {len(sr)} != {len(orn)}")
            failures.append(name)
        elif sr != orn:
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(sr, orn)) if a != b
            )
            print(f"FAIL  {name}: values differ at sorted-row "
                  f"{diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}")
            failures.append(name)
        else:
            print(f"ok    {name}: {len(sr)} rows [{dt:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
