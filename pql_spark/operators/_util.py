"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rebalance(df: DataFrame) -> DataFrame:
    """Spread a under-partitioned input across the cluster's cores.

    Small single-file tables arrive as ONE input split, which would
    serialize every narrow stage of a compute-heavy operator onto one
    core.  A round-robin repartition to the default parallelism costs
    one small shuffle and buys full-width execution — the same layout a
    real multi-split dataset gets for free.  No-op when the input is
    already parallel enough (the 100 TB case: thousands of splits).

    The width probe must NOT execute the plan: ``df.rdd
    .getNumPartitions()`` under AQE materializes query stages — on a
    composed input it ran the caller's whole upstream chain as an
    extra job (measured 2.4 s at sf0.1 inside curate_corpus) before
    the caller executed it again.  Instead, two job-free checks: a
    leaf file count ≥ cores means the scan alone is wide, and any
    Exchange / InMemoryTableScan in the compiled physical plan means
    a shuffle (or a cached post-shuffle layout) already widens the
    plan to ``spark.sql.shuffle.partitions``."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        if len(df.inputFiles()) >= target:
            return df
        plan = df._jdf.queryExecution().sparkPlan().toString()
        if "Exchange" in plan or "InMemoryTableScan" in plan:
            return df
    except Exception:  # noqa: BLE001 — non-SQL-backed plans: play safe
        pass
    return df.repartition(target)


def sql_over(frames: dict[str, DataFrame], sql_fmt: str) -> DataFrame:
    """Run ONE ``spark.sql`` over temp views of the given frames.

    ``sql_fmt`` references each frame by ``{alias}``.  Driver-cost
    device (r16, guide §4's Python-boundary tax in its driver-side
    form): a chain of N DataFrame operations pays N py4j round trips
    AND N eager JVM analysis passes while building a plan; registering
    the input frames as temp views and parsing the whole downstream as
    one SQL statement yields the same analyzed tree in ONE pass.  The
    views are dropped before returning — the returned DataFrame holds
    its (already analyzed) plan, so the names only exist to address
    the subtrees inside the single parse.

    The views are NOT dropped here: ``dropTempView`` cascades an
    UNCACHE of every cache entry whose plan contains the view's plan
    (measured — it silently evicted the curation pipeline's persisted
    frames, turning three persists into no-ops), and the same applies
    to the parameterized ``spark.sql(..., df=frame)`` form, whose
    formatter drops its internal views.  Instead the uuid-named views
    are registered with the same session-lifecycle tracker as the
    persists and released by :func:`unpersist_tracked` (which bench
    and test harnesses already call between queries)."""
    spark = next(iter(frames.values())).sparkSession
    names: dict[str, str] = {}
    for alias, frame in frames.items():
        names[alias] = track_view(frame, alias)
    return spark.sql(sql_fmt.format(**names))


_TRACKED_VIEWS: list[tuple[object, str]] = []


def track_view(frame: DataFrame, alias: str = "v") -> str:
    """Register ``frame`` as a uuid-named temp view whose lifetime is
    managed by :func:`unpersist_tracked` (see :func:`sql_over` for why
    views must not be dropped eagerly).  Returns the view name."""
    from uuid import uuid4

    nm = f"__sq_{alias}_{uuid4().hex[:8]}"
    frame.createOrReplaceTempView(nm)
    _TRACKED_VIEWS.append((frame.sparkSession, nm))
    return nm


_TRACKED_PERSISTS: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` registered for later bulk eviction.

    Operators that persist an intermediate reused across several
    downstream branches (e.g. the shingle inverted index in the PPJoin
    path) return a LAZY result — they cannot unpersist before the
    caller materializes it, and Spark never auto-evicts cached plans.
    In a long session repeated calls would otherwise accumulate cached
    blocks in executor storage.  Callers (or test/bench harnesses) call
    :func:`unpersist_tracked` — or ``spark.catalog.clearCache()`` —
    once results are materialized."""
    _TRACKED_PERSISTS.append(df.persist())
    return df


def unpersist_tracked() -> int:
    """Evict every DataFrame registered via :func:`tracked_persist`
    (and drop every :func:`track_view` temp view); returns how many
    persists were released.  Safe at any time: Spark recomputes an
    evicted plan on next use."""
    n = len(_TRACKED_PERSISTS)
    while _TRACKED_PERSISTS:
        try:
            _TRACKED_PERSISTS.pop().unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — session already stopped
            pass
    while _TRACKED_VIEWS:
        spark, nm = _TRACKED_VIEWS.pop()
        try:
            spark.catalog.dropTempView(nm)
        except Exception:  # noqa: BLE001 — session already stopped
            pass
    return n


def pinned_filter(df: DataFrame, cond) -> DataFrame:
    """``df.filter(cond)`` WITHOUT predicate pushdown.

    Catalyst pushes filters below projections by SUBSTITUTING the
    referenced column's defining expression into the predicate — for a
    cheap predicate over an expensive derived column that (a) evaluates
    the whole tree twice (once in the sunk Filter, once in the Project
    above) and (b) can sink the tree below a repartition onto the
    narrow single-split pre-shuffle stage, serializing it on one core.
    Measured on the curation chain at sf0.1: quality/repetition filters
    went 0.8 s → 4.6 s from exactly this.

    The always-true ``spark_partition_id() >= 0`` guard marks the
    predicate non-deterministic, which pins the Filter exactly where
    it was written; the projection below stays collapsed and its tree
    evaluates ONCE per row.  (``rand() >= 0`` does NOT work — the
    optimizer range-folds it back to a deterministic predicate; the
    partition id is free to evaluate and survives optimization.)  Use
    only when the predicate references expensive computed columns —
    for scan-column predicates pushdown is the optimization, not the
    bug."""
    return df.filter(
        F.when(F.spark_partition_id() >= 0, cond).otherwise(F.lit(False))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join resilient to extreme key skew.

    When one join-key value dominates (the classic SIEM/user-activity
    hot key), a plain hash join puts that key's entire partition on one
    task.  AQE's skew-join splitting handles moderate skew; for the
    pathological case this spreads the LEFT side over ``salt``
    sub-partitions (deterministic hash of the whole row) and replicates
    the matching RIGHT rows to every sub-partition, so the hot key runs
    on ``salt`` tasks instead of one.  Result is exactly the plain
    join's (verified by tests); cost is ``salt``× replication of the
    right side — use with a small-to-medium right side.
    """
    if how not in ("inner", "left", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt_l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*left.columns), F.lit(salt))
    )
    salt_r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = salt_l.join(salt_r, [on, "__salt"], how)
    return out.drop("__salt")
