"""Temporal joins: as-of (point-in-time) and interval-range joins.

Neither exists in the reference language (its engine, ClickHouse, has
ASOF JOIN but pql never emits it — `parser/parser.go:742-746` rejects
every flavor except inner/innerunique/leftouter), and Spark lacks both
natively: a naive formulation (`l.ts >= r.ts` + window, or
`l.ts BETWEEN r.lo AND r.hi`) plans a BroadcastNestedLoopJoin — O(n·m)
and a guaranteed non-starter at 100 TB.  These implementations restore
linear-ish scaling:

- as-of: union both sides tagged, ONE shuffle on the key, and a running
  last-value window — the sort-merge formulation every time-series
  store uses.
- range: bucketize the time axis, explode intervals to the buckets they
  overlap, equi-join on (key, bucket), post-filter exactly — turns the
  nested loop into a hash join with bounded fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | None = None,
    right_on: str | None = None,
    suffix: str = "_r",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before
    (``direction="backward"``, ``right.ts <= left.ts`` — pandas
    ``merge_asof`` / DuckDB ``ASOF JOIN`` default) or at-or-after
    (``direction="forward"``) per ``by`` key; left-outer flavor.
    ``tolerance`` (e.g. ``"15 minutes"``) voids matches further than
    that gap — the matched columns become NULL.

    Plan shape: tag + unionByName + window(last over unbounded
    preceding) + filter.  One shuffle on (by, ts); no nested loop; state
    per partition is one running row.  At 100 TB this is the same cost
    profile as any keyed window — and with both inputs bucketed on
    ``by`` the shuffle disappears too.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction!r}")
    right_on = right_on or on
    lcols = left.columns
    rcols = [c for c in right.columns if c != right_on and c != by]
    out_names = {c: (c + suffix if c in lcols else c) for c in rcols}

    tagged_r = right.select(
        *([F.col(by)] if by else []),
        F.col(right_on).alias(on),
        F.lit(0).alias("__src"),
        F.col(right_on).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
    )
    tagged_l = left.select(
        *([F.col(by)] if by else []),
        F.col(on),
        F.lit(1).alias("__src"),
        *[F.col(c) for c in lcols if c != on and c != by],
    )
    tagged_l = tagged_l.withColumn("__r_ts", F.lit(None))
    for c in rcols:
        tagged_l = tagged_l.withColumn(f"__r_{c}", F.lit(None))
    unioned = tagged_r.unionByName(tagged_l, allowMissingColumns=True)

    # backward: ascending scan, right rows sort BEFORE left at equal ts
    # (__src 0 < 1) so a same-timestamp right row is visible (<=).
    # forward: the mirror image — descending scan, right still first.
    order = (
        [F.col(on).asc(), F.col("__src").asc()]
        if direction == "backward"
        else [F.col(on).desc(), F.col("__src").asc()]
    )
    w = (
        Window.partitionBy(*([by] if by else []))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill_cols = ["__r_ts", *[f"__r_{c}" for c in rcols]]
    filled = unioned.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in fill_cols
        ],
    )
    in_tolerance = F.lit(True)
    if tolerance is not None:
        gap = (
            F.col(on) - F.col("__f___r_ts")
            if direction == "backward"
            else F.col("__f___r_ts") - F.col(on)
        )
        in_tolerance = gap <= F.expr(f"INTERVAL {tolerance}")
    out = filled.filter(F.col("__src") == 1).select(
        *([F.col(by)] if by else []),
        F.col(on),
        *[F.col(c) for c in lcols if c != on and c != by],
        *[
            F.when(in_tolerance, F.col(f"__f___r_{c}"))
            .alias(out_names[c])
            for c in rcols
        ],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    ts: str = "ts",
    lo: str = "lo",
    hi: str = "hi",
    by: str | None = None,
    bucket: str = "1 hour",
) -> DataFrame:
    """Inner join of point rows to interval rows:
    ``right.lo <= left.ts <= right.hi`` (optionally also equal on
    ``by``).

    Intervals explode to every ``bucket`` they overlap; points map to
    one bucket; the join becomes an equi-join on (by, bucket) with an
    exact post-filter.  Fan-out = interval length / bucket — pick
    ``bucket`` near the typical interval length.
    """
    from pql_spark.functions import _duration_usec
    from pql_spark.lexer import Span

    usec = _duration_usec(bucket, Span(0, 0))
    lpt = left.withColumn(
        "__bucket", (F.unix_micros(F.col(ts)) / F.lit(usec)).cast("long")
    )
    rint = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_micros(F.col(lo)) / F.lit(usec)).cast("long"),
                (F.unix_micros(F.col(hi)) / F.lit(usec)).cast("long"),
            )
        ),
    )
    keys = ["__bucket"] + ([by] if by else [])
    joined = lpt.join(rint, keys, "inner").filter(
        (F.col(lo) <= F.col(ts)) & (F.col(ts) <= F.col(hi))
    )
    return joined.drop("__bucket")
