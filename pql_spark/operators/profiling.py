"""Dataset profiling: per-column statistics for corpus QA.

The validation step every large-scale data pipeline runs before (and
after) expensive transforms: row/null/distinct counts and numeric
ranges per column, computed in ONE aggregation pass so a 100 TB table
is scanned once.

Scale notes: ``approx=True`` (the default) uses HyperLogLog++
(``approx_count_distinct``) — a single mergeable sketch per column,
one map-side-combined aggregate, no shuffle amplification.
``approx=False`` switches to exact ``count(DISTINCT col)`` per
column; Spark rewrites multiple distinct aggregates with an Expand
(one replicated stream per distinct column), so the scan cost
multiplies by the column count — the right choice for oracle checks
and modest tables, the wrong one at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile_columns", "numeric_histogram"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    approx: bool = True,
    rsd: float = 0.05,
    group_by: str | None = None,
) -> DataFrame:
    """One row per profiled column:
    ``(column string, dtype string, n long, n_null long,
    n_distinct long, min_num double, max_num double)``.

    ``n_distinct`` ignores NULLs (SQL ``count(DISTINCT col)``
    semantics); ``min_num``/``max_num`` are populated for numeric
    columns and NULL otherwise, so the schema is stable across mixed
    tables.  All statistics come from a single ``agg`` over the input
    — one scan — then a narrow explode reshapes the 1-row result into
    the per-column table.

    ``group_by``: profile per group instead of globally (the per-source
    / per-language QA view) — the single pass becomes one ``groupBy``
    with the same aggregates, output gains the group column first, and
    scale behavior is unchanged (|groups| × |cols| result rows).
    """
    names = list(cols) if cols is not None else list(df.columns)
    if group_by is not None:
        if group_by not in df.columns:
            raise ValueError(
                f"profile_columns: unknown group column {group_by!r}"
            )
        names = [c for c in names if c != group_by]
    missing = [c for c in names if c not in df.columns]
    if missing:
        raise ValueError(f"profile_columns: unknown columns {missing}")
    dtypes = {f.name: f.dataType for f in df.schema.fields}

    aggs = [F.count(F.lit(1)).alias("__pf_n")]
    for i, c in enumerate(names):
        col = F.col(f"`{c}`")
        aggs.append(
            F.sum(col.isNull().cast("long")).alias(f"__pf_nn{i}")
        )
        nd = (
            F.approx_count_distinct(col, rsd)
            if approx
            else F.count_distinct(col)
        )
        aggs.append(nd.alias(f"__pf_nd{i}"))
        if isinstance(dtypes[c], _NUMERIC):
            aggs.append(F.min(col).cast("double").alias(f"__pf_mn{i}"))
            aggs.append(F.max(col).cast("double").alias(f"__pf_mx{i}"))
        else:
            aggs.append(
                F.lit(None).cast("double").alias(f"__pf_mn{i}")
            )
            aggs.append(
                F.lit(None).cast("double").alias(f"__pf_mx{i}")
            )
    one = (
        df.groupBy(F.col(f"`{group_by}`")).agg(*aggs)
        if group_by is not None
        else df.agg(*aggs)
    )

    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.lit(dtypes[c].simpleString()).alias("dtype"),
            F.col("__pf_n").alias("n"),
            F.coalesce(F.col(f"__pf_nn{i}"), F.lit(0)).alias("n_null"),
            F.coalesce(F.col(f"__pf_nd{i}"), F.lit(0)).alias(
                "n_distinct"
            ),
            F.col(f"__pf_mn{i}").alias("min_num"),
            F.col(f"__pf_mx{i}").alias("max_num"),
        )
        for i, c in enumerate(names)
    ]
    lead = [F.col(f"`{group_by}`")] if group_by is not None else []
    return one.select(
        *lead, F.explode(F.array(*entries)).alias("__pf")
    ).select(*lead, "__pf.*")


def numeric_histogram(
    df: DataFrame,
    col: str,
    bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column:
    ``(bin int, lo double, hi double, n long)`` — the distribution
    check behind every quality-score / length / perplexity cutoff
    decision in a curation pipeline.

    With explicit ``lo``/``hi`` this is ONE narrow pass + one
    ``bins``-row aggregate (values outside [lo, hi) are clamped into
    the edge bins, the standard histogram-tail convention).  Without
    bounds, a first 1-row min/max aggregate is broadcast back (the
    same totals device as the other operators) — two scans total, no
    driver collect.  The top bin is closed ([.., hi]) so max lands in
    bin ``bins-1``.
    """
    if bins <= 0:
        raise ValueError("bins must be positive")
    v = F.col(f"`{col}`").cast("double")
    if lo is not None and hi is not None:
        if not lo < hi:
            raise ValueError("need lo < hi")
        bounds = None
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
        base = df.select(v.alias("__h_v")).filter(
            F.col("__h_v").isNotNull()
        )
    else:
        bounds = df.agg(
            F.min(v).alias("__h_lo"), F.max(v).alias("__h_hi")
        )
        base = (
            df.select(v.alias("__h_v"))
            .filter(F.col("__h_v").isNotNull())
            .crossJoin(F.broadcast(bounds))
        )
        lo_c, hi_c = F.col("__h_lo"), F.col("__h_hi")
    width = (hi_c - lo_c) / F.lit(float(bins))
    raw = F.floor((F.col("__h_v") - lo_c) / width).cast("int")
    bin_ = F.least(
        F.lit(bins - 1), F.greatest(F.lit(0), raw)
    )
    # degenerate single-value range: everything in bin 0
    bin_ = F.when(width > 0, bin_).otherwise(F.lit(0))
    counts = (
        base.select(
            bin_.alias("bin"),
            lo_c.alias("__lo"),
            width.alias("__w"),
        )
        .groupBy("bin", "__lo", "__w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counts.select(
        "bin",
        (F.col("__lo") + F.col("bin") * F.col("__w")).alias("lo"),
        (F.col("__lo") + (F.col("bin") + 1) * F.col("__w")).alias("hi"),
        "n",
    ).orderBy("bin")
