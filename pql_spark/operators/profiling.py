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

    def _sl(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    # driver-cost note: every aggregate / struct entry is emitted as
    # SQL text (one F.expr parse each) — the per-column Column-API
    # build cost ~0.4 s of py4j round trips per call (r15, measured)
    aggs = [F.expr("count(1)").alias("__pf_n")]
    for i, c in enumerate(names):
        col = f"`{c}`"
        aggs.append(
            F.expr(f"sum(CAST(({col} IS NULL) AS BIGINT))").alias(
                f"__pf_nn{i}"
            )
        )
        nd = (
            f"approx_count_distinct({col}, {float(rsd)!r}D)"
            if approx
            else f"count(DISTINCT {col})"
        )
        aggs.append(F.expr(nd).alias(f"__pf_nd{i}"))
        if isinstance(dtypes[c], _NUMERIC):
            aggs.append(
                F.expr(f"CAST(min({col}) AS DOUBLE)").alias(
                    f"__pf_mn{i}"
                )
            )
            aggs.append(
                F.expr(f"CAST(max({col}) AS DOUBLE)").alias(
                    f"__pf_mx{i}"
                )
            )
        else:
            aggs.append(
                F.expr("CAST(NULL AS DOUBLE)").alias(f"__pf_mn{i}")
            )
            aggs.append(
                F.expr("CAST(NULL AS DOUBLE)").alias(f"__pf_mx{i}")
            )
    one = (
        df.groupBy(F.col(f"`{group_by}`")).agg(*aggs)
        if group_by is not None
        else df.agg(*aggs)
    )

    entries = ", ".join(
        "named_struct("
        f"'column', {_sl(c)}, "
        f"'dtype', {_sl(dtypes[c].simpleString())}, "
        "'n', __pf_n, "
        f"'n_null', coalesce(__pf_nn{i}, 0), "
        f"'n_distinct', coalesce(__pf_nd{i}, 0), "
        f"'min_num', __pf_mn{i}, "
        f"'max_num', __pf_mx{i})"
        for i, c in enumerate(names)
    )
    lead = [F.col(f"`{group_by}`")] if group_by is not None else []
    return one.select(
        *lead, F.expr(f"explode(array({entries}))").alias("__pf")
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
    v = F.expr(f"CAST(`{col}` AS DOUBLE)")
    # SQL-text expressions (one F.expr parse each) — see the
    # profile_columns driver-cost note
    if lo is not None and hi is not None:
        if not lo < hi:
            raise ValueError("need lo < hi")
        lo_s, hi_s = f"{float(lo)!r}D", f"{float(hi)!r}D"
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
        lo_s, hi_s = "__h_lo", "__h_hi"
    width = f"(({hi_s}) - ({lo_s})) / {float(bins)!r}D"
    raw = f"CAST(floor((__h_v - ({lo_s})) / ({width})) AS INT)"
    # degenerate single-value range: everything in bin 0
    bin_ = (
        f"CASE WHEN ({width}) > 0 "
        f"THEN least({bins - 1}, greatest(0, {raw})) ELSE 0 END"
    )
    counts = (
        base.select(
            F.expr(bin_).alias("bin"),
            F.expr(lo_s).alias("__lo"),
            F.expr(width).alias("__w"),
        )
        .groupBy("bin", "__lo", "__w")
        .agg(F.expr("count(1)").alias("n"))
    )
    return counts.select(
        "bin",
        F.expr("__lo + bin * __w").alias("lo"),
        F.expr("__lo + (bin + 1) * __w").alias("hi"),
        "n",
    ).orderBy("bin")
