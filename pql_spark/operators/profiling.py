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

__all__ = ["profile_columns"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    approx: bool = True,
    rsd: float = 0.05,
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
    """
    names = list(cols) if cols is not None else list(df.columns)
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
    one = df.agg(*aggs)

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
    return one.select(
        F.explode(F.array(*entries)).alias("__pf")
    ).select("__pf.*")
