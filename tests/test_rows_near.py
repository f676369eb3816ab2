"""``evaluate rows_near`` (KQL plugin): context rows around matches,
compiled to one bounded-frame window max — no self-join."""

from __future__ import annotations

import pytest

from pql_spark import PqlEngine
from pql_spark.parser import QueryError


@pytest.fixture(scope="module")
def engine(spark):
    ev = spark.createDataFrame(
        [
            (i, f"u{i % 2}", "alert" if i in (5, 12) else "noise")
            for i in range(20)
        ],
        "seq long, user string, kind string",
    )
    ev.createOrReplaceTempView("ev")  # for the SQL-text backend
    return PqlEngine(spark, {"ev": ev})


def _py_reference(before, after, part_by_user=False):
    """Keep seq i iff an alert (5 or 12) lies within the frame, per
    serialized (optionally per-user) order."""
    rows = [(i, i % 2) for i in range(20)]
    keep = []
    for i, u in rows:
        grp = [s for s, gu in rows if not part_by_user or gu == u]
        pos = grp.index(i)
        lo, hi = max(0, pos - after), min(len(grp) - 1, pos + before)
        if any(grp[j] in (5, 12) for j in range(lo, hi + 1)):
            keep.append(i)
    return sorted(keep)


def test_symmetric(engine):
    out = engine.query(
        'ev | sort by seq asc | evaluate rows_near(kind == "alert", 2)'
    )
    assert sorted(r.seq for r in out.collect()) == _py_reference(2, 2)


def test_asymmetric(engine):
    out = engine.query(
        'ev | sort by seq asc | evaluate rows_near(kind == "alert", 2, 0)'
    )
    assert sorted(r.seq for r in out.collect()) == _py_reference(2, 0)


def test_partitioned_by_serialize(engine):
    out = engine.query(
        "ev | sort by seq asc | serialize by user"
        ' | evaluate rows_near(kind == "alert", 1)'
    )
    assert sorted(r.seq for r in out.collect()) == _py_reference(
        1, 1, part_by_user=True
    )


def test_sql_backend_equivalent(engine, spark):
    for q in (
        'ev | sort by seq asc | evaluate rows_near(kind == "alert", 2)',
        'ev | sort by seq asc | evaluate rows_near(kind == "alert", 0, 3)',
        "ev | sort by seq asc | serialize by user"
        ' | evaluate rows_near(kind == "alert", 1)',
    ):
        df_rows = sorted(map(tuple, engine.query(q).collect()))
        sql_rows = sorted(map(tuple, spark.sql(engine.to_sql(q)).collect()))
        assert df_rows == sql_rows, q


def test_requires_order(engine):
    with pytest.raises(QueryError, match="requires a preceding"):
        engine.query('ev | evaluate rows_near(kind == "alert", 2)')
    with pytest.raises(QueryError, match="integer row count"):
        engine.query(
            'ev | sort by seq asc | evaluate rows_near(kind == "x", seq)'
        )
