"""PqlEngine backend="sql"/"auto" — the batched compile path (r11).

The SQL path must be bit-equal to the DataFrame compiler, register
referenced tables as temp views on the fly, honor params, and (auto)
fall back to the DataFrame compiler on the SQL backend's documented
refusals instead of erroring.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pql_spark import PqlEngine


@pytest.fixture(scope="module")
def tables(spark):
    ev = spark.createDataFrame(
        [(i, f"u{i % 3}", float(i * 7 % 50)) for i in range(40)],
        "event_id long, user string, value double",
    )
    dim = spark.createDataFrame(
        [("u0", "alpha"), ("u1", "beta"), ("u2", "gamma")],
        "user string, team string",
    )
    return {"EV": ev, "DIM": dim}


QUERIES = [
    "EV | where value > 10 | summarize n = count(), s = sum(value)"
    " by user | sort by user asc",
    "EV | join kind=leftouter (DIM) on user | top 5 by value"
    " | project event_id, team",
    "EV | extend bucket = iff(value >= 25, 'hi', 'lo')"
    " | summarize n = count() by bucket | sort by bucket asc",
]


@pytest.mark.parametrize("q", QUERIES)
def test_sql_backend_bit_equal(spark, tables, q):
    df_rows = sorted(
        map(tuple, PqlEngine(spark, resolver=tables).query(q).collect())
    )
    sql_rows = sorted(
        map(
            tuple,
            PqlEngine(spark, resolver=tables, backend="sql")
            .query(q)
            .collect(),
        )
    )
    assert sql_rows == df_rows and len(df_rows) > 0


def test_sql_backend_registers_referenced_views(spark, tables):
    eng = PqlEngine(spark, resolver=tables, backend="sql")
    eng.query("EV | join kind=inner (DIM) on user | count").collect()
    # the catalog stores view names case-insensitively (lowercased)
    names = {t.name.lower() for t in spark.catalog.listTables()}
    assert {"ev", "dim"} <= names


def test_sql_backend_params(spark, tables):
    eng = PqlEngine(
        spark, resolver=tables, params={"cut": 30}, backend="sql"
    )
    got = eng.query("EV | where value > cut | count").collect()
    want = tables["EV"].filter(F.col("value") > 30).count()
    assert got[0][0] == want


def test_auto_falls_back_on_multi_output(spark, tables):
    # facet is multi-output: compile_to_sql refuses, auto must fall
    # back to the DataFrame compiler's MultiResult
    eng = PqlEngine(spark, resolver=tables, backend="auto")
    res = eng.query(
        "EV | facet by user with ( summarize n = count() )"
    )
    from pql_spark import MultiResult

    assert isinstance(res, MultiResult)


def test_auto_falls_back_on_csv_externaldata(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,v\n1,2.0\n2,9.5\n")
    eng = PqlEngine(spark, resolver={}, backend="auto")
    q = (
        f'externaldata (id: long, v: real) ["{p}"]'
        ' with (format="csv", header="true") | where v > 5 | project id'
    )
    assert [r.id for r in eng.query(q).collect()] == [2]


def test_strict_sql_backend_raises_on_refusal(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id\n1\n")
    eng = PqlEngine(spark, resolver={}, backend="sql")
    with pytest.raises(Exception, match="DataFrame backend"):
        eng.query(
            f'externaldata (id: long) ["{p}"] with (format="csv")'
        )


def test_unknown_backend_rejected(spark, tables):
    with pytest.raises(ValueError, match="unknown backend"):
        PqlEngine(spark, resolver=tables, backend="fast")
