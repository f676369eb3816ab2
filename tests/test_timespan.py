"""EXTENSION: bare timespan literals (`1h`, `30m`, `1.5d`) and
`datetime(...)` literals (KQL; the reference lexes `1h` as NUMBER+IDENT
— a parse error in every expression context — so no reference query
changes meaning).  Timespans compile to Spark day-time intervals;
native timestamp arithmetic and comparisons apply."""

from __future__ import annotations

import datetime as dt

import pytest

from pql_spark import PqlEngine, QueryError, compile_to_sql
from pql_spark.lexer import LexError, TokenKind, scan


# ------------------------------------------------------------------ lexer

@pytest.mark.parametrize(
    "src,usec",
    [
        ("1h", 3_600_000_000),
        ("30m", 1_800_000_000),
        ("1.5d", 129_600_000_000),
        ("10s", 10_000_000),
        ("250ms", 250_000),
        ("5microseconds", 5),
        ("2days", 172_800_000_000),
        ("1e2s", 100_000_000),
    ],
)
def test_lex_timespan(src, usec):
    toks = scan(src)
    assert len(toks) == 1
    assert toks[0].kind is TokenKind.TIMESPAN
    assert int(toks[0].value) == usec


def test_lex_timespan_sub_microsecond_rejected():
    with pytest.raises(LexError):
        scan("0.5microseconds")


def test_lex_non_unit_suffix_still_number_plus_ident():
    toks = scan("5x")
    assert [t.kind for t in toks] == [TokenKind.NUMBER, TokenKind.IDENT]
    # a unit name NOT attached to a number is an ordinary identifier
    toks = scan("h")
    assert toks[0].kind is TokenKind.IDENT


def test_hex_not_a_timespan():
    toks = scan("0x1d")  # hex digits, not 1-day
    assert toks[0].kind is TokenKind.NUMBER
    assert toks[0].value == str(0x1D)


# ------------------------------------------------------------- engine

@pytest.fixture(scope="module")
def tables(spark):
    t = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (2, "2024-01-01 06:30:00"),
            (3, "2024-01-01 11:59:59"),
            (4, "2024-01-02 00:00:00"),
        ],
        "id long, ts_str string",
    ).selectExpr("id", "CAST(ts_str AS TIMESTAMP) AS ts")
    return {"T": t}


@pytest.fixture(scope="module")
def engine(spark, tables):
    return PqlEngine(spark, resolver=tables)


def test_datetime_literal_filter(engine):
    out = engine.query(
        "T | where ts >= datetime(2024-01-01 06:00:00) | project id"
    )
    assert sorted(r.id for r in out.collect()) == [2, 3, 4]


def test_datetime_plus_timespan(engine):
    out = engine.query(
        "T | where ts < datetime(2024-01-01) + 12h | project id"
    )
    assert sorted(r.id for r in out.collect()) == [1, 2, 3]


def test_timestamp_difference_vs_timespan(engine):
    # ts2 - ts1 yields an interval comparable against a timespan literal
    out = engine.query(
        "T | extend age = datetime(2024-01-02) - ts"
        " | where age > 18h | project id"
    )
    # ages: 24h, 17.5h, ~12h, 0 — only id=1 exceeds 18h
    assert sorted(r.id for r in out.collect()) == [1]


def test_bin_with_bare_timespan(engine):
    out = engine.query(
        "T | summarize n = count() by b = bin(ts, 6h) | sort by b asc"
    )
    rows = [(r.b, r.n) for r in out.collect()]
    assert rows == [
        (dt.datetime(2024, 1, 1, 0), 1),
        (dt.datetime(2024, 1, 1, 6), 2),
        (dt.datetime(2024, 1, 2, 0), 1),
    ]


def test_ago_bare_timespan(engine):
    out = engine.query("T | where ts > ago(1h) | count")
    assert out.head()[0] == 0  # fixture data is in 2024


def test_make_series_bare_timespan_step(engine):
    out = engine.query(
        "T | make-series n = count() on ts from datetime(2024-01-01)"
        " to datetime(2024-01-02) step 12h"
    )
    row = out.head()
    # empty bins fill with the series default (null when omitted),
    # same as the string-step path
    assert list(row.n) == [3, None]


def test_datetime_fractional_seconds(engine):
    out = engine.query(
        "T | project d = datetime(2024-01-01T06:30:00.250)"
        " | where d - 250ms == datetime(2024-01-01 06:30:00) | count"
    )
    assert out.head()[0] == 4


def test_datetime_bad_text_rejected(engine):
    with pytest.raises(QueryError):
        engine.query("T | project d = datetime(not a date)")


@pytest.mark.parametrize(
    "q",
    [
        "T | where ts >= datetime(2024-01-01 06:00:00) | project id",
        "T | where ts < datetime(2024-01-01) + 12h | project id",
        "T | summarize n = count() by b = bin(ts, 6h) | sort by b asc",
        "T | make-series n = count() on ts from datetime(2024-01-01)"
        " to datetime(2024-01-02) step 6h | mv-expand n",
        "T | extend age = datetime(2024-01-02) - ts | where age > 18h"
        " | project id",
    ],
)
def test_sql_backend_equivalence(spark, tables, engine, q):
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    a = sorted(map(str, engine.query(q).collect()))
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    b = sorted(map(str, spark.sql(sql).collect()))
    assert a == b
