"""Round-4 operators: ``find in (…) where …`` multi-table source,
``reduce by`` wildcard-pattern clustering, and
``evaluate sequence_detect`` distributed funnel chains."""

from __future__ import annotations

import datetime as dt

import pytest

from pql_spark import PqlEngine, QueryError, compile_to_sql


@pytest.fixture(scope="module")
def tables(spark):
    a = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0)],
        "id long, user string, v double",
    )
    b = spark.createDataFrame(
        [(3, "alice", "x"), (4, "carol", "y")],
        "id long, user string, tag string",
    )
    logs = spark.createDataFrame(
        [
            ("user1 logged in from 10.0.0.1",),
            ("user22 logged in from 10.0.0.99",),
            ("deadbeefcafe1234 session start",),
            ("0123456789abcdef session start",),
            ("disk full",),
        ],
        "msg string",
    )
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # valid chain within windows
        (1, t0, "login"),
        (1, t0 + dt.timedelta(minutes=10), "download"),
        (1, t0 + dt.timedelta(minutes=30), "delete"),
        # step window (1h) exceeded between login and download
        (2, t0, "login"),
        (2, t0 + dt.timedelta(hours=2), "download"),
        (2, t0 + dt.timedelta(hours=2, minutes=5), "delete"),
        # two overlapping chains share later steps
        (3, t0, "login"),
        (3, t0 + dt.timedelta(minutes=5), "login"),
        (3, t0 + dt.timedelta(minutes=20), "download"),
        (3, t0 + dt.timedelta(minutes=25), "delete"),
        # span window: steps each within 1h but total span > 90m
        (4, t0, "login"),
        (4, t0 + dt.timedelta(minutes=55), "download"),
        (4, t0 + dt.timedelta(minutes=110), "delete"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, etype string"
    )
    return {"A": a, "B": b, "L": logs, "E": ev}


@pytest.fixture(scope="module")
def engine(spark, tables):
    return PqlEngine(spark, resolver=tables)


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=str)


# ----------------------------------------------------------------- find


def test_find_basic(engine):
    out = engine.query(
        'find in (A, B) where user == "alice" | sort by id asc'
    )
    assert out.columns == ["id", "user", "v", "source_", "tag"]
    rows = [(r.id, r.source_, r.v, r.tag) for r in out.collect()]
    assert rows == [(1, "A", 10.0, None), (3, "B", None, "x")]


def test_find_withsource_and_project(engine):
    out = engine.query(
        "find withsource = Src in (A, B) where id > 1"
        " project id, user, Src | sort by id asc"
    )
    assert out.columns == ["id", "user", "Src"]
    assert [tuple(r) for r in out.collect()] == [
        (2, "bob", "A"), (3, "alice", "B"), (4, "carol", "B"),
    ]


def test_find_single_table(engine):
    out = engine.query("find in (A) where v > 15 | project id")
    assert [r.id for r in out.collect()] == [2]


def test_find_is_still_a_table_name(spark):
    t = spark.createDataFrame([(9,)], "z long")
    eng = PqlEngine(spark, resolver={"find": t})
    assert eng.query("find | count").head()[0] == 1


def test_find_sql_backend(spark, tables, engine):
    q = 'find in (A, B) where user == "alice" | sort by id asc'
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    assert _rows(spark.sql(sql)) == _rows(engine.query(q))


def test_find_errors(engine):
    with pytest.raises(QueryError):
        engine.query("find in (A, B) project id")  # missing where


# ----------------------------------------------------------------- reduce


def test_reduce_by(engine):
    out = engine.query("L | reduce by msg | sort by Count desc, Pattern asc")
    rows = [tuple(r) for r in out.collect()]
    assert rows == [
        ("* session start", 2, "0123456789abcdef session start"),
        ("user* logged in from *.*.*.*", 2,
         "user1 logged in from 10.0.0.1"),
        ("disk full", 1, "disk full"),
    ]


def test_reduce_by_sql_backend(spark, tables, engine):
    q = "L | reduce by msg | sort by Count desc, Pattern asc"
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    assert _rows(spark.sql(sql)) == _rows(engine.query(q))


# ------------------------------------------------------- sequence_detect


_SEQ = """
E
| evaluate sequence_detect(ts, 1h, 90m,
    login = etype == "login",
    dl = etype == "download",
    rm = etype == "delete"
    by user_id)
| sort by user_id asc, login_ts asc
"""


def test_sequence_detect(engine):
    out = engine.query(_SEQ)
    assert out.columns == ["user_id", "login_ts", "dl_ts", "rm_ts"]
    t0 = dt.datetime(2024, 1, 1)
    rows = [tuple(r) for r in out.collect()]
    assert rows == [
        (1, t0, t0 + dt.timedelta(minutes=10),
         t0 + dt.timedelta(minutes=30)),
        (3, t0, t0 + dt.timedelta(minutes=20),
         t0 + dt.timedelta(minutes=25)),
        (3, t0 + dt.timedelta(minutes=5),
         t0 + dt.timedelta(minutes=20),
         t0 + dt.timedelta(minutes=25)),
    ]  # user 2: step window exceeded; user 4: span window exceeded


def test_sequence_detect_two_steps_no_keys(engine):
    out = engine.query(
        """
        E
        | where user_id == 1
        | evaluate sequence_detect(ts, 1h, 1h,
            a = etype == "login", b = etype == "delete")
        """
    )
    assert out.count() == 1


def test_sequence_detect_strictly_later(spark):
    # an event satisfying two consecutive steps at the SAME timestamp
    # must not chain to itself
    t0 = dt.datetime(2024, 1, 1)
    t = spark.createDataFrame(
        [(1, t0, "x"), (1, t0 + dt.timedelta(minutes=1), "x")],
        "k long, ts timestamp, e string",
    )
    eng = PqlEngine(spark, resolver={"T": t})
    out = eng.query(
        'T | evaluate sequence_detect(ts, 1h, 1h,'
        ' s1 = e == "x", s2 = e == "x" by k)'
    )
    rows = [tuple(r) for r in out.collect()]
    assert rows == [(1, t0, t0 + dt.timedelta(minutes=1))]


def test_sequence_detect_errors(engine):
    with pytest.raises(QueryError):
        engine.query(
            "E | evaluate sequence_detect(ts, 1h, 1h,"
            ' only = etype == "login" by user_id)'
        )  # < 2 steps
    with pytest.raises(QueryError):
        engine.query(
            "E | evaluate sequence_detect(nosuch, 1h, 1h,"
            ' a = etype == "login", b = etype == "delete")'
        )  # unknown timeline column
    with pytest.raises(QueryError):
        engine.query(
            "E | evaluate sequence_detect(ts, 1h, 1h,"
            ' a = etype == "login", b = etype == "delete" by ghost)'
        )  # unknown key column


def test_sequence_detect_sql_backend(spark, tables, engine):
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    a = _rows(engine.query(_SEQ))
    sql = compile_to_sql(_SEQ, lambda n: tables[n].columns)
    assert _rows(spark.sql(sql)) == a


def test_sequence_detect_sql_backend_ntz_schema(spark, tables):
    # TIMESTAMP_NTZ timeline: both backends must return step columns
    # of the ORIGINAL timeline type (ADVICE r14: the SQL twin used to
    # emit bare timestamp_micros(), silently upcasting ntz → ltz)
    ntz = tables["E"].selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "etype"
    )
    eng = PqlEngine(spark, resolver={"E": ntz})
    q = (
        "E | evaluate sequence_detect(ts, 1h, 90m,"
        ' a = etype == "login", b = etype == "delete" by user_id)'
    )
    df_out = eng.query(q)
    ntz.createOrReplaceTempView("E")
    sql_out = spark.sql(compile_to_sql(q, lambda n: ["user_id", "ts", "etype"]))
    assert [f.dataType.simpleString() for f in df_out.schema.fields] == [
        "bigint", "timestamp_ntz", "timestamp_ntz",
    ]
    assert df_out.schema == sql_out.schema
    assert _rows(df_out) == _rows(sql_out)


def test_sequence_detect_sql_backend_no_keys(spark, tables, engine):
    q = (
        "E | where user_id == 1 | evaluate sequence_detect(ts, 1h, 1h,"
        ' a = etype == "login", b = etype == "delete")'
    )
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    a = _rows(engine.query(q))
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    assert _rows(spark.sql(sql)) == a
