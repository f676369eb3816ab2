"""EXTENSION operators ``parse-where`` (pattern-matching row filter),
``parse-kv`` (delimited key-value extraction), and ``mv-expand … to
typeof(T)`` element casts (KQL surface; the reference rejects all
three, so no reference query changes meaning)."""

from __future__ import annotations

import pytest

from pql_spark import PqlEngine, QueryError, compile_to_sql


@pytest.fixture(scope="module")
def tables(spark):
    t = spark.createDataFrame(
        [
            (1, "level=info; code=200; msg=ok",
             "GET /api/users/42 HTTP/1.1", "1,2,3"),
            (2, "level=warn; code=404",
             "POST /api/items HTTP/1.1", "4,x,5"),
            (3, None, "garbage line", None),
        ],
        "id long, kv string, req string, nums string",
    )
    return {"T": t}


@pytest.fixture(scope="module")
def engine(spark, tables):
    return PqlEngine(spark, resolver=tables)


def test_parse_kv_defaults_and_types(engine):
    out = engine.query(
        'T | parse-kv kv as (level, code: long) with'
        ' (pair_delimiter="; ", kv_delimiter="=")'
        " | project id, level, code | sort by id asc"
    ).collect()
    assert [(r.id, r.level, r.code) for r in out] == [
        (1, "info", 200),
        (2, "warn", 404),
        (3, None, None),
    ]


def test_parse_kv_missing_key_is_null(engine):
    out = engine.query(
        'T | where id == 2 | parse-kv kv as (msg) with'
        ' (pair_delimiter="; ") | project msg'
    ).head()
    assert out.msg is None


def test_parse_kv_replaces_existing_column(engine):
    out = engine.query(
        'T | where id == 1 | parse-kv kv as (id: long, level) with'
        ' (pair_delimiter="; ") | project id, level'
    ).head()
    # key 'id' is absent in the kv text → NULL replaces the original
    assert out.id is None and out.level == "info"


def test_parse_kv_bad_property_rejected(engine):
    with pytest.raises(QueryError):
        engine.query('T | parse-kv kv as (a) with (bogus="x")')


def test_parse_where_drops_non_matching(engine):
    out = engine.query(
        'T | parse-where req with method " /api/" tail'
        " | project id, method, tail | sort by id asc"
    ).collect()
    assert [(r.id, r.method) for r in out] == [(1, "GET"), (2, "POST")]
    assert out[0].tail == "users/42 HTTP/1.1"


def test_parse_keeps_non_matching_with_empties(engine):
    out = engine.query(
        'T | parse req with method " /api/" tail | project id, method'
        " | sort by id asc"
    ).collect()
    assert [(r.id, r.method) for r in out] == [
        (1, "GET"), (2, "POST"), (3, ""),
    ]


def test_mv_expand_to_typeof(engine):
    out = engine.query(
        'T | where isnotnull(nums) | extend a = split(nums, ",")'
        " | mv-expand a to typeof(long)"
        " | summarize s = sum(a), n = count(), nulls = countif(isnull(a))"
    ).head()
    # "x" fails the cast → NULL (counted, not summed)
    assert (out.s, out.n, out.nulls) == (15, 6, 1)


def test_mv_expand_typeof_zip_form(engine):
    out = engine.query(
        'T | where id == 1 | extend a = split(nums, ","),'
        ' b = split("9,8", ",")'
        " | mv-expand a to typeof(long), b"
        " | project a, b | sort by a asc"
    ).collect()
    assert [(r.a, r.b) for r in out] == [(1, "9"), (2, "8"), (3, None)]


def test_mv_expand_typeof_unknown_type_rejected(engine):
    with pytest.raises(QueryError):
        engine.query("T | mv-expand nums to typeof(banana)")


@pytest.mark.parametrize(
    "q",
    [
        'T | parse-kv kv as (level, code: long) with'
        ' (pair_delimiter="; ", kv_delimiter="=")'
        " | project id, level, code | sort by id asc",
        'T | parse-where req with method " /api/" tail'
        " | project id, method, tail | sort by id asc",
        'T | where isnotnull(nums) | extend a = split(nums, ",")'
        " | mv-expand a to typeof(long) | sort by id asc, a asc",
        'T | where id == 1 | extend a = split(nums, ","),'
        ' b = split("9,8", ",") | mv-expand a to typeof(long), b'
        " | sort by a asc",
    ],
)
def test_sql_backend_equivalence(spark, tables, engine, q):
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    a = sorted(map(str, engine.query(q).collect()))
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    b = sorted(map(str, spark.sql(sql).collect()))
    assert a == b
