"""EXTENSION KQL functions added in round 3: parse_url/parse_urlquery,
totimespan, make_bag[_if], percentile/percentilew/percentilesw (0-100
scale), binary_all_and/or/xor aggregates."""

from __future__ import annotations

import datetime as dt

import pytest

from pql_spark import PqlEngine, QueryError, compile_to_sql


@pytest.fixture(scope="module")
def tables(spark):
    t = spark.createDataFrame(
        [
            (1, "https://user:pw@example.com:8080/a/b?x=1&y=2#frag",
             "01:30:00", 2, 5.0),
            (2, "http://example.org/path", "1.00:00:30.5", 3, 7.0),
            (3, "not a url", "bogus", 2, 9.0),
        ],
        "id long, url string, dur string, w int, v double",
    )
    return {"T": t}


@pytest.fixture(scope="module")
def engine(spark, tables):
    return PqlEngine(spark, resolver=tables)


def test_parse_url_fields(engine):
    r = engine.query(
        "T | where id == 1 | extend u = parse_url(url)"
        " | project s = u.Scheme, h = u.Host, p = u.Port,"
        ' pa = u.Path, un = u.Username, pw = u.Password,'
        ' f = u.Fragment, x = u.QueryParameters["x"]'
    ).head()
    assert (r.s, r.h, r.p, r.pa, r.un, r.pw, r.f, r.x) == (
        "https", "example.com", "8080", "/a/b", "user", "pw",
        "frag", "1",
    )


def test_parse_url_invalid_is_null(engine):
    r = engine.query(
        "T | where id == 3 | extend u = parse_url(url)"
        " | project h = u.Host"
    ).head()
    assert r.h is None


def test_parse_urlquery(engine):
    r = engine.query(
        'T | where id == 1 | project m = parse_urlquery("?a=1&b=two")'
        ' | project a = m["a"], b = m["b"]'
    ).head()
    assert (r.a, r.b) == ("1", "two")


def test_totimespan_forms(engine):
    out = engine.query(
        "T | project id, s = (datetime(1970-01-01) + totimespan(dur))"
        " | sort by id asc"
    ).collect()
    assert out[0].s == dt.datetime(1970, 1, 1, 1, 30, 0)
    assert out[1].s == dt.datetime(1970, 1, 2, 0, 0, 30, 500000)
    assert out[2].s is None


def test_totimespan_of_timespan_literal(engine):
    r = engine.query(
        "T | where id == 1"
        " | project ok = totimespan(90m) == totimespan("
        '"01:30:00")'
    ).head()
    assert r.ok is True


def test_percentile_kql_scale(engine):
    r = engine.query(
        "T | summarize p = percentile(v, 50), lo = percentile(v, 0),"
        " hi = percentile(v, 100)"
    ).head()
    assert (r.p, r.lo, r.hi) == (7.0, 5.0, 9.0)


def test_percentilew_weights(engine):
    # weights 2,3,2 → multiset [5,5,7,7,7,9,9], median 7
    r = engine.query(
        "T | summarize pw = percentilew(v, w, 50),"
        " pws = percentilesw(v, w, 0, 50, 100)"
    ).head()
    assert r.pw == 7.0
    assert list(r.pws) == [5.0, 7.0, 9.0]


def test_binary_all_aggregates(engine):
    r = engine.query(
        "T | summarize a = binary_all_and(id), o = binary_all_or(id),"
        " x = binary_all_xor(id)"
    ).head()
    assert (r.a, r.o, r.x) == (0, 3, 0)  # 1&2&3, 1|2|3, 1^2^3


def test_make_bag_and_if(engine):
    r = engine.query(
        'T | extend b = bag_pack(strcat("k", tostring(id)),'
        " tostring(id))"
        " | summarize m = make_bag(b), mi = make_bag_if(b, id < 3)"
        " | project ks = strcat_array(array_sort_asc(bag_keys(m)),"
        ' ","), kis = strcat_array(array_sort_asc(bag_keys(mi)), ",")'
    ).head()
    assert r.ks == "k1,k2,k3"
    assert r.kis == "k1,k2"


def test_make_bag_first_wins_on_duplicate_keys(engine):
    r = engine.query(
        'T | extend b = bag_pack("same", tostring(id))'
        " | summarize m = make_bag(b)"
        ' | project n = array_length(bag_keys(m))'
    ).head()
    assert r.n == 1


@pytest.mark.parametrize(
    "q",
    [
        "T | extend u = parse_url(url) | project id, s = u.Scheme,"
        " h = u.Host, p = u.Port, f = u.Fragment,"
        ' x = u.QueryParameters["x"] | sort by id asc',
        'T | project id, m = parse_urlquery("a=1&b=2")["b"]'
        " | sort by id asc",
        "T | project id, s = (datetime(1970-01-01) + totimespan(dur))"
        " | sort by id asc",
        "T | summarize p = percentile(v, 50),"
        " pw = percentilew(v, w, 50), a = binary_all_and(id),"
        " o = binary_all_or(id), x = binary_all_xor(id)",
        'T | extend b = bag_pack(strcat("k", tostring(id)),'
        " tostring(id)) | summarize m = make_bag(b)"
        ' | project ks = strcat_array(array_sort_asc(bag_keys(m)), ",")',
    ],
)
def test_sql_backend_equivalence(spark, tables, engine, q):
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    a = sorted(map(str, engine.query(q).collect()))
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    b = sorted(map(str, spark.sql(sql).collect()))
    assert a == b


def test_bag_key_functions(spark):
    from pql_spark import PqlEngine, compile_to_sql

    df = spark.sql(
        "SELECT 1 AS id, map('a', 1, 'b', 2, 'c', 3) AS bag"
    )
    eng = PqlEngine(spark, resolver={"B": df})
    q = ("B | project id, h = bag_has_key(bag, \"a\"),"
         " nh = bag_has_key(bag, \"z\"),"
         " r = bag_remove_keys(bag, pack_array(\"a\", \"c\")),"
         " s = bag_set_key(bag, \"b\", 99),"
         " n = bag_set_key(bag, \"d\", 4)")
    row = eng.query(q).head()
    assert row.h is True and row.nh is False
    assert dict(row.r) == {"b": 2}
    assert dict(row.s) == {"a": 1, "c": 3, "b": 99}
    assert dict(row.n) == {"a": 1, "b": 2, "c": 3, "d": 4}
    df.createOrReplaceTempView("B")
    sql = compile_to_sql(q, lambda nm: df.columns)
    got = spark.sql(sql).head()
    assert dict(got.s) == dict(row.s) and dict(got.r) == dict(row.r)
