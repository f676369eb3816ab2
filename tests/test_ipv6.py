"""EXTENSION KQL IPv6 function family (SIEM surface): canonicalization,
prefix masking, compare/match/range membership — all pure Catalyst
expressions over a 32-nibble lowercase hex representation.  Reference
implementation for the tests: Python's stdlib ``ipaddress``."""

from __future__ import annotations

import ipaddress

import pytest

from pql_spark import PqlEngine, compile_to_sql

CASES = [
    "::1", "fe80::85d:e82c:9446:7994", "2001:db8::", "::",
    "1:2:3:4:5:6:7:8", "192.168.255.255", "10.0.0.1",
    "::ffff:1.2.3.4", "2001:DB8:0:0:0:0:1:1", "1::8",
    "0:0:0:0:0:0:0:1", "abcd:ef01:2345:6789:abcd:ef01:2345:6789",
    "1:2:3:4:5:6:77.77.88.88", "FE80::",
    # invalid forms — all must canonicalize to NULL
    "1:2:3:4:5:6:7:8::", "1::2::3", ":::", "garbage", "300.1.2.3",
    "1:2:3:4:5:6:7", "12345::", "g::1", "",
]


def _py_canon(s: str):
    try:
        ip = ipaddress.ip_address(s)
        if isinstance(ip, ipaddress.IPv4Address):
            ip = ipaddress.IPv6Address("::ffff:" + s)
        return ip
    except ValueError:
        return None


@pytest.fixture(scope="module")
def tables(spark):
    t = spark.createDataFrame(
        [(i, c) for i, c in enumerate(CASES)], "id long, ip string"
    )
    return {"T": t}


@pytest.fixture(scope="module")
def engine(spark, tables):
    return PqlEngine(spark, resolver=tables)


def test_parse_ipv6_matches_ipaddress(engine):
    out = engine.query("T | project id, c = parse_ipv6(ip) | sort by id asc")
    for r in out.collect():
        ip = _py_canon(CASES[r.id])
        assert r.c == (ip.exploded if ip is not None else None), CASES[r.id]


@pytest.mark.parametrize("prefix", [0, 1, 10, 48, 64, 97, 128])
def test_parse_ipv6_mask_matches_ipaddress(engine, prefix):
    out = engine.query(
        f"T | project id, m = parse_ipv6_mask(ip, {prefix})"
        " | sort by id asc"
    )
    for r in out.collect():
        ip = _py_canon(CASES[r.id])
        exp = (
            ipaddress.IPv6Network(
                (ip, prefix), strict=False
            ).network_address.exploded
            if ip is not None
            else None
        )
        assert r.m == exp, (CASES[r.id], prefix)


def test_ipv6_compare(engine):
    out = engine.query(
        'T | project id, c = ipv6_compare(ip, "192.168.255.255")'
        " | sort by id asc"
    )
    ref = _py_canon("192.168.255.255")
    for r in out.collect():
        ip = _py_canon(CASES[r.id])
        exp = None if ip is None else (ip > ref) - (ip < ref)
        assert r.c == exp, CASES[r.id]


def test_ipv6_is_match_min_prefix(engine):
    # effective prefix = min of both /suffixes and the explicit arg
    q = (
        'T | where id == 0 | project '
        'a = ipv6_is_match("fe80::1", "fe80:0:0:1::9/64"),'
        'b = ipv6_is_match("fe80::1/48", "fe80:0:0:1::9/64"),'
        'c = ipv6_is_match("fe80::1", "fe81::9", 15),'
        'd = ipv6_is_match("fe80::1", "fe81::9", 16)'
    )
    row = engine.query(q).head()
    assert (row.a, row.b, row.c, row.d) == (False, True, True, False)


def test_ipv6_is_in_range_and_any_range(engine):
    q = (
        "T | project id, r = ipv6_is_in_range(ip, \"fe80::/10\"),"
        " a = ipv6_is_in_any_range(ip, \"10.0.0.0/8\", \"2001:db8::/32\")"
        " | sort by id asc"
    )
    for r in engine.query(q).collect():
        ip = _py_canon(CASES[r.id])
        if ip is None:
            assert r.r is None and r.a is None
            continue
        assert r.r == (ip in ipaddress.IPv6Network("fe80::/10"))
        in10 = ip in ipaddress.IPv6Network("::ffff:10.0.0.0/104")
        # our 10.0.0.0/8 range is an IPv4 range: the /8 applies to the
        # v4-mapped form at bit offset 96
        v4 = None
        try:
            v4 = ipaddress.IPv4Address(CASES[r.id])
        except ValueError:
            pass
        exp_any = (
            v4 is not None and v4 in ipaddress.IPv4Network("10.0.0.0/8")
        ) or (ip in ipaddress.IPv6Network("2001:db8::/32"))
        assert r.a == exp_any, CASES[r.id]


def test_ipv4_is_match_and_any_range(engine):
    q = (
        'T | where id == 0 | project '
        'a = ipv4_is_match("192.168.1.5", "192.168.1.77/24"),'
        'b = ipv4_is_match("192.168.1.5", "192.168.2.5"),'
        'c = ipv4_is_match("192.168.1.5", "192.168.2.5", 16),'
        'd = ipv4_is_in_any_range("10.1.2.3", "11.0.0.0/8", "10.0.0.0/8"),'
        'e = ipv4_is_in_any_range("12.1.2.3", "11.0.0.0/8", "10.0.0.0/8")'
    )
    row = engine.query(q).head()
    assert (row.a, row.b, row.c, row.d, row.e) == (
        True, False, True, True, False
    )


def test_mask_of_invalid_is_null_not_empty(engine):
    # array_join drops nulls: masking NULL must yield NULL, not ':::::::'
    row = engine.query(
        'T | where id == 0 | project m = parse_ipv6_mask("junk", 64)'
    ).head()
    assert row.m is None


@pytest.mark.parametrize(
    "q",
    [
        "T | project id, c = parse_ipv6(ip) | sort by id asc",
        "T | project id, m = parse_ipv6_mask(ip, 48) | sort by id asc",
        'T | project id, c = ipv6_compare(ip, "::1") | sort by id asc',
        'T | project id, x = ipv6_is_match(ip, "fe80::/10")'
        " | sort by id asc",
        'T | project id, x = ipv6_is_in_any_range(ip, "10.0.0.0/8",'
        ' "::1/128") | sort by id asc',
        'T | project id, x = ipv4_is_match(ip, "192.168.0.9/16")'
        " | sort by id asc",
        'T | project id, x = ipv4_is_in_any_range(ip, "10.0.0.0/8",'
        ' "192.168.0.0/16") | sort by id asc',
    ],
)
def test_sql_backend_equivalence(spark, tables, engine, q):
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    a = sorted(map(str, engine.query(q).collect()))
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    b = sorted(map(str, spark.sql(sql).collect()))
    assert a == b
