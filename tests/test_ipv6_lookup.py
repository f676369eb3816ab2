"""``evaluate ipv6_lookup`` (KQL plugin): CIDR-network membership join
over 128-bit addresses.  Reference implementation for the tests:
Python's stdlib ``ipaddress`` (v4-notation inputs/ranges mapped to the
``::ffff:a.b.c.d`` form at bit offset 96, like ``ipv6_is_in_range``).
Scale contract: broadcast hash equi-join on (prefix, masked hex canon)
— never a nested-loop range probe."""

from __future__ import annotations

import ipaddress

import pytest

from pql_spark import PqlEngine
from pql_spark.parser import QueryError

IPS = [
    "2001:db8::1",
    "2001:db8:0:1::5",
    "2001:db8:ffff::1",
    "::ffff:10.0.5.9",
    "10.0.5.9",  # v4 notation → ::ffff:10.0.5.9
    "fe80::1",
    "bogus",
    "2001:db8::ffff:ffff",
    "255.255.255.255",
    None,
]
NETS = [
    ("2001:db8::/32", "doc"),
    ("2001:db8:0:1::/64", "subnet1"),
    ("2001:db8::/126", "tiny"),
    ("::ffff:10.0.0.0/104", "v4mapped"),  # covers mapped 10/8
    ("10.0.5.0/24", "v4notation"),  # offset 96 → /120 over mapped form
    ("fe80::1", "exact-host"),  # bare ip = /128
    ("::/0", "all"),
    ("bad/999", "junk"),  # invalid — matches nothing
    ("2001:db8::/200", "junk2"),  # prefix out of range — no match
]


def _canon6(s: str):
    """Engine-semantics parse: v4 notation → ::ffff-mapped address."""
    try:
        if "." in s and ":" not in s:
            return ipaddress.IPv6Address("::ffff:" + s)
        return ipaddress.IPv6Address(s)
    except ValueError:
        return None


def _net6(cidr: str):
    """Engine-semantics range parse (``_range_prefix6``): v4-notation
    ranges apply the prefix at bit offset 96, default /32; v6 ranges
    default /128."""
    addr, slash, suf = cidr.partition("/")
    base = _canon6(addr)
    if base is None:
        return None
    try:
        p = int(suf) if slash else None
    except ValueError:
        return None
    if "." in addr and ":" not in addr:
        p = 96 + min(p if p is not None else 32, 32)
    elif p is None:
        p = 128
    if not 0 <= p <= 128:
        return None
    try:
        return ipaddress.IPv6Network((base, p), strict=False)
    except ValueError:
        return None


def _py_matches():
    out = []
    for i, ip in enumerate(IPS):
        if ip is None:
            continue
        addr = _canon6(ip)
        if addr is None:
            continue
        for cidr, name in NETS:
            net = _net6(cidr)
            if net is not None and addr in net:
                out.append((i, ip, cidr, name))
    return sorted(out)


@pytest.fixture(scope="module")
def tables(spark):
    ev = spark.createDataFrame(
        [(i, ip) for i, ip in enumerate(IPS)], "id long, ip string"
    )
    nets = spark.createDataFrame(NETS, "cidr string, net_name string")
    return {"ev": ev, "nets": nets}


@pytest.fixture(scope="module")
def engine(spark, tables):
    return PqlEngine(spark, tables)


def test_matches_ipaddress_reference(engine):
    rows = engine.query(
        "ev | evaluate ipv6_lookup(nets, ip, cidr)"
    ).collect()
    got = sorted((r.id, r.ip, r.cidr, r.net_name) for r in rows)
    assert got == _py_matches()
    assert got  # non-degenerate: the reference must produce matches


def test_return_unmatched(engine):
    rows = engine.query(
        "ev | evaluate ipv6_lookup(nets, ip, cidr, return_unmatched)"
    ).collect()
    matched_ids = {m[0] for m in _py_matches()}
    un = sorted(r.id for r in rows if r.cidr is None)
    assert un == sorted(i for i in range(len(IPS)) if i not in matched_ids)
    got = sorted(
        (r.id, r.ip, r.cidr, r.net_name) for r in rows if r.cidr is not None
    )
    assert got == _py_matches()


def test_sql_backend_equivalent(engine, spark, tables):
    q = "ev | evaluate ipv6_lookup(nets, ip, cidr)"
    sql = engine.to_sql(q)
    df_rows = sorted(map(tuple, engine.query(q).collect()))
    tables["ev"].createOrReplaceTempView("ev")
    tables["nets"].createOrReplaceTempView("nets")
    sql_rows = sorted(map(tuple, spark.sql(sql).collect()))
    assert df_rows == sql_rows


def test_collision_renamed_to_right(spark, tables):
    nets2 = spark.createDataFrame(
        [("2001:db8::/32", "x")], "cidr string, ip string"
    )
    eng = PqlEngine(spark, {"ev": tables["ev"], "nets2": nets2})
    out = eng.query("ev | evaluate ipv6_lookup(nets2, ip, cidr)")
    assert out.columns == ["id", "ip", "cidr", "$right.ip"]


def test_plan_is_broadcast_hash_join(engine):
    # the CIDR match itself must be a broadcast HASH join on
    # (prefix, masked canon); the ≤129-row distinct-prefix expansion
    # is a narrow per-row fan-out, not a range probe
    df = engine.query("ev | evaluate ipv6_lookup(nets, ip, cidr)")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_errors(engine):
    with pytest.raises(QueryError, match="unknown source ip column"):
        engine.query("ev | evaluate ipv6_lookup(nets, nope, cidr)")
    with pytest.raises(QueryError, match="unknown ip-range column"):
        engine.query("ev | evaluate ipv6_lookup(nets, ip, nope)")
