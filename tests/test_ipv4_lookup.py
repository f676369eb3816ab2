"""``evaluate ipv4_lookup`` (KQL plugin): CIDR-network membership join.
Reference implementation for the tests: Python's stdlib ``ipaddress``.
Scale contract: broadcast hash equi-join on (prefix, masked ip) —
never a nested-loop range probe."""

from __future__ import annotations

import ipaddress

import pytest

from pql_spark import PqlEngine, compile_to_sql
from pql_spark.parser import QueryError

IPS = [
    "10.0.5.9", "10.0.77.3", "192.168.1.1", "bogus", "10.0.200.1",
    "255.255.255.255", "0.0.0.0", "10.0.5.256", None,
]
NETS = [
    ("10.0.0.0/8", "corp"),
    ("10.0.5.0/24", "lab"),
    ("10.0.128.0/17", "dmz"),
    ("192.168.1.1", "exact-host"),  # bare ip = /32
    ("0.0.0.0/0", "all"),
    ("bad/99", "junk"),  # invalid prefix — matches nothing
    ("999.0.0.0/8", "junk2"),  # invalid network — matches nothing
]


def _py_matches():
    out = []
    for i, ip in enumerate(IPS):
        if ip is None:
            continue
        try:
            addr = ipaddress.IPv4Address(ip)
        except ValueError:
            continue
        for cidr, name in NETS:
            try:
                net = ipaddress.IPv4Network(
                    cidr if "/" in cidr else cidr + "/32"
                )
            except ValueError:
                continue
            if addr in net:
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
        "ev | evaluate ipv4_lookup(nets, ip, cidr)"
    ).collect()
    got = sorted((r.id, r.ip, r.cidr, r.net_name) for r in rows)
    assert got == _py_matches()


def test_return_unmatched(engine):
    rows = engine.query(
        "ev | evaluate ipv4_lookup(nets, ip, cidr, return_unmatched)"
    ).collect()
    matched_ids = {m[0] for m in _py_matches()}
    un = sorted(r.id for r in rows if r.cidr is None)
    assert un == sorted(i for i in range(len(IPS)) if i not in matched_ids)
    # matched part unchanged
    got = sorted(
        (r.id, r.ip, r.cidr, r.net_name) for r in rows if r.cidr is not None
    )
    assert got == _py_matches()


def test_sql_backend_equivalent(engine, spark, tables):
    q = "ev | evaluate ipv4_lookup(nets, ip, cidr)"
    sql = engine.to_sql(q)
    df_rows = sorted(map(tuple, engine.query(q).collect()))
    tables["ev"].createOrReplaceTempView("ev")
    tables["nets"].createOrReplaceTempView("nets")
    sql_rows = sorted(map(tuple, spark.sql(sql).collect()))
    assert df_rows == sql_rows


def test_collision_renamed_to_right(spark, tables):
    # lookup column that collides with a left column → `$right.<col>`
    nets2 = spark.createDataFrame(
        [("10.0.0.0/8", "x")], "cidr string, ip string"
    )
    eng = PqlEngine(spark, {"ev": tables["ev"], "nets2": nets2})
    out = eng.query("ev | evaluate ipv4_lookup(nets2, ip, cidr)")
    assert out.columns == ["id", "ip", "cidr", "$right.ip"]


def test_plan_is_broadcast_hash_join(engine):
    # the CIDR match itself must be a broadcast HASH join on
    # (prefix, masked-ip); the ≤33-row distinct-prefix expansion is
    # allowed to plan as a broadcast nested-loop CROSS (no condition —
    # a narrow per-row fan-out, not a range probe)
    df = engine.query("ev | evaluate ipv4_lookup(nets, ip, cidr)")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_errors(engine):
    with pytest.raises(QueryError, match="unknown source ip column"):
        engine.query("ev | evaluate ipv4_lookup(nets, nope, cidr)")
    with pytest.raises(QueryError, match="unknown ip-range column"):
        engine.query("ev | evaluate ipv4_lookup(nets, ip, nope)")
    with pytest.raises(QueryError, match="return_unmatched"):
        engine.query("ev | evaluate ipv4_lookup(nets, ip, cidr, nonsense)")
    with pytest.raises(QueryError, match="DataFrame backend"):
        engine.to_sql(
            "ev | evaluate ipv4_lookup(nets, ip, cidr, return_unmatched)"
        )
