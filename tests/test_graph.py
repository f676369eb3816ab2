"""``make-graph`` / ``graph-match`` (simplified KQL graph operators):
fixed-length path patterns compiled to hash equi-joins on node ids."""

from __future__ import annotations

import pytest

from pql_spark import PqlEngine
from pql_spark.parser import QueryError

EDGES = [
    ("alice", "srv1", "login"),
    ("srv1", "db1", "query"),
    ("bob", "srv1", "login"),
    ("srv1", "srv2", "lateral"),
    ("srv2", "db2", "query"),
    ("db1", "alice", "exfil"),
]
NODES = [
    ("alice", "user"), ("bob", "user"), ("srv1", "server"),
    ("srv2", "server"), ("db1", "database"), ("db2", "database"),
]


@pytest.fixture(scope="module")
def engine(spark):
    e = spark.createDataFrame(
        EDGES, "source string, target string, action string"
    )
    n = spark.createDataFrame(NODES, "name string, kind string")
    return PqlEngine(spark, {"E": e, "N": n})


def test_two_hop_with_node_attributes(engine):
    out = engine.query(
        """E | make-graph source --> target with N on name
        | graph-match (a)-[e1]->(b)-[e2]->(c)
            where a.kind == "user" and c.kind == "database"
            project user = a.id, via = b.id, db = c.id, act = e2.action
        | sort by user asc, db asc"""
    )
    assert [tuple(r) for r in out.collect()] == [
        ("alice", "srv1", "db1", "query"),
        ("bob", "srv1", "db1", "query"),
    ]


def test_reverse_edge(engine):
    # (a)-[e1]->(b)<-[e2]-(c): a and c both point at b
    rows = {
        tuple(r)
        for r in engine.query(
            """E | make-graph source --> target
            | graph-match (a)-[e1]->(b)<-[e2]-(c)
                where a.id != c.id
                project a = a.id, b = b.id, c = c.id"""
        ).collect()
    }
    assert ("alice", "srv1", "bob") in rows
    assert ("bob", "srv1", "alice") in rows


def test_cycle_via_repeated_node_var(engine):
    # the only directed 3-cycle is alice → srv1 → db1 → alice; every
    # rotation is a valid binding of (a, b, c)
    rows = {
        tuple(r)
        for r in engine.query(
            """E | make-graph source --> target
            | graph-match (a)-[e1]->(b)-[e2]->(c)-[e3]->(a)
                project a = a.id, b = b.id, c = c.id"""
        ).collect()
    }
    assert rows == {
        ("alice", "srv1", "db1"),
        ("srv1", "db1", "alice"),
        ("db1", "alice", "srv1"),
    }


def test_python_reference_all_two_hops(engine):
    rows = {
        tuple(r)
        for r in engine.query(
            """E | make-graph source --> target
            | graph-match (a)-[e1]->(b)-[e2]->(c)
                project a = a.id, b = b.id, c = c.id"""
        ).collect()
    }
    ref = {
        (s1, d1, d2)
        for (s1, d1, _x) in EDGES
        for (s2, d2, _y) in EDGES
        if d1 == s2
    }
    assert rows == ref


def test_variable_length_reachability(engine):
    out = engine.query(
        """E | make-graph source --> target
        | graph-match (a)-[e*1..3]->(b)
            where a.id == "alice"
            project b = b.id
        | distinct b | sort by b asc"""
    )
    # srv1 (1 hop); db1, srv2 (2); alice (cycle), db2 (3)
    assert [r.b for r in out.collect()] == [
        "alice", "db1", "db2", "srv1", "srv2",
    ]


def test_variable_length_min_hops(engine):
    out = engine.query(
        """E | make-graph source --> target
        | graph-match (a)-[e*2..2]->(b)
            where a.id == "alice" project b = b.id
        | distinct b | sort by b asc"""
    )
    assert [r.b for r in out.collect()] == ["db1", "srv2"]


def test_variable_length_errors(engine):
    with pytest.raises(QueryError, match="1 <= min <= max"):
        engine.query(
            """E | make-graph source --> target
            | graph-match (a)-[e*0..2]->(b) project b = b.id"""
        )
    with pytest.raises(QueryError, match="capped at 8"):
        engine.query(
            """E | make-graph source --> target
            | graph-match (a)-[e*1..9]->(b) project b = b.id"""
        )


def test_errors(engine):
    with pytest.raises(QueryError, match="requires a preceding"):
        engine.query(
            "E | graph-match (a)-[e]->(b) project a = a.id"
        )
    with pytest.raises(QueryError, match="must be unique"):
        engine.query(
            """E | make-graph source --> target
            | graph-match (a)-[e]->(b)-[e]->(c) project a = a.id"""
        )
    with pytest.raises(QueryError, match="project"):
        engine.query(
            """E | make-graph source --> target
            | graph-match (a)-[e]->(b)"""
        )
    # graph-match without make-graph fails on the SQL backend too
    with pytest.raises(QueryError, match="requires a preceding"):
        engine.to_sql(
            "E | graph-match (a)-[e]->(b) project a = a.id"
        )


def test_graph_state_is_pipeline_scoped(engine):
    # a join's right subquery must not see the outer graph binding
    with pytest.raises(QueryError, match="requires a preceding"):
        engine.query(
            """E | make-graph source --> target
            | join kind=inner (
                E | graph-match (a)-[e]->(b) project source = a.id
              ) on source
            | graph-match (a)-[e]->(b) project a = a.id"""
        )


# ------------------------------------------------- SQL backend parity

SQL_PARITY_CASES = [
    # two-hop with node attributes + where + renamed project
    """E | make-graph source --> target with N on name
    | graph-match (a)-[e1]->(b)-[e2]->(c)
        where a.kind == "user" and c.kind == "database"
        project user = a.id, via = b.id, db = c.id, act = e2.action
    | sort by user asc, db asc""",
    # reverse edge
    """E | make-graph source --> target
    | graph-match (a)-[e1]->(b)<-[e2]-(c)
        where a.id != c.id
        project a = a.id, b = b.id, c = c.id
    | sort by a asc, c asc""",
    # cycle via repeated node var
    """E | make-graph source --> target
    | graph-match (a)-[e1]->(b)-[e2]->(c)-[e3]->(a)
        project a = a.id, b = b.id, c = c.id
    | sort by a asc""",
    # bounded var-length edge (UNION ALL of fixed chains) + distinct
    """E | make-graph source --> target
    | graph-match (a)-[e*1..3]->(b)
        where a.id == "alice"
        project b = b.id
    | distinct b | sort by b asc""",
    # bare-expression project (source-text column name `a.id`)
    """E | make-graph source --> target
    | graph-match (a)-[e1]->(b) project a.id, act = e1.action
    | sort by `a.id` asc, act asc""",
]


@pytest.mark.parametrize("text", SQL_PARITY_CASES)
def test_graph_match_sql_backend_equivalence(spark, engine, text):
    """compile_to_sql(graph-match) run via spark.sql must match the
    DataFrame backend row-for-row (same flat `var.col` names)."""
    e = spark.createDataFrame(
        EDGES, "source string, target string, action string"
    )
    n = spark.createDataFrame(NODES, "name string, kind string")
    e.createOrReplaceTempView("E")
    n.createOrReplaceTempView("N")
    df_out = engine.query(text)
    sql_out = spark.sql(engine.to_sql(text))
    assert sql_out.columns == df_out.columns
    assert [tuple(r) for r in sql_out.collect()] == [
        tuple(r) for r in df_out.collect()
    ]


def test_graph_match_sql_broadcasts_node_attrs(spark, engine):
    sql = engine.to_sql(
        """E | make-graph source --> target with N on name
        | graph-match (a)-[e1]->(b)
            project a = a.id, k = b.kind"""
    )
    assert "BROADCAST" in sql
