"""Parser unit tests (grammar per /root/reference/parser/parser.go)."""

import pytest

from pql_spark import parse
from pql_spark.ast_nodes import (
    AsOp,
    BinaryExpr,
    CallExpr,
    CountOp,
    ExtendOp,
    Ident,
    IndexExpr,
    InExpr,
    JoinOp,
    LetStatement,
    NumberLit,
    ProjectOp,
    RenderOp,
    SortOp,
    StringLit,
    SummarizeOp,
    TabularExpr,
    TakeOp,
    TopOp,
    UnaryExpr,
    WhereOp,
)
from pql_spark.parser import QueryError


def one(src):
    stmts = parse(src)
    assert len(stmts) == 1
    return stmts[0]


def test_bare_table():
    t = one("StormEvents")
    assert isinstance(t, TabularExpr)
    assert t.source.name == "StormEvents"
    assert t.operators == []


def test_quoted_table():
    t = one("`Storm Events`")
    assert t.source.name == "Storm Events"
    assert t.source.quoted


def test_where_precedence():
    t = one('T | where A > 5 and B == "x" or C < 1')
    (op,) = t.operators
    assert isinstance(op, WhereOp)
    # or binds loosest: (A>5 and B=="x") or (C<1)
    assert isinstance(op.predicate, BinaryExpr)
    assert op.predicate.op == "or"
    assert op.predicate.lhs.op == "and"


def test_arithmetic_precedence():
    t = one("T | where A + B * C == 7")
    pred = t.operators[0].predicate
    assert pred.op == "=="
    assert pred.lhs.op == "+"
    assert pred.lhs.rhs.op == "*"


def test_operator_aliases():
    t = one("T | filter A > 1 | order by A | limit 5")
    assert isinstance(t.operators[0], WhereOp)
    assert isinstance(t.operators[1], SortOp)
    assert isinstance(t.operators[2], TakeOp)


def test_sort_defaults():
    # bare term: desc + nulls last; asc implies nulls first
    t = one("T | sort by A, B asc, C desc nulls first")
    terms = t.operators[0].terms
    assert (terms[0].asc, terms[0].nulls_first) == (False, False)
    assert (terms[1].asc, terms[1].nulls_first) == (True, True)
    assert (terms[2].asc, terms[2].nulls_first) == (False, True)


def test_top():
    t = one("T | top 3 by LineCount")
    op = t.operators[0]
    assert isinstance(op, TopOp)
    assert op.count.text == "3"
    assert not op.term.asc


def test_take_rejects_float():
    with pytest.raises(QueryError):
        parse("T | take 3.5")


def test_project_forms():
    t = one("T | project A, B = X + 1, C = f(A)")
    cols = t.operators[0].cols
    assert [c.name for c in cols] == ["A", "B", "C"]
    assert isinstance(cols[0].expr, Ident)
    assert isinstance(cols[2].expr, CallExpr)


def test_extend_unnamed_uses_source_text():
    src = "T | extend 42, X * 2"
    t = one(src)
    cols = t.operators[0].cols
    assert cols[0].name is None
    assert cols[0].expr.span.text(src) == "42"
    assert cols[1].expr.span.text(src) == "X * 2"


def test_summarize():
    t = one('T | summarize Total=sum(X) by D, IsT=endsWith(F, "_t")')
    op = t.operators[0]
    assert isinstance(op, SummarizeOp)
    assert [a.name for a in op.aggs] == ["Total"]
    assert [k.name for k in op.keys] == ["D", "IsT"]


def test_summarize_by_only():
    op = one("T | summarize by D").operators[0]
    assert op.aggs == []
    assert [k.name for k in op.keys] == ["D"]


def test_summarize_unnamed_agg():
    src = "T | summarize min(X), max(X)"
    op = one(src).operators[0]
    assert [a.name for a in op.aggs] == [None, None]
    assert op.aggs[0].expr.span.text(src) == "min(X)"


def test_join_default_flavor():
    op = one("L | join (R) on K").operators[0]
    assert isinstance(op, JoinOp)
    assert op.flavor == "innerunique"
    assert op.right.source.name == "R"
    assert isinstance(op.conditions[0], Ident)


def test_join_explicit():
    op = one(
        "L | join kind=leftouter (R | where X > 1) on $left.K == $right.K, V != 2"
    ).operators[0]
    assert op.flavor == "leftouter"
    assert len(op.right.operators) == 1
    assert len(op.conditions) == 2


def test_join_bad_flavor():
    # rightouter etc. are EXTENSION flavors here (the reference rejects
    # them, parser.go:742-746); only unknown kinds error
    with pytest.raises(QueryError):
        parse("L | join kind=bogus (R) on K")


def test_in_expr():
    pred = one('T | where S in ("a", "b")').operators[0].predicate
    assert isinstance(pred, InExpr)
    assert [i.value for i in pred.items] == ["a", "b"]


def test_index_expr():
    pred = one('T | where a["key2"] > 10').operators[0].predicate
    assert isinstance(pred.lhs, IndexExpr)
    assert isinstance(pred.lhs.index, StringLit)


def test_unary_minus():
    pred = one("T | where K != -1").operators[0].predicate
    assert isinstance(pred.rhs, UnaryExpr)
    assert isinstance(pred.rhs.operand, NumberLit)


def test_qualified_ident():
    pred = one("T | where a.b.c > 1").operators[0].predicate
    assert pred.lhs.parts == ["a", "b", "c"]


def test_count_as_render():
    t = one('T | count | as X | render barchart with (title="t")')
    assert isinstance(t.operators[0], CountOp)
    assert isinstance(t.operators[1], AsOp)
    assert t.operators[1].name == "X"
    op = t.operators[2]
    assert isinstance(op, RenderOp)
    assert op.chart == "barchart"
    assert op.props[0][0] == "title"


def test_let_statement():
    stmts = parse("let n = 3;\nT | take n")
    assert isinstance(stmts[0], LetStatement)
    assert stmts[0].name == "n"
    assert isinstance(stmts[1], TabularExpr)


def test_parens_unwrapped():
    pred = one("T | where (A + B) * C > 1").operators[0].predicate
    assert pred.lhs.op == "*"
    assert pred.lhs.lhs.op == "+"


def test_multi_error_accumulation():
    with pytest.raises(QueryError) as exc:
        parse("T | where | badop X | take 2.5")
    # all three bad segments reported, with line:col
    msg = str(exc.value)
    assert "1:" in msg


def test_unknown_operator():
    with pytest.raises(QueryError):
        parse("T | frobnicate X")


def test_error_has_line_col():
    with pytest.raises(QueryError) as exc:
        parse("T\n| where ==")
    assert "2:" in str(exc.value)
