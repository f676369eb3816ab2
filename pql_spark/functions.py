"""PQL function semantics on Spark Columns.

Implements the reference's rewritten-function registry
(``initKnownFunctions``, pql.go:834-851) and its null-handling rules for
binary operators (pql.go:659-792).  Everything not in the registry passes
through to Spark's builtin function registry via ``F.call_function`` —
the same extension mechanism the reference uses (unknown functions pass
through to the backing engine, pql.go:770-787, README:82-85).  Because
passthrough stays Catalyst-native (never a Python UDF), expressions remain
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .lexer import Span
from .parser import ParseError


def null_safe_eq(lhs: Column, rhs: Column) -> Column:
    """``x == y`` → ``coalesce(x = y, FALSE)`` — NULL compares are FALSE,
    including ``null == null`` (NOT SQL ``<=>``; pql.go:672-701)."""
    return F.coalesce(lhs == rhs, F.lit(False))


def null_safe_ne(lhs: Column, rhs: Column) -> Column:
    """``x != y`` → ``coalesce(x <> y, FALSE)`` (pql.go:702-711)."""
    return F.coalesce(lhs != rhs, F.lit(False))


def ci_eq(lhs: Column, rhs: Column) -> Column:
    """``x =~ y`` → ``lower(x) = lower(y)`` — deliberately NOT
    null-coalesced (pql.go:712-731)."""
    return F.lower(lhs) == F.lower(rhs)


def ci_ne(lhs: Column, rhs: Column) -> Column:
    return F.lower(lhs) != F.lower(rhs)


def iff(cond: Column, then: Column, otherwise: Column) -> Column:
    """``iff(c,t,f)`` → CASE WHEN coalesce(c, FALSE) THEN t ELSE f END
    (pql.go:979-1004)."""
    return F.when(F.coalesce(cond, F.lit(False)), then).otherwise(otherwise)


def _check_argc(name: str, args: list, n_min: int, n_max: int, span: Span):
    if not (n_min <= len(args) <= n_max):
        want = str(n_min) if n_min == n_max else f"{n_min}..{n_max}"
        raise ParseError(
            f"{name}() takes {want} argument(s), got {len(args)}", span
        )


def compile_call(name: str, args: list[Column], span: Span) -> Column:
    """Compile a scalar/aggregate function call.

    Known functions are rewritten per the reference registry; unknown names
    pass through to Spark's function registry (Catalyst-resolved at analysis
    time, matching the reference's engine-deferred late binding).
    """
    lname = name.lower()
    if lname == "not":
        _check_argc(name, args, 1, 1, span)
        return ~args[0]
    if lname == "now":
        _check_argc(name, args, 0, 0, span)
        return F.current_timestamp()
    if lname == "isnull":
        _check_argc(name, args, 1, 1, span)
        return args[0].isNull()
    if lname == "isnotnull":
        _check_argc(name, args, 1, 1, span)
        return args[0].isNotNull()
    if lname == "strcat":
        if len(args) < 1:
            raise ParseError("strcat() takes at least 1 argument", span)
        return F.concat(*args)
    if lname == "count":
        _check_argc(name, args, 0, 0, span)
        return F.count(F.lit(1))
    if lname == "countif":
        _check_argc(name, args, 1, 1, span)
        # count() FILTER (WHERE pred) — rows where pred is NULL/false excluded
        return F.count(F.when(args[0], F.lit(1)))
    if lname in ("iff", "iif"):
        _check_argc(name, args, 3, 3, span)
        return iff(args[0], args[1], args[2])
    if lname == "tolower":
        _check_argc(name, args, 1, 1, span)
        return F.lower(args[0])
    if lname == "toupper":
        _check_argc(name, args, 1, 1, span)
        return F.upper(args[0])
    # passthrough: resolve against Spark's builtin/UDF registry at analysis
    # time (JVM-side expression — no Python round trip)
    return F.call_function(name, *args)
