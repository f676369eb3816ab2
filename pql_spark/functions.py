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


_DURATION_UNITS = {
    "s": 1, "sec": 1, "second": 1, "seconds": 1,
    "m": 60, "min": 60, "minute": 60, "minutes": 60,
    "h": 3600, "hour": 3600, "hours": 3600,
    "d": 86400, "day": 86400, "days": 86400,
}


def _duration_usec(text: str, span: Span) -> int:
    import re

    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]+)\s*", text)
    if not m or m.group(2).lower() not in _DURATION_UNITS:
        raise ParseError(
            f"bin(): bad duration {text!r} (want e.g. '15 minutes', '1h')",
            span,
        )
    return int(m.group(1)) * _DURATION_UNITS[m.group(2).lower()] * 1_000_000


def bin_fn(value: Column, size: Column, lit_duration: str | None,
           span: Span) -> Column:
    """KQL-style ``bin(value, roundTo)`` — floor to a multiple.

    EXTENSION: not in the reference's rewritten registry (it would pass
    through to an engine without it, README:82-85).  Implemented here as
    the windowing entry point SURVEY §2.5 calls for: with a duration
    string it floors timestamps to epoch-aligned buckets (the batch twin
    of ``F.window``), so ``summarize … by bin(ts, "1 hour")`` works on
    batch AND streaming inputs; with numbers it floors to numeric
    multiples.
    """
    if lit_duration is not None:
        usec = _duration_usec(lit_duration, span)
        return F.timestamp_micros(
            F.floor(F.unix_micros(value) / F.lit(usec)).cast("long")
            * F.lit(usec)
        )
    return F.floor(value / size) * size


# regex-special chars escaped for the `parse` operator's generated
# pattern — a conservative set valid in BOTH Java regex (Spark) and RE2
# (DuckDB oracles); notably space is NOT escaped (RE2 rejects unknown
# escapes)
_RE_SPECIAL = set(".^$*+?()[]{}|\\")


def build_parse_regex(segments) -> tuple[str, list[str]]:
    """Build the extraction regex for ``parse Expr with …`` (KQL simple
    mode) from alternating literal/capture segments.

    Anchored at the start (KQL simple mode matches from the beginning);
    intermediate captures are lazy ``(.*?)``, a trailing capture is
    greedy-to-end ``(.*)$``.  Returns (regex, capture names in group
    order).  Both backends embed the SAME string, so Spark and the SQL
    oracle extract identically.
    """
    from .ast_nodes import Ident

    parts = ["^"]
    names: list[str] = []
    for i, seg in enumerate(segments):
        if isinstance(seg, Ident):
            names.append(seg.parts[0])
            last = i == len(segments) - 1
            parts.append("(.*)$" if last else "(.*?)")
        else:
            parts.append(
                "".join(
                    "\\" + c if c in _RE_SPECIAL else c for c in seg.value
                )
            )
    return "".join(parts), names


def compile_call(
    name: str,
    args: list[Column],
    span: Span,
    ast_args: list | None = None,
) -> Column:
    """Compile a scalar/aggregate function call.

    Known functions are rewritten per the reference registry; unknown names
    pass through to Spark's function registry (Catalyst-resolved at analysis
    time, matching the reference's engine-deferred late binding).
    ``ast_args`` (the unparsed argument nodes) lets literal-dependent
    rewrites like ``bin`` see their arguments' source form.
    """
    lname = name.lower()
    if lname == "bin":
        _check_argc(name, args, 2, 2, span)
        from .ast_nodes import StringLit

        lit = (
            ast_args[1].value
            if ast_args is not None and isinstance(ast_args[1], StringLit)
            else None
        )
        return bin_fn(args[0], args[1], lit, span)
    if lname == "not":
        _check_argc(name, args, 1, 1, span)
        return ~args[0]
    if lname == "now":
        _check_argc(name, args, 0, 0, span)
        return F.current_timestamp()
    if lname == "ago":
        # EXTENSION (KQL): ago("1h") == now() - 1h; literal timespan only
        _check_argc(name, args, 1, 1, span)
        from .ast_nodes import StringLit

        if ast_args is None or not isinstance(ast_args[0], StringLit):
            raise ParseError(
                'ago() takes a timespan string literal, e.g. ago("1h")', span
            )
        usec = _duration_usec(ast_args[0].value, span)
        return F.current_timestamp() - F.expr(
            f"INTERVAL {usec} MICROSECOND"
        )
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
    # EXTENSION (KQL aggregate family): dcount is EXACT here (KQL's is
    # an approximation — exactness keeps it oracle-verifiable; use
    # passthrough approx_count_distinct for the sketch behavior)
    if lname == "dcount":
        _check_argc(name, args, 1, 1, span)
        return F.count_distinct(args[0])
    if lname == "dcountif":
        _check_argc(name, args, 2, 2, span)
        return F.count_distinct(F.when(args[1], args[0]))
    if lname in ("sumif", "avgif", "minif", "maxif"):
        _check_argc(name, args, 2, 2, span)
        agg = {"sumif": F.sum, "avgif": F.avg, "minif": F.min,
               "maxif": F.max}[lname]
        return agg(F.when(args[1], args[0]))
    # EXTENSION (KQL series_* over array columns — the make-series
    # companions).  All-double arithmetic; element-only lambdas, so no
    # HOF re-evaluation hazard (the array is a plain column reference).
    if lname == "series_sum":
        _check_argc(name, args, 1, 1, span)
        return F.aggregate(
            args[0], F.lit(0.0), lambda acc, x: acc + x.cast("double")
        )
    if lname == "series_avg":
        _check_argc(name, args, 1, 1, span)
        total = F.aggregate(
            args[0], F.lit(0.0), lambda acc, x: acc + x.cast("double")
        )
        return F.when(F.size(args[0]) > 0, total / F.size(args[0]))
    if lname == "series_min":
        _check_argc(name, args, 1, 1, span)
        return F.array_min(args[0])
    if lname == "series_max":
        _check_argc(name, args, 1, 1, span)
        return F.array_max(args[0])
    if lname == "series_fill_const":
        _check_argc(name, args, 2, 2, span)
        fill = args[1]
        return F.transform(args[0], lambda x: F.coalesce(x, fill))
    if lname == "series_fill_forward":
        # carry the last non-null value forward; leading nulls stay null
        _check_argc(name, args, 1, 1, span)
        return F.aggregate(
            args[0],
            F.array().cast("array<double>"),
            lambda acc, x: F.concat(
                acc,
                F.array(
                    F.coalesce(
                        x.cast("double"),
                        F.try_element_at(acc, F.lit(-1)),
                    )
                ),
            ),
        )
    if lname == "series_fill_linear":
        # null runs interpolated between their non-null neighbors;
        # leading/trailing runs take the nearest non-null value
        # (all-null arrays stay all-null).  One O(n) aggregate pass —
        # acc = (filled prefix, pending-null count, last value); the
        # lambdas touch only acc/x/k, so there is no outer-expression
        # re-evaluation hazard.
        _check_argc(name, args, 1, 1, span)

        def _run(pend: Column) -> Column:
            return F.when(
                pend > 0, F.sequence(F.lit(1), pend)
            ).otherwise(F.array().cast("array<int>"))

        def step(acc: Column, x: Column) -> Column:
            xd = x.cast("double")
            interp = F.transform(
                _run(acc["pend"]),
                # k/(pend+1) mirrors (i-pi)/(ni-pi) — keep the same
                # *k-then-/ order as the SQL oracle for bit equality
                lambda k: F.coalesce(
                    acc["last"]
                    + (xd - acc["last"]) * k / (acc["pend"] + 1),
                    xd,  # leading run: nearest value
                ),
            )
            return F.when(
                xd.isNotNull(),
                F.struct(
                    F.concat(acc["out"], interp, F.array(xd)).alias("out"),
                    F.lit(0).alias("pend"),
                    xd.alias("last"),
                ),
            ).otherwise(
                F.struct(
                    acc["out"].alias("out"),
                    (acc["pend"] + 1).alias("pend"),
                    acc["last"].alias("last"),
                )
            )

        return F.aggregate(
            args[0],
            F.struct(
                F.array().cast("array<double>").alias("out"),
                F.lit(0).alias("pend"),
                F.lit(None).cast("double").alias("last"),
            ),
            step,
            lambda acc: F.concat(
                acc["out"],
                F.transform(_run(acc["pend"]), lambda k: acc["last"]),
            ),
        )
    if lname == "series_moving_avg":
        # trailing-window mean: out[i] = avg(arr[max(0, i-k+1) .. i])
        _check_argc(name, args, 2, 2, span)
        from .ast_nodes import NumberLit

        if (
            ast_args is None
            or not isinstance(ast_args[1], NumberLit)
            or ast_args[1].is_float
        ):
            raise ParseError(
                "series_moving_avg() window must be an integer literal",
                span,
            )
        k = int(ast_args[1].text)
        if k < 1:
            raise ParseError("window must be >= 1", span)
        arr = args[0]

        def mean_at(i: Column) -> Column:
            window = F.slice(
                arr,
                F.greatest(F.lit(1), i - (k - 1)),
                F.least(i, F.lit(k)),
            )
            total = F.aggregate(
                window, F.lit(0.0), lambda acc, x: acc + x.cast("double")
            )
            return total / F.size(window)

        return F.transform(F.sequence(F.lit(1), F.size(arr)), mean_at)
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
