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

import math

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


def timespan_interval(usec: int) -> Column:
    """A Spark day-time interval of ``usec`` microseconds (the compiled
    form of a bare timespan literal like ``1h``).  Constant-folded by
    Catalyst; arithmetic with timestamps and interval comparisons are
    native."""
    return F.expr(f"INTERVAL {usec} MICROSECOND")


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
        usec = (
            lit_duration
            if isinstance(lit_duration, int)
            else _duration_usec(lit_duration, span)
        )
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


def escape_regex(text: str) -> str:
    """Escape a literal string for embedding in a Java-regex AND
    RE2-portable pattern (same escaping rule as the `parse` operator)."""
    return "".join("\\" + c if c in _RE_SPECIAL else c for c in text)


# EXTENSION (KQL scalar surface): 1:1 renames onto Spark builtins with
# identical argument order and semantics.  Shared by both backends — the
# DataFrame compiler calls ``F.call_function(target, …)``, the SQL
# backend emits ``target(…)`` — so the two stay equivalent by
# construction.  None of these shadow a reference-rewritten function.
KQL_RENAMES: dict[str, str] = {
    "strlen": "length",
    "strrev": "reverse",
    "replace_string": "replace",          # literal replace (Spark 3.5+)
    "replace_regex": "regexp_replace",
    "format_datetime": "date_format",
    "unixtime_seconds_todatetime": "timestamp_seconds",
    "unixtime_milliseconds_todatetime": "timestamp_millis",
    "unixtime_microseconds_todatetime": "timestamp_micros",
    "array_length": "size",               # size(NULL) ⇒ NULL, matching KQL
    "array_concat": "concat",
    "array_reverse": "reverse",
    "pack_array": "array",
    "bag_pack": "map",                    # property bag ≈ Spark map
    "pack": "map",                        # legacy alias of bag_pack
    "bag_keys": "map_keys",
    "strcat_array": "array_join",      # strcat_array(arr, delim)
    "todynamic": "parse_json",            # Spark 4 VARIANT
    "take_any": "any_value",
    "stdev": "stddev_samp",
    "stdevp": "stddev_pop",
    "variancep": "var_pop",
    "monthofyear": "month",
    "getmonth": "month",
    "getyear": "year",
    "hourofday": "hour",
    # tz conversions — 1:1 arg order (value, tz)
    "datetime_utc_to_local": "from_utc_timestamp",
    "datetime_local_to_utc": "to_utc_timestamp",
    "week_of_year": "weekofyear",
    "new_guid": "uuid",                   # nondeterministic, like KQL
    "repeat": "array_repeat",             # repeat(value, count) → array
    "gettype": "typeof",                  # Spark type names, documented
    "string_size": "octet_length",        # KQL string_size = UTF-8 bytes
    "hash_sha1": "sha1",
    "hash_md5": "md5",
    # KQL bitwise AGGREGATES → Spark bit aggregates (same arg shape)
    "binary_all_and": "bit_and",
    "binary_all_or": "bit_or",
    "binary_all_xor": "bit_xor",
    "bitset_count_ones": "bit_count",
}

# datetime_add/datetime_diff units accepted by Spark's timestampadd/diff
_DT_PARTS = {
    "year", "quarter", "month", "week", "day",
    "hour", "minute", "second", "millisecond", "microsecond",
}


def _lit_str(name: str, ast_args: list | None, i: int, span: Span,
             what: str = "string literal") -> str:
    """Require argument *i* to be a string literal; return its value."""
    from .ast_nodes import StringLit

    if ast_args is None or i >= len(ast_args) or not isinstance(
        ast_args[i], StringLit
    ):
        raise ParseError(
            f"{name}() argument {i + 1} must be a {what}", span
        )
    return ast_args[i].value


def _let_bind(col: "Column", f) -> "Column":
    """Let-binding via a singleton-array lambda: the bound value appears
    ONCE in the expression tree as a lambda VARIABLE instead of being
    re-inlined at every use.  Without this, chained array expressions
    (series_decompose, series_fit_line) duplicate subtrees
    exponentially — a naive series_decompose_anomalies build hit >1 MiB
    task binaries and minutes of Catalyst analysis time."""
    return F.element_at(F.transform(F.array(col), f), 1)


def _arr_mean(a: "Column") -> "Column":
    """Left-fold mean of a double array (matches the SQL twins'
    summation order bit-for-bit)."""
    return (
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x) / F.size(a)
    )


def parse_ts_format(pattern: str) -> list[tuple[str, str]]:
    """Split a format_timespan pattern into ('tok', run) / ('lit', text)
    segments — token chars are d/h/H/m/s/f runs; shared by both
    backends so Spark and the SQL text render identically."""
    out: list[tuple[str, str]] = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch in "dhHmsf":
            j = i
            while j < len(pattern) and pattern[j] == ch:
                j += 1
            out.append(("tok", pattern[i:j]))
            i = j
        else:
            j = i
            while j < len(pattern) and pattern[j] not in "dhHmsf":
                j += 1
            out.append(("lit", pattern[i:j]))
            i = j
    return out


# element-wise series operator families (shared names; SQL twins build
# the same zip_with/transform HOF text)
_SERIES_BINOPS = {
    "series_add": lambda x, y: x + y,
    "series_subtract": lambda x, y: x - y,
    "series_multiply": lambda x, y: x * y,
    "series_divide": lambda x, y: F.try_divide(x, y),
    "series_pow": lambda x, y: F.pow(x, y),
    "series_greater": lambda x, y: x > y,
    "series_greater_equals": lambda x, y: x >= y,
    "series_less": lambda x, y: x < y,
    "series_less_equals": lambda x, y: x <= y,
    "series_equals": lambda x, y: x == y,
    "series_not_equals": lambda x, y: x != y,
}
_SERIES_UNOPS = {
    "series_abs": F.abs,
    "series_exp": F.exp,
    "series_log": F.log,
    "series_sign": F.signum,
    "series_sqrt": F.sqrt,
    "series_floor": F.floor,
    "series_ceiling": F.ceil,
}


def _series_dot(a: "Column", b: "Column") -> "Column":
    """Σ aᵢ·bᵢ with null elements contributing 0 (zip-to-longest)."""
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + F.coalesce(x, F.lit(0.0)),
    )


def _lit_int(name: str, ast_args: list | None, i: int, span: Span) -> int:
    """Require argument *i* to be an integer literal; return its value."""
    from .ast_nodes import NumberLit

    if (
        ast_args is not None
        and i < len(ast_args)
        and isinstance(ast_args[i], NumberLit)
        and not ast_args[i].is_float
    ):
        return int(ast_args[i].text)
    raise ParseError(
        f"{name}() argument {i + 1} must be an integer literal", span
    )


# KQL dcount/hll accuracy levels 0..4 → Datasketches lgConfigK; relative
# error 1.04/√2^lgk ≈ 1.6 / 0.8 / 0.4 / 0.28 / 0.2 % — KQL's exact tiers
_HLL_LGK = {0: 12, 1: 14, 2: 16, 3: 17, 4: 18}


def hll_lgk(name: str, acc: int, span: Span) -> int:
    """Validated accuracy→lgConfigK lookup shared by both backends."""
    if acc not in _HLL_LGK:
        raise ParseError(
            f"{name}() accuracy must be an integer 0..4, got {acc}", span
        )
    return _HLL_LGK[acc]


def ipv4_long(c: Column) -> Column:
    """Dotted-quad string → uint32-as-long; NULL on malformed input.
    Shared by the IPv4 scalar family and ``evaluate ipv4_lookup``."""
    parts = F.split(c, r"\.")
    octs = [
        F.try_element_at(parts, F.lit(i + 1)).try_cast("long")
        for i in range(4)
    ]
    valid = (F.size(parts) == 4)
    for o in octs:
        valid = valid & o.isNotNull() & (o >= 0) & (o <= 255)
    val = ((octs[0] * 256 + octs[1]) * 256 + octs[2]) * 256 + octs[3]
    return F.when(valid, val)


def ipv4_masked(v: Column, prefix: Column) -> Column:
    """Network part of an ip under a /prefix mask, as the RIGHT-SHIFTED
    value (``ip >> (32-prefix)``) — equal shifted values ⇔ same network,
    and the dynamic shift is a 2^k division (``shiftright`` takes a
    literal bit count only); v < 2^32 is exact in double."""
    shift = (F.lit(32) - prefix).cast("double")
    return F.when(
        (prefix >= 0) & (prefix <= 32),
        F.floor(v / F.pow(F.lit(2.0), shift)).cast("long"),
    )


def build_parse_regex(segments, kind: str = "simple") -> tuple[str, list[str]]:
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
        elif kind == "regex":
            parts.append(seg.value)  # raw regex fragment
        else:
            parts.append(
                "".join(
                    "\\" + c if c in _RE_SPECIAL else c for c in seg.value
                )
            )
    return "".join(parts), names


# ------------------------------------------------------------ IPv6 family
#
# KQL IPv6 functions (SIEM surface, like the IPv4 family above them in
# compile_call) — implemented as pure Catalyst expressions over a
# 32-nibble lowercase hex representation.  Key property: lexicographic
# order on fixed-width lowercase hex equals numeric order ('0'..'9' <
# 'a'..'f' in ASCII), so 128-bit compares need no big-int arithmetic.
# IPv4 inputs canonicalize to the ::ffff:a.b.c.d mapped form, matching
# KQL's parse_ipv6("192.168.255.255") == "0000:…:ffff:c0a8:ffff".


def _ipv4_long(c: Column) -> Column:
    """Dotted-quad → uint32-as-long; NULL on malformed input."""
    parts = F.split(c, r"\.")
    octs = [
        F.try_element_at(parts, F.lit(i + 1)).try_cast("long")
        for i in range(4)
    ]
    valid = F.size(parts) == 4
    for o in octs:
        valid = valid & o.isNotNull() & (o >= 0) & (o <= 255)
    # reject non-numeric garbage that try_cast maps to NULL already and
    # forms like "1.2.3.04x" (try_cast NULL) — covered by isNotNull
    val = ((octs[0] * 256 + octs[1]) * 256 + octs[2]) * 256 + octs[3]
    return F.when(valid, val)


def _ipv6_hex32(c: Column) -> Column:
    """Canonical 32-char lowercase hex (no colons) of an IPv6 or IPv4
    string; NULL on malformed input.  Handles `::` compression and an
    embedded IPv4 tail (`::ffff:1.2.3.4`).

    Every intermediate (folded string, `::`-split, left/right groups,
    final group array) is let-bound: without the bindings this
    expression multiplies into multi-MiB task binaries (same failure
    mode the series functions hit — see ``_let_bind``)."""

    def build(s: Column) -> Column:
        is_v4 = s.rlike(r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$")
        v4hex = F.concat(
            F.lit("00000000000000000000ffff"),
            F.lpad(F.lower(F.hex(_ipv4_long(s))), 8, "0"),
        )

        # v6 path: fold an embedded IPv4 tail into two hex groups first
        def with_tv(tv: Column) -> Column:
            return F.concat(
                F.regexp_replace(s, r"[^:]*$", ""),
                F.lpad(F.lower(F.hex((tv / 65536).cast("long"))), 4, "0"),
                F.lit(":"),
                F.lpad(F.lower(F.hex(F.pmod(tv, F.lit(65536)))), 4, "0"),
            )

        folded = _let_bind(
            _ipv4_long(F.substring_index(s, ":", -1)), with_tv
        )
        s1 = F.when(s.contains("."), folded).otherwise(s)

        def with_x(x: Column) -> Column:
            def with_t(t: Column) -> Column:
                # an empty SIDE of '::' means zero groups, but an empty
                # group INSIDE a side (':::', '1:::2') must stay and
                # fail the per-group regex — don't filter empties
                empty = F.array().cast("array<string>")

                def side(sx: Column) -> Column:
                    return F.when(sx == "", empty).otherwise(
                        F.split(sx, ":", -1)
                    )

                left = side(F.element_at(t, 1))
                right = side(
                    F.coalesce(F.try_element_at(t, F.lit(2)), F.lit(""))
                )

                def with_lr(lr: Column) -> Column:
                    mid = (
                        F.lit(8)
                        - F.size(lr.getField("l"))
                        - F.size(lr.getField("r"))
                    )
                    has_dc = F.size(t) == 2
                    groups = F.when(
                        # '::' must stand for >=1 zero group
                        has_dc & (mid >= 1),
                        F.concat(
                            lr.getField("l"),
                            F.array_repeat(F.lit("0"), mid.cast("int")),
                            lr.getField("r"),
                        ),
                    ).when(~has_dc, F.split(x, ":", -1))

                    def with_g(g: Column) -> Column:
                        ok = (F.size(g) == 8) & F.forall(
                            g, lambda e: e.rlike("^[0-9a-f]{1,4}$")
                        )
                        hx = F.array_join(
                            F.transform(
                                g, lambda e: F.lpad(e, 4, "0")
                            ),
                            "",
                        )
                        return F.when(ok, hx)

                    return _let_bind(groups, with_g)

                return _let_bind(
                    F.struct(left.alias("l"), right.alias("r")), with_lr
                )

            return _let_bind(F.split(x, "::", -1), with_t)

        return F.when(is_v4, v4hex).when(~is_v4, _let_bind(s1, with_x))

    return _let_bind(F.lower(F.trim(c)), build)


def _ipv6_mask_hex(hex32: Column, prefix: Column) -> Column:
    """Zero out all bits past ``prefix`` (0..128) of a 32-nibble hex
    string.  Nibble-level transform — 32 elements of work, no UDF.
    Both inputs are let-bound (the prefix is referenced per nibble)."""

    def mask(hp: Column) -> Column:
        h, p = hp.getField("h"), hp.getField("p")

        def nib(i: Column) -> Column:
            kept = F.greatest(F.least(p - 4 * i, F.lit(4)), F.lit(0))
            v = F.conv(F.substring(h, i + 1, 1), 16, 10).cast("int")
            scale = F.pow(F.lit(2.0), (F.lit(4) - kept).cast("double"))
            m = (F.floor(v / scale) * scale).cast("int")
            return F.lower(F.conv(m.cast("string"), 10, 16))

        # h NOT NULL guard: array_join silently drops null elements, so
        # masking a NULL canon would yield '' instead of NULL
        return F.when(
            (p >= 0) & (p <= 128) & h.isNotNull(),
            F.array_join(
                F.transform(F.sequence(F.lit(0), F.lit(31)), nib), ""
            ),
        )

    return _let_bind(
        F.struct(hex32.alias("h"), prefix.cast("long").alias("p")), mask
    )


def _ipv6_pair(c: Column) -> Column:
    """``(h, l)`` signed-BIGINT pair of an IPv6/IPv4 string — the two
    64-bit halves of the 128-bit address with exact bit patterns
    (``conv(.., 16, -10)`` emits the two's-complement signed value, so
    the long holds the same bits as the address half).  NULL on
    malformed input.  Equality of prefix-masked pairs ⇔ first-p-bits
    equality, which lets ``evaluate ipv6_lookup`` replace per-(row ×
    prefix) substring/conv work on the 32-nibble hex canon with two
    bitwise ANDs against literal masks."""
    return _let_bind(
        _ipv6_hex32(c),
        lambda h: F.when(
            h.isNotNull(),
            F.struct(
                F.conv(F.substring(h, 1, 16), 16, -10)
                .cast("long")
                .alias("h"),
                F.conv(F.substring(h, 17, 16), 16, -10)
                .cast("long")
                .alias("l"),
            ),
        ),
    )


def _mask64(kept: int) -> int:
    """Signed-64 bitmask keeping the top ``kept`` bits, as a python
    int castable to a Spark LongType literal."""
    if kept <= 0:
        return 0
    m = (-1 << (64 - min(kept, 64))) & ((1 << 64) - 1)
    return m - (1 << 64) if m >= (1 << 63) else m


def _ipv6_pair_masked(pair: Column, prefix: Column) -> Column:
    """Prefix-masked (h, l) pair under a RUNTIME /prefix — the
    lookup-table side of ``ipv6_lookup`` (tiny, so the branchy runtime
    mask is fine; the fact side uses compile-time literal masks).
    NULL on invalid prefix or NULL pair."""

    def mask_half(v: Column, kept: Column) -> Column:
        m = (
            F.when(kept <= 0, F.lit(0).cast("long"))
            .when(kept >= 64, F.lit(-1).cast("long"))
            .otherwise(
                F.call_function(
                    "shiftleft",
                    F.lit(-1).cast("long"),
                    (F.lit(64) - kept).cast("int"),
                )
            )
        )
        return v.bitwiseAND(m)

    def km(pp: Column) -> Column:
        p, pr = pp.getField("p"), pp.getField("a")
        return F.when(
            (p >= 0) & (p <= 128) & pr.isNotNull(),
            F.struct(
                mask_half(
                    pr.getField("h"), F.least(p, F.lit(64))
                ).alias("h"),
                mask_half(pr.getField("l"), p - 64).alias("l"),
            ),
        )

    return _let_bind(
        F.struct(prefix.cast("long").alias("p"), pair.alias("a")), km
    )


def _hex32_colons(hex32: Column) -> Column:
    """32-nibble hex → canonical colon-separated form."""
    return _let_bind(
        hex32,
        lambda h: F.when(
            h.isNotNull(),
            F.concat_ws(
                ":",
                *[F.substring(h, g * 4 + 1, 4) for g in range(8)],
            ),
        ),
    )


def _slash_addr(c: Column) -> Column:
    return F.element_at(F.split(c, "/", -1), 1)


def _slash_prefix(c: Column, default: int) -> Column:
    return F.coalesce(
        F.try_element_at(F.split(c, "/", -1), F.lit(2)).try_cast("long"),
        F.lit(default),
    )


def _range_prefix6(c: Column) -> Column:
    """Effective 128-bit prefix of a `/p`-suffixed address in an IPv6
    context.  IPv4-notation addresses ('10.0.0.0/8') apply the prefix
    to the v4 part of the ::ffff-mapped form — bit offset 96 — matching
    KQL's mixed-notation semantics; default /32 → /128."""
    suf = F.try_element_at(F.split(c, "/", -1), F.lit(2)).try_cast("long")
    is4 = _slash_addr(c).rlike(r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$")
    return F.when(
        is4,
        F.lit(96) + F.least(F.coalesce(suf, F.lit(32)), F.lit(32)),
    ).otherwise(F.coalesce(suf, F.lit(128)))


def _ipv6_family(
    lname: str, name: str, args: list[Column], span: Span
) -> Column:
    if lname == "parse_ipv6":
        _check_argc(name, args, 1, 1, span)
        return _hex32_colons(_ipv6_hex32(args[0]))
    if lname == "parse_ipv6_mask":
        _check_argc(name, args, 2, 2, span)
        return _hex32_colons(
            _ipv6_mask_hex(_ipv6_hex32(args[0]), args[1].cast("long"))
        )
    if lname == "ipv6_compare":
        _check_argc(name, args, 2, 3, span)
        prefix = args[2].cast("long") if len(args) == 3 else F.lit(128)
        pair = F.struct(
            _ipv6_mask_hex(_ipv6_hex32(args[0]), prefix).alias("a"),
            _ipv6_mask_hex(_ipv6_hex32(args[1]), prefix).alias("b"),
        )
        return _let_bind(
            pair,
            lambda p: F.when(
                p.getField("a") < p.getField("b"), F.lit(-1)
            )
            .when(p.getField("a") > p.getField("b"), F.lit(1))
            .when(p.getField("a") == p.getField("b"), F.lit(0))
            .cast("long"),
        )
    if lname == "ipv6_is_match":
        # both sides may carry a /prefix suffix; effective prefix is the
        # minimum of the suffixes and the optional third argument (KQL)
        _check_argc(name, args, 2, 3, span)
        parg = args[2].cast("long") if len(args) == 3 else F.lit(128)
        prefix = F.least(
            _range_prefix6(args[0]), _range_prefix6(args[1]), parg
        )
        a = _ipv6_mask_hex(_ipv6_hex32(_slash_addr(args[0])), prefix)
        b = _ipv6_mask_hex(_ipv6_hex32(_slash_addr(args[1])), prefix)
        return a == b
    if lname in ("ipv6_is_in_range", "ipv6_is_in_any_range"):
        hi = 99 if lname == "ipv6_is_in_any_range" else 2
        _check_argc(name, args, 2, hi, span)
        ip = _ipv6_hex32(args[0])

        def in_rng(iph: Column, rng: Column) -> Column:
            prefix = _range_prefix6(rng)
            return _ipv6_mask_hex(iph, prefix) == _ipv6_mask_hex(
                _ipv6_hex32(_slash_addr(rng)), prefix
            )

        def fold(ipb: Column) -> Column:
            out = in_rng(ipb, args[1])
            for r in args[2:]:
                out = out | in_rng(ipb, r)
            return out

        return _let_bind(ip, fold)
    if lname == "ipv4_is_match":
        _check_argc(name, args, 2, 3, span)
        parg = args[2].cast("long") if len(args) == 3 else F.lit(32)
        prefix = F.least(
            _slash_prefix(args[0], 32), _slash_prefix(args[1], 32), parg
        )
        shift = (F.lit(32) - prefix).cast("double")

        def m(c: Column) -> Column:
            return F.when(
                (prefix >= 0) & (prefix <= 32),
                F.floor(
                    _ipv4_long(_slash_addr(c)) / F.pow(F.lit(2.0), shift)
                ).cast("long"),
            )

        return m(args[0]) == m(args[1])
    # ipv4_is_in_any_range
    _check_argc(name, args, 2, 99, span)
    ipl = _ipv4_long(args[0])

    def v4_rng(ipv: Column, rng: Column) -> Column:
        prefix = _slash_prefix(rng, 32)
        shift = (F.lit(32) - prefix).cast("double")

        def m(v: Column) -> Column:
            return F.when(
                (prefix >= 0) & (prefix <= 32),
                F.floor(v / F.pow(F.lit(2.0), shift)).cast("long"),
            )

        return m(ipv) == m(_ipv4_long(_slash_addr(rng)))

    def v4fold(ipb: Column) -> Column:
        out = v4_rng(ipb, args[1])
        for r in args[2:]:
            out = out | v4_rng(ipb, r)
        return out

    return _let_bind(ipl, v4fold)


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
        from .ast_nodes import StringLit, TimespanLit

        lit: str | int | None = None
        if ast_args is not None:
            if isinstance(ast_args[1], StringLit):
                lit = ast_args[1].value
            elif isinstance(ast_args[1], TimespanLit):
                lit = ast_args[1].microseconds
        return bin_fn(args[0], args[1], lit, span)
    if lname == "not":
        _check_argc(name, args, 1, 1, span)
        return ~args[0]
    if lname == "now":
        _check_argc(name, args, 0, 0, span)
        return F.current_timestamp()
    if lname == "ago":
        # EXTENSION (KQL): ago(1h) / ago("1h") == now() - 1h
        _check_argc(name, args, 1, 1, span)
        from .ast_nodes import StringLit, TimespanLit

        if ast_args is not None and isinstance(ast_args[0], TimespanLit):
            usec = ast_args[0].microseconds
        elif ast_args is not None and isinstance(ast_args[0], StringLit):
            usec = _duration_usec(ast_args[0].value, span)
        else:
            raise ParseError(
                "ago() takes a timespan literal, e.g. ago(1h)", span
            )
        return F.current_timestamp() - timespan_interval(usec)
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
        # dcount(x) is EXACT; dcount(x, accuracy) opts into the KQL-style
        # HLL approximation (accuracy 0..4 → relative error, as in KQL
        # docs) — the scale path: mergeable sketch, no exact-distinct
        # shuffle explosion.  Datasketches HLL (hll_sketch_agg), NOT
        # approx_count_distinct: Spark's HLL++ allocates dense register
        # arrays per group and is ~45× slower at tight rsd (measured
        # 5.5s vs 0.12s at sf0.1); the lgK ladder lands on KQL's error
        # tiers exactly (1.04/√2^lgk: 1.6/0.8/0.4/0.28/0.2 %)
        _check_argc(name, args, 1, 2, span)
        if len(args) == 1:
            return F.count_distinct(args[0])
        acc = _lit_int(name, ast_args, 1, span)
        return F.hll_sketch_estimate(
            F.hll_sketch_agg(args[0], hll_lgk(name, acc, span))
        )
    if lname == "hll":
        # KQL hll(x[, accuracy]) → Datasketches HLL sketch (binary,
        # mergeable with hll_merge; read with dcount_hll)
        _check_argc(name, args, 1, 2, span)
        if len(args) == 1:
            return F.hll_sketch_agg(args[0])
        acc = _lit_int(name, ast_args, 1, span)
        return F.hll_sketch_agg(args[0], hll_lgk(name, acc, span))
    if lname == "hll_merge":
        _check_argc(name, args, 1, 1, span)
        return F.hll_union_agg(args[0])
    if lname == "dcount_hll":
        _check_argc(name, args, 1, 1, span)
        return F.hll_sketch_estimate(args[0])
    if lname == "dcount_intersect":
        # KQL dcount_intersect(hll1, hll2[, hll3]) — intersection
        # cardinality of pre-aggregated HLL sketches via inclusion-
        # exclusion (2-3 sets); clamped at 0.  Scalar over sketch
        # binaries: composes with hll()/hll_merge across days/shards —
        # the no-reshuffle retention-overlap path at 100 TB.
        _check_argc(name, args, 2, 3, span)
        est = F.hll_sketch_estimate

        def uni(*ss: Column) -> Column:
            out = ss[0]
            for s in ss[1:]:
                out = F.hll_union(out, s, True)
            return est(out)

        if len(args) == 2:
            a, b = args
            raw = est(a) + est(b) - uni(a, b)
        else:
            a, b, c = args
            raw = (
                est(a) + est(b) + est(c)
                - uni(a, b) - uni(a, c) - uni(b, c)
                + uni(a, b, c)
            )
        return F.greatest(raw, F.lit(0).cast("long"))
    if lname == "dcountif":
        _check_argc(name, args, 2, 2, span)
        return F.count_distinct(F.when(args[1], args[0]))
    if lname in ("count_distinct", "count_distinctif"):
        # KQL aliases of the exact dcount family
        k = 1 if lname == "count_distinct" else 2
        _check_argc(name, args, k, k, span)
        x = args[0] if k == 1 else F.when(args[1], args[0])
        return F.count_distinct(x)
    if lname == "take_anyif":
        _check_argc(name, args, 2, 2, span)
        return F.any_value(F.when(args[1], args[0]), True)
    if lname in ("sumif", "avgif", "minif", "maxif"):
        _check_argc(name, args, 2, 2, span)
        agg = {"sumif": F.sum, "avgif": F.avg, "minif": F.min,
               "maxif": F.max}[lname]
        return agg(F.when(args[1], args[0]))
    # EXTENSION (KQL series_* over array columns — the make-series
    # companions).  All-double arithmetic; element-only lambdas, so no
    # HOF re-evaluation hazard (the array is a plain column reference).
    if lname == "series_outliers":
        # per-element population z-scores over the series (simplified
        # KQL series_outliers: flags |z| spikes; zero-variance series →
        # all-zero).  The mean/std subtrees are re-evaluated per element
        # (no CSE into interpreted lambdas) — fine for make-series
        # arrays, whose length is the bin count, not the row count.
        _check_argc(name, args, 1, 1, span)
        arr = args[0]
        n = F.size(arr).cast("double")
        mean = F.aggregate(
            arr, F.lit(0.0), lambda acc, x: acc + x.cast("double")
        ) / n
        var = (
            F.aggregate(
                arr,
                F.lit(0.0),
                lambda acc, x: acc
                + (x.cast("double") - mean) * (x.cast("double") - mean),
            )
            / n
        )
        std = F.sqrt(var)
        return F.transform(
            arr,
            lambda x: F.when(std > 0.0, (x.cast("double") - mean) / std)
            .otherwise(F.lit(0.0)),
        )
    if lname in ("series_sum", "array_sum"):
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
    if lname == "series_fill_backward":
        # carry the NEXT non-null value backward; trailing nulls stay
        # null — reverse ∘ fill_forward ∘ reverse (same fold shape as
        # the SQL twin for bit equality)
        _check_argc(name, args, 1, 1, span)
        return F.reverse(
            F.aggregate(
                F.reverse(args[0]),
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
    if lname == "series_fir":
        # series_fir(arr, filter[, normalize[, center]]) — FIR filter
        # (weighted moving window).  Trailing window by default;
        # center=true centers it.  Edges use the partial window, and
        # normalize=true (default) divides by the sum of the
        # coefficients actually applied — so a [1,1,1] filter is a
        # proper moving average everywhere (documented edge semantics)
        _check_argc(name, args, 2, 4, span)
        from .ast_nodes import Ident as _Id

        def _bool_lit(i: int, default: bool) -> bool:
            if len(args) <= i:
                return default
            a = ast_args[i] if ast_args is not None else None
            if isinstance(a, _Id) and a.name in ("true", "false"):
                return a.name == "true"
            raise ParseError(
                f"{name}() argument {i + 1} must be true or false", span
            )

        normalize = _bool_lit(2, True)
        center = _bool_lit(3, False)

        def fir(ab: Column) -> Column:
            arr, flt = ab["a"], ab["f"]
            m = F.size(flt)
            n = F.size(arr)
            half = F.floor((m - 1) / 2).cast("int")
            back = (m - 1) - half if center else m - 1
            fwd = half if center else F.lit(0)

            def at(i: Column) -> Column:
                lo = F.greatest(F.lit(1), i - back)
                hi = F.least(n, i + fwd)
                w = F.slice(arr, lo, hi - lo + 1)
                # coefficients aligned so flt[m] multiplies arr[hi]
                fs = F.slice(flt, m - (hi - lo), hi - lo + 1)
                num = F.aggregate(
                    F.zip_with(
                        w, fs,
                        lambda x, c: x.cast("double")
                        * c.cast("double"),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + F.coalesce(x, F.lit(0.0)),
                )
                if not normalize:
                    return num
                den = F.aggregate(
                    fs, F.lit(0.0),
                    lambda acc, x: acc + x.cast("double"),
                )
                return F.when(den != 0.0, num / den)

            return F.when(
                n > 0, F.transform(F.sequence(F.lit(1), n), at)
            ).otherwise(F.array().cast("array<double>"))

        return _let_bind(
            F.struct(args[0].alias("a"), args[1].alias("f")), fir
        )
    if lname == "series_iir":
        # series_iir(arr, b, a) — recursive (IIR) filter:
        #   y[i] = (Σⱼ b[j+1]·x[i−j]  −  Σₖ₌₁ a[k+1]·y[i−k]) / a[1]
        # Out-of-range x/y terms contribute 0; null elements are
        # treated as 0.0 (documented).  One sequential O(n·(|b|+|a|))
        # fold over the bin index — bin-count-sized work, matching the
        # reference KQL semantics for explicit literal coefficients.
        _check_argc(name, args, 3, 3, span)

        def iir(s: Column) -> Column:
            x, b, a = s["x"], s["b"], s["a"]
            n = F.size(x)
            nb, na = F.size(b), F.size(a)

            def step(acc: Column, i: Column) -> Column:
                # feed-forward: b[1]*x[i], b[2]*x[i-1], …
                lo = F.greatest(F.lit(1), i - nb + 1)
                xs = F.reverse(F.slice(x, lo, i - lo + 1))
                num = F.aggregate(
                    F.zip_with(
                        xs, F.slice(b, 1, i - lo + 1),
                        lambda xv, c: F.coalesce(
                            xv.cast("double"), F.lit(0.0)
                        ) * c.cast("double"),
                    ),
                    F.lit(0.0),
                    lambda t, v: t + F.coalesce(v, F.lit(0.0)),
                )
                # feedback: a[2]*y[i-1], a[3]*y[i-2], …
                ylo = F.greatest(F.lit(1), i - na + 1)
                ys = F.reverse(F.slice(acc, ylo, i - 1 - ylo + 1))
                fb = F.aggregate(
                    F.zip_with(
                        ys, F.slice(a, 2, i - ylo),
                        lambda yv, c: yv * c.cast("double"),
                    ),
                    F.lit(0.0),
                    lambda t, v: t + F.coalesce(v, F.lit(0.0)),
                )
                yi = (num - fb) / F.element_at(a, 1).cast("double")
                return F.concat(acc, F.array(yi))

            return F.when(
                n > 0,
                F.aggregate(
                    F.sequence(F.lit(1), n),
                    F.array().cast("array<double>"),
                    step,
                ),
            ).otherwise(F.array().cast("array<double>"))

        return _let_bind(
            F.struct(
                args[0].alias("x"), args[1].alias("b"),
                args[2].alias("a"),
            ),
            iir,
        )
    if lname in ("series_fft", "series_ifft"):
        # KQL series_fft/series_ifft over make-series arrays: direct
        # DFT as a Catalyst fold — O(bins²) work per row, which for
        # make-series bin counts (tens-hundreds) is cheap, keeps the
        # whole expression in codegen, and is exactly reproducible by
        # a SQL twin (no numpy kernel, no UDF).  Returns a struct of
        # (real, imag) arrays; the inverse divides by n.
        _check_argc(name, args, 1, 2, span)
        inverse = lname == "series_ifft"
        sign = 1.0 if inverse else -1.0
        xi_arg = (
            args[1]
            if len(args) == 2
            else F.transform(args[0], lambda _: F.lit(0.0))
        )

        def dft(s: Column) -> Column:
            xr, xi = s["r"], s["i"]
            n = F.size(xr)

            def coef(k: Column) -> Column:
                def term(acc: Column, j: Column) -> Column:
                    theta = (
                        F.lit(2.0) * F.lit(math.pi)
                        * (j - 1).cast("double")
                        * (k - 1).cast("double")
                        / n.cast("double")
                    )
                    c, sn = F.cos(theta), F.lit(sign) * F.sin(theta)
                    rj = F.element_at(xr, j).cast("double")
                    ij = F.element_at(xi, j).cast("double")
                    return F.struct(
                        (acc["re"] + rj * c - ij * sn).alias("re"),
                        (acc["im"] + rj * sn + ij * c).alias("im"),
                    )

                tot = F.aggregate(
                    F.sequence(F.lit(1), n),
                    F.struct(
                        F.lit(0.0).alias("re"), F.lit(0.0).alias("im")
                    ),
                    term,
                )
                if inverse:
                    return F.struct(
                        (tot["re"] / n).alias("re"),
                        (tot["im"] / n).alias("im"),
                    )
                return tot

            # sequence(1, 0) counts DOWN — guard the empty series
            coefs = F.when(
                n > 0, F.transform(F.sequence(F.lit(1), n), coef)
            ).otherwise(
                F.array().cast(
                    "array<struct<re:double,im:double>>"
                )
            )
            return F.struct(
                F.transform(coefs, lambda c: c["re"]).alias("real"),
                F.transform(coefs, lambda c: c["im"]).alias("imag"),
            )

        return _let_bind(
            F.struct(args[0].alias("r"), xi_arg.alias("i")), dft
        )
    if lname == "series_seasonal":
        # per-phase means of the series (simplified KQL series_seasonal
        # with an explicit integer period)
        _check_argc(name, args, 2, 2, span)
        p = _lit_int(name, ast_args, 1, span)
        if p < 1:
            raise ParseError(f"{name}() period must be >= 1", span)

        def seasonal(arr: Column) -> Column:
            n = F.size(arr)

            def phase_mean(i: Column) -> Column:
                ph = F.pmod(i - 1, F.lit(p))
                members = F.filter(
                    F.sequence(F.lit(1), n),
                    lambda j: F.pmod(j - 1, F.lit(p)) == ph,
                )
                tot = F.aggregate(
                    members, F.lit(0.0),
                    lambda acc, j: acc
                    + F.element_at(arr, j).cast("double"),
                )
                return tot / F.size(members)

            return F.when(
                n > 0, F.transform(F.sequence(F.lit(1), n), phase_mean)
            ).otherwise(F.array().cast("array<double>"))

        return _let_bind(args[0], seasonal)
    if lname == "series_periods_detect":
        # series_periods_detect(arr, min_period, max_period, n) —
        # top-n candidate periods by normalized autocorrelation
        # (simplified KQL: integer lags in [min, max], score =
        # autocorr(lag) of the demeaned series).  Returns a struct of
        # (periods, scores), both arrays, score-descending
        _check_argc(name, args, 4, 4, span)
        pmin = _lit_int(name, ast_args, 1, span)
        pmax = _lit_int(name, ast_args, 2, span)
        topn = _lit_int(name, ast_args, 3, span)
        if not (1 <= pmin <= pmax) or topn < 1:
            raise ParseError(
                f"{name}() needs 1 <= min <= max and n >= 1", span
            )

        def detect(arr: Column) -> Column:
            n = F.size(arr)
            mean = _arr_mean(arr)

            def with_dm(dm: Column) -> Column:
                den = F.aggregate(
                    dm, F.lit(0.0), lambda acc, x: acc + x * x
                )

                def score(lag: Column) -> Column:
                    num = F.aggregate(
                        F.when(
                            n > lag,
                            F.sequence(F.lit(1), n - lag),
                        ).otherwise(F.array().cast("array<int>")),
                        F.lit(0.0),
                        lambda acc, i: acc
                        + F.element_at(dm, i)
                        * F.element_at(dm, i + lag),
                    )
                    return F.when(den > 0.0, num / den).otherwise(
                        F.lit(0.0)
                    )

                cands = F.transform(
                    F.sequence(F.lit(pmin), F.lit(pmax)),
                    lambda lag: F.struct(
                        score(lag).alias("score"),
                        lag.cast("long").alias("period"),
                    ),
                )
                top = F.slice(
                    F.reverse(F.array_sort(cands)), 1,
                    min(topn, pmax - pmin + 1),
                )
                return F.struct(
                    F.transform(top, lambda c: c["period"]).alias(
                        "periods"
                    ),
                    F.transform(
                        top, lambda c: F.round(c["score"], 4)
                    ).alias("scores"),
                )

            demeaned = F.transform(
                arr, lambda x: x.cast("double") - mean
            )
            return _let_bind(demeaned, with_dm)

        return _let_bind(args[0], detect)
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
    if lname in ("max_of", "min_of"):
        # KQL max_of/min_of: variadic scalar max/min, nulls ignored
        # (greatest/least skip NULLs in Spark ≥3.4? they return NULL if
        # any input is NULL pre-3.0; Spark's greatest ignores NULLs)
        if len(args) < 2:
            raise ParseError(f"{name}() takes at least 2 arguments", span)
        return (F.greatest if lname == "max_of" else F.least)(*args)
    if lname == "bin_at":
        # bin_at(value, binSize, fixedPoint) — buckets aligned to
        # fixedPoint instead of the epoch
        _check_argc(name, args, 3, 3, span)
        from .ast_nodes import StringLit, TimespanLit

        lit: int | None = None
        if ast_args is not None:
            if isinstance(ast_args[1], StringLit):
                lit = _duration_usec(ast_args[1].value, span)
            elif isinstance(ast_args[1], TimespanLit):
                lit = ast_args[1].microseconds
        if lit is not None:
            fp = F.unix_micros(args[2])
            return F.timestamp_micros(
                F.floor((F.unix_micros(args[0]) - fp) / F.lit(lit))
                .cast("long") * F.lit(lit) + fp
            )
        return (
            F.floor((args[0] - args[2]) / args[1]) * args[1] + args[2]
        )
    if lname == "rand":
        # rand() uniform [0,1); rand(n) uniform integer 0..n-1 —
        # nondeterministic by nature (no fixed seed, like KQL)
        _check_argc(name, args, 0, 1, span)
        if len(args) == 1:
            return F.floor(F.rand() * args[0]).cast("long")
        return F.rand()
    if lname == "range" and (ast_args is None or len(args) in (2, 3)):
        # scalar range(start, stop[, step]) → inclusive array
        _check_argc(name, args, 2, 3, span)
        return F.sequence(*args)
    if lname == "zip":
        # KQL zip: element-wise zip of N arrays into an array of
        # N-element arrays; zip-to-longest with null padding
        if len(args) < 2:
            raise ParseError("zip() takes at least 2 arrays", span)

        def zipped(arrs: Column) -> Column:
            n = F.array_max(F.transform(arrs, F.size))
            return F.when(
                n > 0,
                F.transform(
                    F.sequence(F.lit(1), n),
                    lambda i: F.transform(
                        arrs, lambda a: F.try_element_at(a, i)
                    ),
                ),
            )

        return _let_bind(F.array(*args), zipped)
    if lname == "array_split":
        # array_split(arr, index | [i1, i2, …]) → array of subarrays
        # split BEFORE each 0-based index; negative indices count from
        # the end (KQL semantics)
        _check_argc(name, args, 2, 2, span)
        from .ast_nodes import NumberLit

        idx_arr = (
            F.array(args[1])
            if ast_args is not None
            and isinstance(ast_args[1], NumberLit)
            else args[1]
        )

        def split_at(arr: Column) -> Column:
            def with_pts(pts: Column) -> Column:
                return F.transform(
                    F.sequence(F.lit(1), F.size(pts) - 1),
                    lambda i: F.slice(
                        arr,
                        F.element_at(pts, i) + 1,
                        F.element_at(pts, i + 1)
                        - F.element_at(pts, i),
                    ),
                )

            norm = F.transform(
                idx_arr,
                lambda i: F.greatest(
                    F.lit(0),
                    F.least(
                        F.size(arr),
                        F.when(i < 0, F.size(arr) + i).otherwise(i)
                        .cast("int"),
                    ),
                ),
            )
            pts = F.concat(
                F.array(F.lit(0)), norm, F.array(F.size(arr))
            )
            return _let_bind(pts, with_pts)

        return _let_bind(args[0], split_at)
    if lname == "isinf":
        _check_argc(name, args, 1, 1, span)
        x = args[0].cast("double")
        return F.coalesce(
            (x == F.lit(float("inf"))) | (x == F.lit(float("-inf"))),
            F.lit(False),
        )
    if lname == "isascii":
        _check_argc(name, args, 1, 1, span)
        return F.coalesce(
            args[0].rlike("^[\\x00-\\x7F]*$"), F.lit(False)
        )
    if lname == "translate":
        # KQL arg order (searchList, replacementList, text)
        _check_argc(name, args, 3, 3, span)
        return F.call_function("translate", args[2], args[0], args[1])
    if lname == "hash_sha256":
        _check_argc(name, args, 1, 1, span)
        return F.sha2(args[0].cast("string"), 256)
    if lname == "url_encode_component":
        # like url_encode but %20 for space (RFC 3986 component form)
        _check_argc(name, args, 1, 1, span)
        return F.replace(
            F.call_function("url_encode", args[0]),
            F.lit("+"), F.lit("%20"),
        )
    if lname == "toguid":
        # canonical lowercase GUID or NULL (KQL toguid)
        _check_argc(name, args, 1, 1, span)

        def guid(s: Column) -> Column:
            ok = s.rlike(
                "^[0-9A-Fa-f]{8}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}"
                "-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{12}$"
            )
            return F.when(ok, F.lower(s))

        return _let_bind(args[0].cast("string"), guid)
    if lname == "todecimal":
        _check_argc(name, args, 1, 1, span)
        return args[0].try_cast("decimal(38,18)")
    if lname == "endofweek":
        _check_argc(name, args, 1, 1, span)
        x = args[0]
        start = F.date_trunc("DAY", x) - F.make_interval(
            days=F.dayofweek(x) - 1
        )
        return (
            start + F.make_interval(days=F.lit(7))
            - F.expr("INTERVAL 1 MICROSECOND")
        )
    if lname == "datetime_part":
        # datetime_part("part", dt) → integer component
        _check_argc(name, args, 2, 2, span)
        part = _lit_str(name, ast_args, 0, span, "part literal").lower()
        simple = {
            "year": "YEAR", "quarter": "QUARTER", "month": "MONTH",
            "week_of_year": "WEEK", "day": "DAY",
            "dayofyear": "DOY", "hour": "HOUR", "minute": "MINUTE",
        }
        if part in simple:
            return F.call_function(
                "date_part", F.lit(simple[part]), args[1]
            ).cast("long")
        usec = F.unix_micros(args[1])
        if part == "second":
            return F.floor(
                F.call_function("date_part", F.lit("SECOND"), args[1])
            ).cast("long")
        if part == "millisecond":
            return F.pmod(F.floor(usec / 1000), F.lit(1000)).cast("long")
        if part == "microsecond":
            return F.pmod(usec, F.lit(1000000)).cast("long")
        if part == "nanosecond":
            return (F.pmod(usec, F.lit(1000000)) * 1000).cast("long")
        raise ParseError(
            f"datetime_part(): unsupported part {part!r}", span
        )
    if lname == "format_bytes":
        # format_bytes(size[, precision[, units]]): auto unit ladder;
        # precision 0 (default) renders an integer
        _check_argc(name, args, 1, 3, span)
        prec = (
            _lit_int(name, ast_args, 1, span) if len(args) >= 2 else 0
        )
        units = ["Bytes", "KB", "MB", "GB", "TB", "PB", "EB"]
        x = args[0].cast("double")

        def render(v: Column) -> Column:
            r = F.round(v, prec)
            return (
                r.cast("long").cast("string") if prec == 0
                else r.cast("string")
            )

        if len(args) == 3:
            unit = _lit_str(name, ast_args, 2, span, "units literal")
            if unit not in units:
                raise ParseError(
                    f"format_bytes(): unknown unit {unit!r}", span
                )
            k = units.index(unit)
            return F.concat(
                render(x / F.lit(float(1024 ** k))), F.lit(" " + unit)
            )
        out = F.concat(render(x), F.lit(" Bytes"))
        for k in range(1, len(units)):
            out = F.when(
                x >= F.lit(float(1024 ** k)),
                F.concat(
                    render(x / F.lit(float(1024 ** k))),
                    F.lit(" " + units[k]),
                ),
            ).otherwise(out)
        return out
    if lname == "format_timespan":
        # format_timespan(ts, pattern) — pattern is a literal with
        # d/h/m/s/f token runs; everything else copies verbatim
        _check_argc(name, args, 2, 2, span)
        pattern = _lit_str(name, ast_args, 1, span, "format literal")
        itv = args[0]

        def part(unit: str) -> Column:
            return F.call_function(
                "date_part", F.lit(unit), itv
            )

        pieces: list[Column] = []
        for kind, text in parse_ts_format(pattern):
            if kind == "lit":
                pieces.append(F.lit(text))
                continue
            ch, n = text[0], len(text)
            if ch == "d":
                v = part("DAY").cast("long")
            elif ch in ("h", "H"):
                v = part("HOUR").cast("long")
            elif ch == "m":
                v = part("MINUTE").cast("long")
            elif ch == "s":
                v = F.floor(part("SECOND")).cast("long")
            else:  # f — fraction digits
                frac = part("SECOND") - F.floor(part("SECOND"))
                pieces.append(
                    F.lpad(
                        F.floor(frac * F.lit(10 ** n)).cast("string"),
                        n, "0",
                    )
                )
                continue
            pieces.append(
                F.lpad(v.cast("string"), n, "0") if n > 1
                else v.cast("string")
            )
        return F.concat(*pieces)
    if lname == "parse_version":
        # canonical zero-padded "0000000A.0000000B.0000000C.0000000D"
        # string — lexicographically comparable like KQL's parse_version
        _check_argc(name, args, 1, 1, span)

        def build(s: Column) -> Column:
            parts = F.split(s, r"\.")
            ok = (
                s.rlike(r"^\d+(\.\d+){0,3}$")
                & (F.size(parts) <= 4)
            )
            comps = [
                F.lpad(
                    F.coalesce(
                        F.try_element_at(parts, F.lit(i + 1)),
                        F.lit("0"),
                    ),
                    8, "0",
                )
                for i in range(4)
            ]
            return F.when(ok, F.concat_ws(".", *comps))

        return _let_bind(args[0].cast("string"), build)
    if lname == "parse_path":
        # struct of path components (RootPath/DirectoryPath/
        # DirectoryName/Filename/Extension), both / and \ separators
        _check_argc(name, args, 1, 1, span)

        def build(p: Column) -> Column:
            norm = F.replace(p, F.lit("\\"), F.lit("/"))
            dirpath = F.regexp_extract(norm, r"^(.*)/[^/]*$", 1)
            return F.struct(
                F.regexp_extract(norm, r"^((?:[A-Za-z]:)?/)", 1)
                .alias("RootPath"),
                dirpath.alias("DirectoryPath"),
                F.regexp_extract(dirpath, r"([^/]+)$", 1)
                .alias("DirectoryName"),
                F.regexp_extract(norm, r"([^/]*)$", 1).alias("Filename"),
                F.regexp_extract(norm, r"\.([^./]+)$", 1)
                .alias("Extension"),
            )

        return _let_bind(args[0].cast("string"), build)
    if lname in _SERIES_BINOPS:
        # element-wise series arithmetic/comparison: zip-to-longest,
        # null elements propagate NULL (KQL yields null there too)
        _check_argc(name, args, 2, 2, span)
        op = _SERIES_BINOPS[lname]
        return F.zip_with(
            args[0], args[1],
            lambda x, y: op(x.cast("double"), y.cast("double")),
        )
    if lname in _SERIES_UNOPS:
        _check_argc(name, args, 1, 1, span)
        op = _SERIES_UNOPS[lname]
        return F.transform(args[0], lambda x: op(x.cast("double")))
    if lname == "series_dot_product":
        _check_argc(name, args, 2, 2, span)
        return _series_dot(args[0], args[1])
    if lname == "series_magnitude":
        _check_argc(name, args, 1, 1, span)
        return _let_bind(args[0], lambda a: F.sqrt(_series_dot(a, a)))
    if lname == "series_cosine_similarity":
        _check_argc(name, args, 2, 2, span)

        def cos(ab: Column) -> Column:
            a, b = ab["a"], ab["b"]
            denom = F.sqrt(_series_dot(a, a)) * F.sqrt(_series_dot(b, b))
            return F.when(denom > 0, _series_dot(a, b) / denom)

        return _let_bind(
            F.struct(args[0].alias("a"), args[1].alias("b")), cos
        )
    if lname == "series_pearson_correlation":
        _check_argc(name, args, 2, 2, span)

        def corr(ab: Column) -> Column:
            a, b = ab["a"], ab["b"]
            n = F.least(F.size(a), F.size(b)).cast("double")
            sx = _series_dot(a, F.transform(a, lambda x: F.lit(1.0)))
            sy = _series_dot(b, F.transform(b, lambda x: F.lit(1.0)))
            sxx = _series_dot(a, a)
            syy = _series_dot(b, b)
            sxy = _series_dot(a, b)
            denom = F.sqrt(
                (n * sxx - sx * sx) * (n * syy - sy * sy)
            )
            return F.when(denom > 0, (n * sxy - sx * sy) / denom)

        return _let_bind(
            F.struct(args[0].alias("a"), args[1].alias("b")), corr
        )
    if lname in ("geo_distance_2points", "geo_point_in_circle"):
        # KQL geo family (simplified): great-circle distance via the
        # haversine formula on a mean-radius sphere (6371008.8 m) —
        # documented divergence from KQL's WGS84 geodesic (<0.5% for
        # typical distances).  Invalid coordinates → NULL.
        n_args = 4 if lname == "geo_distance_2points" else 5
        _check_argc(name, args, n_args, n_args, span)

        def rad(c: Column) -> Column:
            return F.radians(c.cast("double"))

        def valid(lon: Column, lat: Column) -> Column:
            return (
                (lon.cast("double") >= -180)
                & (lon.cast("double") <= 180)
                & (lat.cast("double") >= -90)
                & (lat.cast("double") <= 90)
            )

        lon1, lat1, lon2, lat2 = args[0], args[1], args[2], args[3]
        dlat = rad(lat2) - rad(lat1)
        dlon = rad(lon2) - rad(lon1)
        h = (
            F.pow(F.sin(dlat / 2), 2)
            + F.cos(rad(lat1)) * F.cos(rad(lat2))
            * F.pow(F.sin(dlon / 2), 2)
        )
        dist = F.lit(2.0 * 6371008.8) * F.asin(
            F.least(F.lit(1.0), F.sqrt(h))
        )
        dist = F.when(valid(lon1, lat1) & valid(lon2, lat2), dist)
        if lname == "geo_distance_2points":
            return dist
        return dist <= args[4].cast("double")
    if lname == "geo_point_to_cell":
        # fixed-level Morton grid cell id — the bucketing half of the
        # geo pair (geo_radius_join in operators/geo.py is the join
        # half); NULL on invalid coords or level outside [0, 26].
        # A literal level (the common case) takes the unrolled
        # shift/AND path — no per-row sequence fold
        from .ast_nodes import NumberLit
        from .operators.geo import geo_point_to_cell

        _check_argc(name, args, 3, 3, span)
        lvl_ast = ast_args[2] if ast_args is not None else None
        if isinstance(lvl_ast, NumberLit) and not lvl_ast.is_float:
            return geo_point_to_cell(
                args[0], args[1], int(lvl_ast.text, 0)
            )
        return geo_point_to_cell(args[0], args[1], args[2])
    if lname == "geo_cell_center":
        # inverse of geo_point_to_cell: struct(lon, lat) cell center
        from .ast_nodes import NumberLit
        from .operators.geo import geo_cell_center

        _check_argc(name, args, 2, 2, span)
        lvl_ast = ast_args[1] if ast_args is not None else None
        if isinstance(lvl_ast, NumberLit) and not lvl_ast.is_float:
            return geo_cell_center(args[0], int(lvl_ast.text, 0))
        return geo_cell_center(args[0], args[1])
    if lname in ("set_union", "set_intersect", "set_difference"):
        # KQL set family over arrays: variadic, results deduplicated.
        # set_difference(a, b, c) = distinct elements of a not in b∪c.
        if len(args) < 2:
            raise ParseError(
                f"{name}() takes at least 2 arguments", span
            )
        if lname == "set_union":
            out = args[0]
            for a in args[1:]:
                out = F.array_union(out, a)
            return out
        if lname == "set_intersect":
            out = args[0]
            for a in args[1:]:
                out = F.array_intersect(out, a)
            return F.array_distinct(out)
        rest = args[1]
        for a in args[2:]:
            rest = F.array_union(rest, a)
        return F.array_distinct(F.array_except(args[0], rest))
    if lname == "bag_has_key":
        # simple top-level key only (KQL's JSON-path form unsupported)
        _check_argc(name, args, 2, 2, span)
        return F.map_contains_key(args[0], args[1])
    if lname == "bag_remove_keys":
        _check_argc(name, args, 2, 2, span)
        keys = args[1]
        return F.map_filter(
            args[0], lambda k, _v: ~F.array_contains(keys, k)
        )
    if lname == "bag_set_key":
        # set-or-overwrite one key (map value types must agree)
        _check_argc(name, args, 3, 3, span)
        key, val = args[1], args[2]
        return F.map_concat(
            F.map_filter(args[0], lambda k, _v: k != key),
            F.create_map(key, val),
        )
    if lname == "bag_merge":
        # KQL bag_merge(b1, b2, …): union of keys, FIRST bag wins on
        # conflicts — map_zip_with(m1, m2, coalesce) folded left
        if len(args) < 2:
            raise ParseError(
                f"{name}() takes at least 2 arguments", span
            )
        out = args[0]
        for m in args[1:]:
            out = F.map_zip_with(
                out, m, lambda _k, v1, v2: F.coalesce(v1, v2)
            )
        return out
    if lname == "set_has_element":
        _check_argc(name, args, 2, 2, span)
        return F.array_contains(args[0], args[1])
    if lname in ("array_rotate_left", "array_rotate_right"):
        # rotate by n (mod length); negative n rotates the other way
        _check_argc(name, args, 2, 2, span)
        n = args[1].cast("int")
        if lname == "array_rotate_right":
            n = -n
        return _let_bind(
            args[0],
            lambda a: _let_bind(
                F.pmod(n, F.size(a)),
                lambda k: F.when(
                    F.size(a) > 0,
                    F.concat(
                        F.slice(a, k + 1, F.size(a) - k),
                        F.slice(a, F.lit(1), k),
                    ),
                ).otherwise(a),
            ),
        )
    if lname in ("array_shift_left", "array_shift_right"):
        # shift by n, vacated slots filled with `fill` (default null);
        # negative n shifts the other way (KQL semantics)
        _check_argc(name, args, 2, 3, span)
        fill = (
            args[2]
            if len(args) == 3
            else F.lit(None)
        )
        n = args[1].cast("int")
        if lname == "array_shift_right":
            n = -n

        def shift(a: Column) -> Column:
            size = F.size(a)
            pad = lambda k: F.array_repeat(  # noqa: E731
                fill, F.least(k, size).cast("int")
            )
            return _let_bind(
                F.least(F.greatest(n, -size), size),
                lambda k: F.when(
                    k >= 0,
                    F.concat(F.slice(a, k + 1, size - k), pad(k)),
                ).otherwise(
                    F.concat(pad(-k), F.slice(a, F.lit(1), size + k))
                ),
            )

        return _let_bind(args[0], shift)
    if lname == "array_iff":
        # element-wise conditional over three equal-length arrays;
        # null/short conditions yield null elements (KQL array_iff)
        _check_argc(name, args, 3, 3, span)
        cond, t, f = args

        def pick(c: Column, tv: Column, fv: Column) -> Column:
            return F.when(c, tv).when(~c, fv)

        return _let_bind(
            t,
            lambda tv: _let_bind(
                f,
                lambda fv: F.transform(
                    cond,
                    lambda c, i: pick(
                        c.cast("boolean"),
                        F.try_element_at(tv, i + 1),
                        F.try_element_at(fv, i + 1),
                    ),
                ),
            ),
        )
    if lname == "extractjson":
        # KQL extractjson(jsonPath, dataSource) — note the swapped
        # argument order vs Spark's get_json_object(doc, path)
        _check_argc(name, args, 2, 2, span)
        return F.call_function("get_json_object", args[1], args[0])
    if lname in (
        "ipv4_compare", "ipv4_is_in_range", "ipv4_is_private",
        "format_ipv4", "format_ipv4_mask", "parse_ipv4",
    ):
        # KQL IPv4 family (the reference's SIEM domain): all Catalyst
        # expressions — dotted-quad → uint32 with NULL on malformed
        # input, prefix masks as right-shifts
        ip_long, masked = ipv4_long, ipv4_masked

        if lname == "parse_ipv4":
            _check_argc(name, args, 1, 1, span)
            return ip_long(args[0])
        if lname in ("format_ipv4", "format_ipv4_mask"):
            # optional prefix masks to the network address;
            # format_ipv4_mask appends "/prefix" (KQL signatures)
            _check_argc(name, args, 1, 2, span)
            prefix = (
                args[1].try_cast("long")
                if len(args) == 2
                else F.lit(32).cast("long")
            )

            def fmt(v: Column) -> Column:
                dotted = F.concat_ws(
                    ".",
                    (v / 16777216).cast("long").cast("string"),
                    F.pmod((v / 65536).cast("long"), F.lit(256))
                    .cast("string"),
                    F.pmod((v / 256).cast("long"), F.lit(256))
                    .cast("string"),
                    F.pmod(v, F.lit(256)).cast("string"),
                )
                if lname == "format_ipv4_mask":
                    dotted = F.concat(
                        dotted, F.lit("/"), prefix.cast("string")
                    )
                # concat_ws would fold a NULL ip to ''
                return F.when(v.isNotNull(), dotted)

            net = _let_bind(
                ip_long(args[0]),
                lambda raw: F.when(
                    (prefix >= 0) & (prefix <= 32),
                    masked(raw, prefix)
                    * F.pow(F.lit(2.0), 32 - prefix).cast("long"),
                ),
            )
            return _let_bind(net, fmt)
        if lname == "ipv4_compare":
            _check_argc(name, args, 2, 3, span)
            prefix = (
                args[2].try_cast("long") if len(args) == 3 else F.lit(32)
            )
            a = masked(ip_long(args[0]), prefix)
            b = masked(ip_long(args[1]), prefix)
            return (
                F.when(a < b, F.lit(-1))
                .when(a > b, F.lit(1))
                .when(a == b, F.lit(0))
                .cast("long")
            )
        if lname == "ipv4_is_in_range":
            _check_argc(name, args, 2, 2, span)
            rng = F.split(args[1], "/")
            base = ip_long(F.try_element_at(rng, F.lit(1)))
            prefix = F.coalesce(
                F.try_element_at(rng, F.lit(2)).try_cast("long"),
                F.lit(32),
            )
            return masked(ip_long(args[0]), prefix) == masked(
                base, prefix
            )
        # ipv4_is_private: RFC1918 — 10/8, 172.16/12, 192.168/16
        _check_argc(name, args, 1, 1, span)
        v = ip_long(args[0])
        return (
            (F.shiftrightunsigned(v, 24) == 10)
            | (F.shiftrightunsigned(v, 20) == (172 * 16 + 1))
            | (F.shiftrightunsigned(v, 16) == (192 * 256 + 168))
        )
    if lname == "parse_url":
        # KQL parse_url → struct {Scheme, Host, Port, Path, Username,
        # Password, Fragment, QueryParameters(map)} — Spark parse_url
        # per part (KQL's "Query Parameters" key is spelled
        # QueryParameters here so it stays a plain struct field)
        _check_argc(name, args, 1, 1, span)

        def build_url(s: Column) -> Column:
            userinfo = F.split(
                F.coalesce(
                    F.try_parse_url(s, F.lit("USERINFO")), F.lit("")
                ),
                ":",
                -1,
            )
            return F.struct(
                F.try_parse_url(s, F.lit("PROTOCOL")).alias("Scheme"),
                F.try_parse_url(s, F.lit("HOST")).alias("Host"),
                F.regexp_extract(
                    F.coalesce(
                        F.try_parse_url(s, F.lit("AUTHORITY")), F.lit("")
                    ),
                    ":([0-9]+)$",
                    1,
                ).alias("Port"),
                F.try_parse_url(s, F.lit("PATH")).alias("Path"),
                F.coalesce(
                    F.element_at(userinfo, 1), F.lit("")
                ).alias("Username"),
                F.coalesce(
                    F.try_element_at(userinfo, F.lit(2)), F.lit("")
                ).alias("Password"),
                F.coalesce(
                    F.try_parse_url(s, F.lit("REF")), F.lit("")
                ).alias("Fragment"),
                F.str_to_map(
                    F.coalesce(
                        F.try_parse_url(s, F.lit("QUERY")), F.lit("")
                    ),
                    F.lit("&"),
                    F.lit("="),
                ).alias("QueryParameters"),
            )

        return _let_bind(args[0], build_url)
    if lname == "parse_urlquery":
        # KQL parse_urlquery → query-parameter map (simplified: the map
        # directly, not nested under a "Query Parameters" key)
        _check_argc(name, args, 1, 1, span)
        return F.str_to_map(
            F.regexp_replace(args[0], r"^\?", ""),
            F.lit("&"),
            F.lit("="),
        )
    if lname == "totimespan":
        # KQL totimespan: '[d.]hh:mm:ss[.fff]' strings or a timespan
        # literal; malformed → NULL
        _check_argc(name, args, 1, 1, span)
        from .ast_nodes import TimespanLit

        if ast_args is not None and isinstance(ast_args[0], TimespanLit):
            return args[0]

        def build_ts(s: Column) -> Column:
            full = s.rlike(
                r"^(\d+\.)?\d{1,2}:\d{1,2}:\d{1,2}(\.\d+)?$"
            )
            d = F.coalesce(
                F.regexp_extract(s, r"^(\d+)\.", 1).try_cast("long"),
                F.lit(0),
            )
            hh = F.regexp_extract(
                s, r"^(?:\d+\.)?(\d{1,2}):", 1
            ).try_cast("long")
            mm = F.regexp_extract(s, r":(\d{1,2}):", 1).try_cast("long")
            ss = F.regexp_extract(
                s, r":(\d{1,2}(?:\.\d+)?)$", 1
            ).try_cast("decimal(18,6)")
            return F.when(
                full, F.make_dt_interval(d, hh, mm, ss)
            )

        return _let_bind(args[0].cast("string"), build_ts)
    if lname in ("make_bag", "make_bag_if"):
        # KQL make_bag: merge map/bag values across the group
        # (first-wins on duplicate keys; key order follows input order,
        # nondeterministic across partitions like KQL's)
        _check_argc(
            name, args, 1 if lname == "make_bag" else 2,
            1 if lname == "make_bag" else 2, span,
        )
        x = args[0] if lname == "make_bag" else F.when(args[1], args[0])
        entries = F.flatten(F.collect_list(F.map_entries(x)))

        def merge(es: Column) -> Column:
            return F.map_from_entries(
                F.aggregate(
                    es,
                    F.slice(es, 1, 0),  # empty, same entry type
                    lambda acc, en: F.when(
                        F.exists(
                            acc,
                            lambda a: a.getField("key")
                            == en.getField("key"),
                        ),
                        acc,
                    ).otherwise(F.concat(acc, F.array(en))),
                )
            )

        return _let_bind(entries, merge)
    if lname in (
        "parse_ipv6", "parse_ipv6_mask", "ipv6_compare", "ipv6_is_match",
        "ipv6_is_in_range", "ipv6_is_in_any_range",
        "ipv4_is_match", "ipv4_is_in_any_range",
    ):
        return _ipv6_family(lname, name, args, span)
    if lname in ("binary_and", "binary_or", "binary_xor"):
        # KQL bitwise family over integer values
        _check_argc(name, args, 2, 2, span)
        a, b = args[0].cast("long"), args[1].cast("long")
        if lname == "binary_and":
            return a.bitwiseAND(b)
        if lname == "binary_or":
            return a.bitwiseOR(b)
        return a.bitwiseXOR(b)
    if lname == "binary_not":
        _check_argc(name, args, 1, 1, span)
        return F.bitwise_not(args[0].cast("long"))
    if lname in ("binary_shift_left", "binary_shift_right"):
        _check_argc(name, args, 2, 2, span)
        k = _lit_int(name, ast_args, 1, span)
        fn = (
            F.shiftleft if lname == "binary_shift_left" else F.shiftright
        )
        return fn(args[0].cast("long"), k)
    if lname == "series_stats":
        # KQL series_stats(arr) → struct(min, min_idx, max, max_idx,
        # avg, stdev, variance); indices are 0-based first occurrences;
        # variance/stdev are SAMPLE statistics (n-1), null when n < 2
        _check_argc(name, args, 1, 1, span)

        def stats(ad: Column) -> Column:
            n = F.size(ad)

            def with_avg(av: Column) -> Column:
                var = F.when(
                    n > 1,
                    F.aggregate(
                        ad,
                        F.lit(0.0),
                        lambda acc, x: acc + (x - av) * (x - av),
                    )
                    / (n - F.lit(1)).cast("double"),
                )
                return _let_bind(
                    var,
                    lambda v: F.struct(
                        F.array_min(ad).alias("min"),
                        (
                            F.array_position(ad, F.array_min(ad))
                            - F.lit(1)
                        ).alias("min_idx"),
                        F.array_max(ad).alias("max"),
                        (
                            F.array_position(ad, F.array_max(ad))
                            - F.lit(1)
                        ).alias("max_idx"),
                        av.alias("avg"),
                        F.sqrt(v).alias("stdev"),
                        v.alias("variance"),
                    ),
                )

            return _let_bind(_arr_mean(ad), with_avg)

        return _let_bind(
            F.transform(args[0], lambda x: x.cast("double")), stats
        )
    if lname == "series_fit_line":
        # KQL series_fit_line(arr) → struct(rsquare, slope, variance,
        # rvariance, interception, line_fit): ordinary least squares
        # against x = 0..n-1; variance/rvariance are sample statistics;
        # rsquare = 1 - rvariance/variance (1.0 for a zero-variance
        # series — the flat fit is exact)
        _check_argc(name, args, 1, 1, span)

        def fit(ad: Column) -> Column:
            n = F.size(ad).cast("double")
            xmean = (n - 1) / F.lit(2.0)
            # Σ(x-x̄)² for x=0..n-1 is n(n²-1)/12, closed form
            sxx = n * (n * n - 1) / F.lit(12.0)

            def with_ymean(ym: Column) -> Column:
                sxy = F.aggregate(
                    F.zip_with(
                        ad,
                        F.sequence(F.lit(0), F.size(ad) - 1),
                        lambda y, i: (i.cast("double") - xmean)
                        * (y - ym),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                slope = F.when(sxx > 0, sxy / sxx).otherwise(F.lit(0.0))

                def with_slope(sl: Column) -> Column:
                    interception = ym - sl * xmean
                    line = F.transform(
                        F.sequence(F.lit(0), F.size(ad) - 1),
                        lambda i: interception + sl * i.cast("double"),
                    )

                    def with_line(lf: Column) -> Column:
                        var = F.when(
                            n > 1,
                            F.aggregate(
                                ad,
                                F.lit(0.0),
                                lambda acc, x: acc
                                + (x - ym) * (x - ym),
                            )
                            / (n - 1),
                        )
                        rvar = F.when(
                            n > 1,
                            F.aggregate(
                                F.zip_with(
                                    ad, lf, lambda y, p: y - p
                                ),
                                F.lit(0.0),
                                lambda acc, x: acc + x * x,
                            )
                            / (n - 1),
                        )
                        return _let_bind(
                            var,
                            lambda v: _let_bind(
                                rvar,
                                lambda rv: F.struct(
                                    F.when(v > 0, 1.0 - rv / v)
                                    .otherwise(
                                        F.when(
                                            v.isNotNull(), F.lit(1.0)
                                        )
                                    )
                                    .alias("rsquare"),
                                    sl.alias("slope"),
                                    v.alias("variance"),
                                    rv.alias("rvariance"),
                                    interception.alias("interception"),
                                    lf.alias("line_fit"),
                                ),
                            ),
                        )

                    return _let_bind(line, with_line)

                return _let_bind(slope, with_slope)

            return _let_bind(_arr_mean(ad), with_ymean)

        return _let_bind(
            F.transform(args[0], lambda x: x.cast("double")), fit
        )
    if lname == "series_fit_2lines":
        # KQL series_fit_2lines(arr): best single change-point split
        # into two independent OLS segments (each ≥ 2 points).  Returns
        # struct(rsquare, split_idx, variance, rvariance, line_fit):
        # split_idx = 0-based first index of the right segment;
        # variance/rvariance are sample statistics; rsquare computed
        # against the total sum of squares.  O(bins²) slice+fold work
        # per row — bin-count-sized, never row-count-sized.
        _check_argc(name, args, 1, 1, span)

        def seg_ssres(seg: Column) -> Column:
            # closed-form OLS residual SS for local x = 0..m-1:
            # SSres = SStot - Sxy²/Sxx with Sxx = m(m²-1)/12
            m = F.size(seg).cast("double")
            sy = F.aggregate(seg, F.lit(0.0), lambda acc, x: acc + x)
            sy2 = F.aggregate(
                seg, F.lit(0.0), lambda acc, x: acc + x * x
            )
            sxy0 = F.aggregate(
                F.zip_with(
                    seg,
                    F.sequence(F.lit(0), F.size(seg) - 1),
                    lambda y, i: i.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            sxy = sxy0 - (m - 1) / F.lit(2.0) * sy
            sxx = m * (m * m - 1) / F.lit(12.0)
            sstot = sy2 - sy * sy / m
            return F.when(sxx > 0, sstot - sxy * sxy / sxx).otherwise(
                sstot
            )

        def seg_fit(seg: Column) -> Column:
            m = F.size(seg).cast("double")
            sy = F.aggregate(seg, F.lit(0.0), lambda acc, x: acc + x)
            sxy0 = F.aggregate(
                F.zip_with(
                    seg,
                    F.sequence(F.lit(0), F.size(seg) - 1),
                    lambda y, i: i.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            sxy = sxy0 - (m - 1) / F.lit(2.0) * sy
            sxx = m * (m * m - 1) / F.lit(12.0)
            slope = F.when(sxx > 0, sxy / sxx).otherwise(F.lit(0.0))
            return _let_bind(
                slope,
                lambda sl: _let_bind(
                    sy / m - sl * (m - 1) / F.lit(2.0),
                    lambda ic: F.transform(
                        F.sequence(F.lit(0), F.size(seg) - 1),
                        lambda i: ic + sl * i.cast("double"),
                    ),
                ),
            )

        def fit2(ad: Column) -> Column:
            n = F.size(ad)
            # candidate left sizes k = 2..n-2
            costs = F.transform(
                F.sequence(F.lit(2), n - 2),
                lambda k: seg_ssres(F.slice(ad, 1, k))
                + seg_ssres(F.slice(ad, k + 1, n - k)),
            )

            def with_best(best: Column) -> Column:
                k = best + F.lit(1)  # left size (first min is at pos-1+2)
                line = F.concat(
                    seg_fit(F.slice(ad, 1, k)),
                    seg_fit(F.slice(ad, k + 1, n - k)),
                )
                sy = F.aggregate(
                    ad, F.lit(0.0), lambda acc, x: acc + x
                )
                sy2 = F.aggregate(
                    ad, F.lit(0.0), lambda acc, x: acc + x * x
                )
                nn = n.cast("double")
                sstot = sy2 - sy * sy / nn
                ssres = F.element_at(costs, best.cast("int"))
                return F.struct(
                    F.when(sstot > 0, 1.0 - ssres / sstot)
                    .otherwise(F.lit(1.0))
                    .alias("rsquare"),
                    k.cast("long").alias("split_idx"),
                    F.when(nn > 1, sstot / (nn - 1)).alias("variance"),
                    F.when(nn > 1, ssres / (nn - 1)).alias("rvariance"),
                    line.alias("line_fit"),
                )

            # first index (1-based) of the min cost → left size k = pos+1
            return _let_bind(
                F.array_position(costs, F.array_min(costs)).cast(
                    "long"
                ),
                with_best,
            )

        return _let_bind(
            F.transform(args[0], lambda x: x.cast("double")),
            lambda ad: F.when(F.size(ad) >= 4, fit2(ad)),
        )
    if lname == "series_decompose_forecast":
        # Simplified KQL series_decompose_forecast(arr, period, points):
        # train an additive decomposition (same arithmetic as
        # series_decompose) on the first n-points elements, then emit a
        # length-n forecast array — trained part = trend + seasonal
        # baseline, horizon = OLS line fit of the trained trend
        # extrapolated + the centered per-phase seasonal pattern.
        # NULL when the training slice is shorter than max(period, 2).
        # All work is bin-count-sized element lambdas (DF backend only;
        # divergence from KQL: explicit period, no seasonality
        # autodetect).
        _check_argc(name, args, 3, 3, span)
        p = _lit_int(name, ast_args, 1, span)
        if p < 1:
            raise ParseError(f"{name}() period must be >= 1", span)
        points = _lit_int(name, ast_args, 2, span)
        if points < 1:
            raise ParseError(f"{name}() points must be >= 1", span)
        lo, hi = (p - 1) // 2, p // 2
        _bind, _mean = _let_bind, _arr_mean

        def _fc_trend(ad: Column) -> Column:
            n = F.size(ad)

            def trend_at(i: Column) -> Column:
                start = F.greatest(F.lit(1), i - lo)
                window = F.slice(
                    ad, start, F.least(i + hi, n) - start + F.lit(1)
                )
                return _mean(window)

            return F.transform(F.sequence(F.lit(1), n), trend_at)

        def _fc_psums(det: Column) -> Column:
            return F.transform(
                F.sequence(F.lit(0), F.lit(p - 1)),
                lambda q: _mean(
                    F.filter(det, lambda _x, j: (j % p) == q)
                ),
            )

        def _fc(full: Column) -> Column:
            n = F.size(full)
            m = n - F.lit(points)

            def with_train(ad: Column) -> Column:
                msz = F.size(ad)
                md = msz.cast("double")
                xbar = (md + 1.0) / 2.0
                sxx = md * (md * md - 1.0) / 12.0

                def with_parts(tr, ps, raw):
                    return _bind(_mean(raw), lambda rawmean: _bind(
                        _mean(tr), lambda trmean: _bind(
                            F.aggregate(
                                F.zip_with(
                                    F.sequence(F.lit(1), msz),
                                    tr,
                                    lambda i, t: (
                                        i.cast("double") - xbar
                                    ) * t,
                                ),
                                F.lit(0.0),
                                lambda acc, x: acc + x,
                            ) / sxx,
                            lambda slope: _bind(
                                trmean - slope * xbar,
                                lambda inter: F.transform(
                                    F.sequence(F.lit(1), n),
                                    lambda i: F.when(
                                        i <= msz,
                                        F.element_at(tr, i.cast("int"))
                                        + F.element_at(
                                            raw, i.cast("int")
                                        )
                                        - rawmean,
                                    ).otherwise(
                                        inter
                                        + slope * i.cast("double")
                                        + F.element_at(
                                            ps,
                                            ((i - 1) % p + 1).cast(
                                                "int"
                                            ),
                                        )
                                        - rawmean
                                    ),
                                ),
                            ),
                        ),
                    ))

                return _bind(_fc_trend(ad), lambda tr: _bind(
                    _fc_psums(F.zip_with(ad, tr, lambda x, t: x - t)),
                    lambda ps: _bind(
                        F.transform(
                            F.sequence(F.lit(1), msz),
                            lambda i: F.element_at(
                                ps, ((i - 1) % p + 1).cast("int")
                            ),
                        ),
                        lambda raw: with_parts(tr, ps, raw),
                    ),
                ))

            return F.when(
                m >= F.greatest(F.lit(p), F.lit(2)),
                _bind(
                    F.slice(
                        F.transform(full, lambda x: x.cast("double")),
                        1,
                        m,
                    ),
                    with_train,
                ),
            )

        return _bind(args[0], _fc)
    if lname in ("series_decompose", "series_decompose_anomalies"):
        # Simplified KQL series_decompose: classic ADDITIVE decomposition
        # with an explicit integer period (KQL's autodetect/lowess is
        # replaced by deterministic, oracle-checkable arithmetic):
        #   trend    = edge-truncated centered moving average, window p
        #   seasonal = per-phase mean of (series - trend), centered so
        #              mean(seasonal) == 0 over the array
        #   baseline = trend + seasonal;  residual = series - baseline
        # Returns a STRUCT of arrays (use `extend d = …` then
        # `d.baseline` etc. / mv-expand).  All element-lambda work is
        # O(bins·p) per row — bin-count-sized, never row-count-sized.
        # series_decompose_anomalies(arr, p[, threshold]) scores the
        # residual with population z (like series_outliers) and flags
        # ±1 where |z| ≥ threshold (default 1.5): struct(ad_flag,
        # ad_score, baseline).
        anomalies = lname == "series_decompose_anomalies"
        _check_argc(name, args, 2, 3 if anomalies else 2, span)
        p = _lit_int(name, ast_args, 1, span)
        if p < 1:
            raise ParseError(f"{name}() period must be >= 1", span)
        threshold = 1.5
        if anomalies and len(args) == 3:
            from .ast_nodes import NumberLit

            t_ast = ast_args[2] if ast_args is not None else None
            if not isinstance(t_ast, NumberLit):
                raise ParseError(
                    f"{name}() threshold must be a number literal", span
                )
            threshold = float(t_ast.text)
        lo, hi = (p - 1) // 2, p // 2
        _bind, _mean = _let_bind, _arr_mean

        def _trend(ad: Column) -> Column:
            n = F.size(ad)

            def trend_at(i: Column) -> Column:
                start = F.greatest(F.lit(1), i - lo)
                window = F.slice(
                    ad, start, F.least(i + hi, n) - start + F.lit(1)
                )
                return _mean(window)

            return F.transform(F.sequence(F.lit(1), n), trend_at)

        def _psums(det: Column) -> Column:
            # per-phase means of the detrended series (0-based phase)
            return F.transform(
                F.sequence(F.lit(0), F.lit(p - 1)),
                lambda q: _mean(
                    F.filter(det, lambda _x, j: (j % p) == q)
                ),
            )

        def _seasonal(ps: Column, n: Column) -> Column:
            seq = F.sequence(F.lit(1), n)
            raw = F.transform(
                seq,
                lambda i: F.element_at(ps, ((i - 1) % p + 1).cast("int")),
            )
            return _bind(raw, lambda r: _bind(
                _mean(r), lambda sm: F.transform(r, lambda x: x - sm)
            ))

        def decompose(arr: Column, finish) -> Column:
            """finish(arrd, trend, seasonal, baseline, residual)."""
            return _bind(
                F.transform(arr, lambda x: x.cast("double")),
                lambda ad: _bind(_trend(ad), lambda tr: _bind(
                    _psums(F.zip_with(ad, tr, lambda x, t: x - t)),
                    lambda ps: _bind(
                        _seasonal(ps, F.size(ad)),
                        lambda seas: _bind(
                            F.zip_with(tr, seas, lambda t, s: t + s),
                            lambda base: _bind(
                                F.zip_with(ad, base, lambda x, b: x - b),
                                lambda resid: finish(
                                    ad, tr, seas, base, resid
                                ),
                            ),
                        ),
                    ),
                )),
            )

        if not anomalies:
            return decompose(
                args[0],
                lambda ad, tr, seas, base, resid: F.struct(
                    base.alias("baseline"),
                    seas.alias("seasonal"),
                    tr.alias("trend"),
                    resid.alias("residual"),
                ),
            )

        def finish(ad, tr, seas, base, resid):
            def with_stats(rm: Column, rs: Column) -> Column:
                score = F.transform(
                    resid,
                    lambda x: F.when(rs > 0.0, (x - rm) / rs).otherwise(
                        F.lit(0.0)
                    ),
                )
                return _bind(
                    score,
                    lambda sc: F.struct(
                        F.transform(
                            sc,
                            lambda z: F.when(z >= threshold, F.lit(1))
                            .when(z <= -threshold, F.lit(-1))
                            .otherwise(F.lit(0))
                            .cast("long"),
                        ).alias("ad_flag"),
                        sc.alias("ad_score"),
                        base.alias("baseline"),
                    ),
                )

            return _bind(_mean(resid), lambda rm: _bind(
                F.sqrt(
                    F.aggregate(
                        resid,
                        F.lit(0.0),
                        lambda acc, x: acc + (x - rm) * (x - rm),
                    )
                    / F.size(resid)
                ),
                lambda rs: with_stats(rm, rs),
            ))

        return decompose(args[0], finish)
    if lname in ("iff", "iif"):
        _check_argc(name, args, 3, 3, span)
        return iff(args[0], args[1], args[2])
    if lname == "tolower":
        _check_argc(name, args, 1, 1, span)
        return F.lower(args[0])
    if lname == "toupper":
        _check_argc(name, args, 1, 1, span)
        return F.upper(args[0])
    # ---- EXTENSION (KQL scalar/aggregate surface beyond the reference;
    # README:82-85 passes unknowns to the engine — these ARE the engine
    # functions here, all Catalyst-native, no Python UDFs).
    if lname in KQL_RENAMES:
        return F.call_function(KQL_RENAMES[lname], *args)
    if lname == "substring":
        # KQL substring(source, start[, length]) — 0-based start
        _check_argc(name, args, 2, 3, span)
        length = args[2] if len(args) == 3 else F.lit(2147483647)
        return F.substring(args[0], args[1] + F.lit(1), length)
    if lname in ("has_ipv4", "has_any_ipv4", "has_ipv4_prefix"):
        # KQL SIEM text scanners: does the text contain a VALID,
        # properly-delimited IPv4 (matching one of the given ips /
        # starting with the given prefix)?  One regexp_extract_all of
        # delimited dotted-quads + element predicates — narrow, no UDF.
        _check_argc(name, args, 2, 99, span)
        # delimited = not embedded in a word and not part of a LONGER
        # dotted number (a trailing bare '.' is still a delimiter)
        cand = F.filter(
            F.regexp_extract_all(
                args[0],
                F.lit(
                    r"(?<!\w)(?<!\d\.)"
                    r"((?:\d{1,3}\.){3}\d{1,3})(?!\w)(?!\.\d)"
                ),
                1,
            ),
            lambda x: ipv4_long(x).isNotNull(),
        )
        if lname == "has_ipv4_prefix":
            _check_argc(name, args, 2, 2, span)
            pfx = args[1]
            return F.exists(cand, lambda x: x.startswith(pfx))
        wanted = args[1:]
        if lname == "has_ipv4":
            _check_argc(name, args, 2, 2, span)

        def any_eq(x: Column) -> Column:
            cond = x == wanted[0]
            for w in wanted[1:]:
                cond = cond | (x == w)
            return cond

        return F.exists(cand, any_eq)
    if lname == "parse_csv":
        # KQL parse_csv(text) → array<string> of the FIRST record's
        # fields.  Commas inside double-quoted fields are preserved
        # (split on commas with an even number of quotes ahead); quoted
        # fields are unwrapped and "" unescaped.  Embedded newlines in
        # quoted fields are NOT supported (documented divergence —
        # KQL also only parses the first record).
        _check_argc(name, args, 1, 1, span)
        line = F.substring_index(args[0], "\n", 1)
        fields = F.split(
            line, ',(?=(?:[^"]*"[^"]*")*[^"]*$)'
        )
        return F.transform(
            fields,
            lambda f: F.when(
                f.rlike('^".*"$'),
                F.replace(
                    F.substring(f, F.lit(2), F.length(f) - 2),
                    F.lit('""'), F.lit('"'),
                ),
            ).otherwise(f),
        )
    if lname == "split":
        # KQL split(source, delimiter[, index]) — PLAIN-string delimiter
        # (not regex), 0-based index selects one element
        _check_argc(name, args, 2, 3, span)
        delim = _lit_str(name, ast_args, 1, span)
        parts = F.split(args[0], escape_regex(delim))
        if len(args) == 3:
            return F.try_element_at(parts, args[2] + F.lit(1))
        return parts
    if lname == "indexof":
        # 0-based; -1 when absent (instr is 1-based, 0 when absent)
        _check_argc(name, args, 2, 2, span)
        return F.instr(args[0], args[1]) - F.lit(1)
    if lname == "countof":
        # plain-substring occurrence count; countof(s, x, "regex")
        # counts non-overlapping regex matches (KQL kind argument)
        _check_argc(name, args, 2, 3, span)
        s, sub = args[0], args[1]
        if len(args) == 3:
            kind = _lit_str(name, ast_args, 2, span, "kind literal")
            if kind not in ("normal", "regex"):
                raise ParseError(
                    "countof() kind must be 'normal' or 'regex'", span
                )
            if kind == "regex":
                regex = _lit_str(
                    name, ast_args, 1, span, "regex string literal"
                )
                return F.size(
                    F.regexp_extract_all(s, F.lit(regex), F.lit(0))
                ).cast("long")
        return (
            (F.length(s) - F.length(F.replace(s, sub, F.lit(""))))
            / F.length(sub)
        ).cast("long")
    if lname == "indexof_regex":
        # 0-based first regex match position; -1 when absent
        _check_argc(name, args, 2, 2, span)
        return (F.call_function("regexp_instr", args[0], args[1])
                - F.lit(1)).cast("long")
    if lname == "extract":
        # KQL extract(regex, captureGroup, source); no match ⇒ "" like
        # Spark regexp_extract
        _check_argc(name, args, 3, 3, span)
        from .ast_nodes import NumberLit

        regex = _lit_str(name, ast_args, 0, span, "regex string literal")
        if not isinstance(ast_args[1], NumberLit) or ast_args[1].is_float:
            raise ParseError(
                "extract() capture group must be an integer literal", span
            )
        return F.regexp_extract(args[2], regex, int(ast_args[1].text))
    if lname == "extract_all":
        # KQL extract_all(regex, source) — all matches of capture group 1
        # (group 0, the whole match, when the pattern has no groups)
        _check_argc(name, args, 2, 2, span)
        regex = _lit_str(name, ast_args, 0, span, "regex string literal")
        group = 1 if "(" in regex.replace("(?:", "") else 0
        return F.regexp_extract_all(args[1], F.lit(regex), F.lit(group))
    if lname in ("trim", "trim_start", "trim_end") and len(args) == 2:
        # KQL trim(regex, source): strip leading/trailing regex matches.
        # 1-arg trim falls through to Spark's whitespace trim.
        regex = _lit_str(name, ast_args, 0, span, "regex string literal")
        pats = {
            "trim": f"^(?:{regex})+|(?:{regex})+$",
            "trim_start": f"^(?:{regex})+",
            "trim_end": f"(?:{regex})+$",
        }
        return F.regexp_replace(args[1], pats[lname], "")
    if lname == "strcat_array":
        # KQL strcat_array(arr, delim) — join array elements to a string
        _check_argc(name, args, 2, 2, span)
        delim = _lit_str(name, ast_args, 1, span)
        return F.concat_ws(delim, args[0].cast("array<string>"))
    if lname == "strcat_delim":
        # nulls become empty strings but KEEP their delimiter (unlike
        # bare concat_ws, which drops null slots entirely)
        if len(args) < 2:
            raise ParseError(
                "strcat_delim() takes at least 2 arguments", span
            )
        delim = _lit_str(name, ast_args, 0, span)
        return F.concat_ws(
            delim,
            *[F.coalesce(a.cast("string"), F.lit("")) for a in args[1:]],
        )
    if lname == "strcmp":
        _check_argc(name, args, 2, 2, span)
        a, b = args
        return (
            F.when(a < b, F.lit(-1))
            .when(a > b, F.lit(1))
            .when(a == b, F.lit(0))
        )
    if lname == "tohex":
        _check_argc(name, args, 1, 1, span)
        return F.lower(F.hex(args[0]))
    if lname == "hash":
        # deterministic 64-bit xxhash; optional modulus (non-negative)
        _check_argc(name, args, 1, 2, span)
        h = F.xxhash64(args[0])
        return F.pmod(h, args[1]) if len(args) == 2 else h
    if lname == "base64_encode_tostring":
        _check_argc(name, args, 1, 1, span)
        return F.base64(args[0].cast("binary"))
    if lname == "base64_decode_tostring":
        _check_argc(name, args, 1, 1, span)
        return F.unbase64(args[0]).cast("string")
    if lname == "isempty":
        # true for NULL or empty string (KQL)
        _check_argc(name, args, 1, 1, span)
        return F.coalesce(args[0].cast("string") == "", F.lit(True))
    if lname == "isnotempty":
        _check_argc(name, args, 1, 1, span)
        return F.coalesce(args[0].cast("string") != "", F.lit(False))
    if lname == "isfinite":
        _check_argc(name, args, 1, 1, span)
        x = args[0].cast("double")
        return F.coalesce(
            ~F.isnan(x) & (F.abs(x) < F.lit(float("inf"))), F.lit(False)
        )
    if lname == "case":
        # case(pred1, val1, …, predN, valN, else) — conditions
        # null-coalesced to FALSE like iff (pql.go:990-994)
        if len(args) < 3 or len(args) % 2 == 0:
            raise ParseError(
                "case() takes pred1, val1, …, predN, valN, else "
                "(an odd number of arguments, at least 3)",
                span,
            )
        out = F.when(F.coalesce(args[0], F.lit(False)), args[1])
        for i in range(2, len(args) - 1, 2):
            out = out.when(F.coalesce(args[i], F.lit(False)), args[i + 1])
        return out.otherwise(args[-1])
    if lname in ("toint", "tolong", "todouble", "toreal", "tobool",
                 "toboolean", "todatetime"):
        _check_argc(name, args, 1, 1, span)
        target = {
            "toint": "int", "tolong": "long", "todouble": "double",
            "toreal": "double", "tobool": "boolean",
            "toboolean": "boolean", "todatetime": "timestamp",
        }[lname]
        return args[0].try_cast(target)  # unparseable ⇒ NULL (KQL)
    if lname == "tostring":
        # KQL tostring(null) == "" — coalesce after cast
        _check_argc(name, args, 1, 1, span)
        return F.coalesce(args[0].cast("string"), F.lit(""))
    if lname in ("startofday", "startofmonth", "startofyear"):
        _check_argc(name, args, 1, 1, span)
        unit = lname.removeprefix("startof")
        return F.date_trunc(unit, args[0])
    if lname == "startofweek":
        # KQL weeks start Sunday (Spark date_trunc weeks start Monday)
        _check_argc(name, args, 1, 1, span)
        z = F.lit(0)
        return F.date_trunc("day", args[0]) - F.make_interval(
            z, z, z, F.dayofweek(args[0]) - F.lit(1)
        )
    if lname in ("endofday", "endofmonth", "endofyear"):
        # last representable microsecond of the period
        _check_argc(name, args, 1, 1, span)
        unit = lname.removeprefix("endof")
        start = F.date_trunc(unit, args[0])
        z = F.lit(0)
        nxt = {
            "day": F.make_interval(z, z, z, F.lit(1)),
            "month": F.make_interval(z, F.lit(1)),
            "year": F.make_interval(F.lit(1)),
        }[unit]
        return start + nxt - F.expr("INTERVAL 1 MICROSECOND")
    if lname == "datetime_add":
        _check_argc(name, args, 3, 3, span)
        part = _lit_str(name, ast_args, 0, span, "datetime-part literal")
        if part.lower() not in _DT_PARTS:
            raise ParseError(f"bad datetime part {part!r}", span)
        return F.timestamp_add(part.upper(), args[1], args[2])
    if lname == "datetime_diff":
        # KQL: datetime_diff(part, later, earlier) == later - earlier
        _check_argc(name, args, 3, 3, span)
        part = _lit_str(name, ast_args, 0, span, "datetime-part literal")
        if part.lower() not in _DT_PARTS:
            raise ParseError(f"bad datetime part {part!r}", span)
        return F.timestamp_diff(part.upper(), args[2], args[1])
    if lname == "dayofweek":
        # KQL: integer days since Sunday (0-6); Spark dayofweek is 1-7
        _check_argc(name, args, 1, 1, span)
        return F.dayofweek(args[0]) - F.lit(1)
    if lname == "array_index_of":
        # 0-based; -1 when absent (array_position is 1-based, 0 absent)
        _check_argc(name, args, 2, 2, span)
        return F.array_position(args[0], args[1]) - F.lit(1)
    if lname == "array_slice":
        # KQL: 0-based, both ends inclusive
        _check_argc(name, args, 3, 3, span)
        return F.slice(
            args[0], args[1] + F.lit(1), args[2] - args[1] + F.lit(1)
        )
    if lname == "jaccard_index":
        # KQL jaccard_index(set1, set2) = |∩| / |∪| over DISTINCT
        # elements; empty-∪ → NULL (0/0)
        _check_argc(name, args, 2, 2, span)
        inter = F.size(F.array_intersect(args[0], args[1]))
        union = F.size(F.array_union(args[0], args[1]))
        return F.when(
            union > 0, inter.cast("double") / union
        )
    if lname in ("array_sort_asc", "array_sort_desc"):
        # single array: plain sort.  EXTENSION of the KQL multi-array
        # form: subsequent arrays are reordered by the FIRST array's
        # sort order (stable; nulls last, like KQL's default) — returns
        # a STRUCT of arrays (a0, a1, …) rather than KQL's dynamic
        # array-of-arrays, since Spark arrays are homogeneous.
        asc = lname == "array_sort_asc"
        _check_argc(name, args, 1, 99, span)
        if len(args) == 1:
            return F.sort_array(args[0], asc=asc)
        flip = 1 if asc else -1

        def cmp(left: Column, right: Column) -> Column:
            lv, rv = left["v"], right["v"]
            stable = F.signum((left["i"] - right["i"]).cast("double"))
            return (
                F.when(lv.isNull() & rv.isNull(), stable)
                .when(lv.isNull(), F.lit(1.0))   # nulls LAST either way
                .when(rv.isNull(), F.lit(-1.0))
                .when(lv < rv, F.lit(-1.0 * flip))
                .when(lv > rv, F.lit(1.0 * flip))
                .otherwise(stable)
                .cast("int")
            )

        def multi(s: Column) -> Column:
            first = s["a0"]
            n = F.size(first)
            keyed = F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.struct(
                    F.element_at(first, i).alias("v"), i.alias("i")
                ),
            )
            order = F.transform(
                F.array_sort(keyed, cmp), lambda st: st["i"]
            )
            fields = [
                F.when(
                    n > 0,
                    F.transform(
                        order, lambda i: F.try_element_at(s[f"a{j}"], i)
                    ),
                )
                .otherwise(s[f"a{j}"])
                .alias(f"a{j}")
                for j in range(len(args))
            ]
            return F.struct(*fields)

        return _let_bind(
            F.struct(*[a.alias(f"a{j}") for j, a in enumerate(args)]),
            multi,
        )
    if lname in ("arg_max", "arg_min"):
        # arg_max(maximized_expr, returned_expr) — Spark max_by has the
        # argument order reversed
        _check_argc(name, args, 2, 2, span)
        fn = F.max_by if lname == "arg_max" else F.min_by
        return fn(args[1], args[0])
    if lname in ("make_list", "make_set", "make_list_if", "make_set_if"):
        # deterministic refinement of KQL's unspecified order: results
        # are sorted (and deduplicated for make_set) so they are
        # oracle-verifiable and stable across shuffles/retries
        base = 2 if lname.endswith("_if") else 1
        _check_argc(name, args, base, base, span)
        x = F.when(args[1], args[0]) if lname.endswith("_if") else args[0]
        collected = F.collect_list(x)
        if lname.startswith("make_set"):
            collected = F.array_distinct(collected)
        return F.sort_array(collected)
    if lname == "percentiles":
        # percentiles(col, p1, …, pN) on the KQL 0-100 scale; EXACT
        # interpolated (KQL's is approximate) ⇒ array<double>
        if len(args) < 2:
            raise ParseError(
                "percentiles() takes a column and at least one "
                "percentile", span
            )
        from .ast_nodes import NumberLit

        for a in (ast_args or [])[1:]:
            if not isinstance(a, NumberLit):
                raise ParseError(
                    "percentiles() percentile args must be numeric "
                    "literals", span
                )
        ps = F.array(*[(a / F.lit(100.0)) for a in args[1:]])
        return F.percentile(args[0], ps)
    if lname == "percentile":
        # KQL percentile(col, p) — p on the 0-100 scale like the rest
        # of the percentiles family; EXACT interpolated
        _check_argc(name, args, 2, 2, span)
        return F.percentile(args[0], args[1] / F.lit(100.0))
    if lname in ("percentilew", "percentilesw"):
        # weighted percentiles: percentilew(col, weight, p),
        # percentilesw(col, weight, p1, …) — weight is an integer
        # frequency (Spark percentile's frequency argument)
        if len(args) < 3:
            raise ParseError(
                f"{name}() takes a column, a weight, and at least one"
                " percentile", span
            )
        freq = args[1].cast("long")
        if lname == "percentilew":
            _check_argc(name, args, 3, 3, span)
            return F.percentile(args[0], args[2] / F.lit(100.0), freq)
        ps = F.array(*[(a / F.lit(100.0)) for a in args[2:]])
        return F.percentile(args[0], ps, freq)
    if lname in ("binary_all_and", "binary_all_or", "binary_all_xor"):
        # KQL bitwise aggregates → Spark bit_and/bit_or/bit_xor
        _check_argc(name, args, 1, 1, span)
        target = {
            "binary_all_and": "bit_and",
            "binary_all_or": "bit_or",
            "binary_all_xor": "bit_xor",
        }[lname]
        return F.call_function(target, args[0].cast("long"))
    # passthrough: resolve against Spark's builtin/UDF registry at analysis
    # time (JVM-side expression — no Python round trip)
    return F.call_function(name, *args)
