"""Property-based fuzzing of the lexer and parser — the Python mirror
of the reference's FuzzScan (span-validity invariants,
parser/lex_test.go:518-535) and FuzzParse (no-crash,
parser/parser_test.go:1962-1971)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pql_spark.lexer import LexError, scan
from pql_spark.parser import QueryError, parse

# text biased toward PQL-ish shapes plus raw unicode noise
_pql_alphabet = st.sampled_from(
    list("abcXY_01 \t\n|,;()[]+-*/%<>=!~\"'`.$\\")
)
_pql_like = st.text(alphabet=_pql_alphabet, max_size=80)
_any_text = st.text(max_size=80)

_SEED_QUERIES = [
    "T | where a == 1",
    'T | summarize c = count() by k | sort by c desc',
    "let x = 1; T | where y > x | take 3",
    "T | join kind=inner (U) on k | project a, b = c * 2",
    'T | extend 42 | render barchart with (title = "t")',
    "T | top 5 by x asc | count",
]


@settings(max_examples=300, deadline=None)
@given(st.one_of(_pql_like, _any_text, st.sampled_from(_SEED_QUERIES)))
def test_scan_never_crashes_and_spans_are_valid(source):
    try:
        tokens = scan(source)
    except LexError as err:
        # errors must carry an in-bounds span
        assert 0 <= err.span.start <= err.span.end <= len(source)
        return
    for tok in tokens:
        s = tok.span
        assert 0 <= s.start <= s.end <= len(source)
        # a token's span must slice real source text
        assert s.text(source) == source[s.start : s.end]


@settings(max_examples=300, deadline=None)
@given(st.one_of(_pql_like, _any_text, st.sampled_from(_SEED_QUERIES)))
def test_parse_never_crashes(source):
    try:
        parse(source)
    except (QueryError, LexError):
        pass  # structured errors are the only acceptable failure mode


@settings(max_examples=100, deadline=None)
@given(st.sampled_from(_SEED_QUERIES), st.integers(0, 79), _pql_alphabet)
def test_parse_survives_single_char_corruption(query, pos, ch):
    """Mutating one char of a valid query never escapes the error
    contract (multi-error accumulation, parser/parser.go:1401-1418)."""
    pos = min(pos, len(query) - 1)
    corrupted = query[:pos] + ch + query[pos + 1 :]
    try:
        parse(corrupted)
    except (QueryError, LexError):
        pass
