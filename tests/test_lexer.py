"""Lexer unit tests (token semantics per /root/reference/parser/lex.go)."""

import pytest

from pql_spark.lexer import LexError, TokenKind, scan, split_statements


def kinds(src):
    return [t.kind for t in scan(src)]


def values(src):
    return [t.value for t in scan(src)]


def test_idents_and_keywords():
    toks = scan("foo and bar or baz in by _x $left")
    assert [t.kind for t in toks] == [
        TokenKind.IDENT,
        TokenKind.AND,
        TokenKind.IDENT,
        TokenKind.OR,
        TokenKind.IDENT,
        TokenKind.IN,
        TokenKind.BY,
        TokenKind.IDENT,
        TokenKind.IDENT,
    ]
    assert toks[-1].value == "$left"


def test_contextual_keywords_are_idents():
    # only and/or/in/by are reserved (lex.go:353-358)
    assert kinds("where sort take project summarize join") == [
        TokenKind.IDENT
    ] * 6


def test_numbers_decimal_float_exponent():
    assert values("42 3.14 1e-9 007") == ["42", "3.14", "1e-9", "7"]


def test_hex_normalized_to_decimal():
    # hex normalized at lex time (lex.go:448-480)
    assert values("0xdeadbeef") == ["3735928559"]
    assert values("0x10") == ["16"]


def test_strings_and_escapes():
    assert values("'a' \"b\"") == ["a", "b"]
    assert values(r'"a\nb\tc\"d"') == ["a\nb\tc\"d"]
    assert values(r"'it\'s'") == ["it's"]


def test_unterminated_string():
    with pytest.raises(LexError):
        scan('"abc')


def test_quoted_identifier():
    toks = scan("`Storm Events`")
    assert toks[0].kind == TokenKind.QIDENT
    assert toks[0].value == "Storm Events"


def test_operators():
    assert kinds("== != <= >= =~ !~ = < > + - * / % | . , ; ( ) [ ]") == [
        TokenKind.EQ,
        TokenKind.NE,
        TokenKind.LE,
        TokenKind.GE,
        TokenKind.CI_EQ,
        TokenKind.CI_NE,
        TokenKind.ASSIGN,
        TokenKind.LT,
        TokenKind.GT,
        TokenKind.PLUS,
        TokenKind.MINUS,
        TokenKind.STAR,
        TokenKind.SLASH,
        TokenKind.MOD,
        TokenKind.PIPE,
        TokenKind.DOT,
        TokenKind.COMMA,
        TokenKind.SEMI,
        TokenKind.LPAREN,
        TokenKind.RPAREN,
        TokenKind.LBRACKET,
        TokenKind.RBRACKET,
    ]


def test_comments():
    assert values("foo // comment | junk\nbar") == ["foo", "bar"]


def test_spans_cover_source():
    src = 'T | where X == "hi"'
    for tok in scan(src):
        assert 0 <= tok.span.start < tok.span.end <= len(src)


def test_split_statements():
    assert split_statements("let n = 3; T | take n") == [
        "let n = 3",
        " T | take n",
    ]
    # semicolons inside strings don't split
    assert len(split_statements("T | where X == 'a;b'")) == 1
