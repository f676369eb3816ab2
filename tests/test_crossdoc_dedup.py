"""Cross-document exact substring duplication stats (Lee et al. 2021
arXiv:2107.06499 style): a token position is duplicated iff its
k-token gram occurs in another document; overlapping grams merge into
spans.  Reference: a brute-force python implementation."""

from __future__ import annotations

import pytest

from pql_spark.operators import cross_doc_dup_spans

SHARED = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
DOCS = [
    # docs 1 and 2 share the 10-token SHARED run (k=5 -> 6 dup grams
    # each, merging into ONE 10-token span)
    (1, SHARED + " kilo lima mike november oscar papa"),
    (2, "quebec romeo sierra tango " + SHARED),
    # doc 3: unique content, no cross-doc grams
    (3, "uniform victor whiskey xray yankee zulu one two three four"),
    # doc 4: repeats ITSELF but shares nothing across docs ->
    # cross-doc stats must stay zero (within-doc repetition is
    # repetition_stats' job)
    (4, "solo solo solo solo solo solo solo solo solo solo"),
    # doc 5: two separate shared runs with doc 6 -> two spans
    (5, "p1 p2 p3 p4 p5 gap1 gap2 gap3 gap4 gap5 gap6 q1 q2 q3 q4 q5"),
    (6, "p1 p2 p3 p4 p5 zzz1 zzz2 zzz3 zzz4 zzz5 zzz6 q1 q2 q3 q4 q5"),
]
K = 5


def _py_reference():
    toks = {i: t.split() for i, t in DOCS}
    gram_docs: dict[tuple, set] = {}
    for i, tk in toks.items():
        for p in range(len(tk) - K + 1):
            gram_docs.setdefault(tuple(tk[p:p + K]), set()).add(i)
    out = {}
    for i, tk in toks.items():
        dup_pos = sorted(
            p
            for p in range(len(tk) - K + 1)
            if len(gram_docs[tuple(tk[p:p + K])]) >= 2
        )
        covered: set[int] = set()
        spans = 0
        prev_end = None
        for p in dup_pos:
            if prev_end is None or p > prev_end:
                spans += 1
            covered.update(range(p, p + K))
            prev_end = p + K - 1
        out[i] = (len(tk), len(covered), spans)
    return out


def test_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans)
        for r in cross_doc_dup_spans(df, gram_k=K).collect()
    }
    assert got == _py_reference()
    # hand-checked structure
    assert got[1] == (16, 10, 1)   # one 10-token shared span
    assert got[3][1:] == (0, 0)    # clean doc
    assert got[4][1:] == (0, 0)    # self-repeats are NOT cross-doc
    assert got[5] == (16, 10, 2)   # two separate 5-token spans


def test_frac_and_all_docs_present(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = cross_doc_dup_spans(df, gram_k=K).collect()
    assert {r.doc_id for r in rows} == {i for i, _ in DOCS}
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1].dup_token_frac == pytest.approx(10 / 16)
    assert by_id[3].dup_token_frac == 0.0


def test_no_python_in_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        cross_doc_dup_spans(df, gram_k=K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan  # pure Catalyst: no UDF/Arrow stages


def test_decompress_text_mixed_codecs(spark):
    import bz2
    import gzip
    import lzma
    import zlib

    import pytest

    from pql_spark.operators.text import decompress_text

    docs = {
        1: ("gzip", gzip.compress("hello gzip é".encode())),
        2: ("bz2", bz2.compress(b"hello bz2")),
        3: ("xz", lzma.compress(b"hello xz")),
        4: ("zlib", zlib.compress(b"hello zlib")),
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, (_, v) in docs.items()],
        "doc_id long, payload binary",
    )
    got = {
        r.doc_id: (r.codec, r.text)
        for r in decompress_text(df).collect()
    }
    assert got[1] == ("gzip", "hello gzip é")
    assert got[2] == ("bz2", "hello bz2")
    assert got[3] == ("xz", "hello xz")
    assert got[4] == ("zlib", "hello zlib")

    # explicit codec skips the sniff
    one = spark.createDataFrame(
        [(9, bytearray(gzip.compress(b"x")))], "doc_id long, payload binary"
    )
    assert decompress_text(one, codec="gzip").collect()[0].text == "x"

    # zstd magic → honest boundary; garbage → row-named ValueError
    bad = spark.createDataFrame(
        [(7, bytearray(b"\x28\xb5\x2f\xfdxxxx"))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception, match="zstd"):
        decompress_text(bad).collect()
    junk = spark.createDataFrame(
        [(8, bytearray(b"\x00\x01\x02\x03"))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception, match="doc_id=8"):
        decompress_text(junk).collect()
