"""scrub_cross_doc_dups: remove cross-document duplicated substrings
keeping the lowest-id owner copy (Lee et al. 2021 treatment with a
deterministic owner rule).  Reference: brute-force python."""

from __future__ import annotations

from pql_spark.operators import scrub_cross_doc_dups

SHARED = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
DOCS = [
    (1, SHARED + " kilo lima mike november oscar papa"),
    (2, "quebec romeo sierra tango " + SHARED),
    (3, "uniform victor whiskey xray yankee zulu one two three four"),
]
K = 5


def _py_reference():
    toks = {i: t.split() for i, t in DOCS}
    gram_info: dict[tuple, list] = {}
    for i, tk in toks.items():
        for p in range(len(tk) - K + 1):
            gram_info.setdefault(tuple(tk[p:p + K]), []).append(i)
    out = {}
    for i, tk in toks.items():
        scrub: set[int] = set()
        for p in range(len(tk) - K + 1):
            docs = gram_info[tuple(tk[p:p + K])]
            if len(set(docs)) >= 2 and min(docs) != i:
                scrub.update(range(p, p + K))
        kept = [t for j, t in enumerate(tk) if j not in scrub]
        if kept:
            out[i] = (" ".join(kept), len(kept), len(scrub))
    return out


def test_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_tokens_kept, r.n_tokens_removed)
        for r in scrub_cross_doc_dups(df, gram_k=K).collect()
    }
    want = _py_reference()
    assert got == want
    # owner (doc 1, lowest id) keeps the shared run; doc 2 loses it
    assert SHARED in got[1][0]
    assert SHARED not in got[2][0]
    assert got[2][2] == 10  # the 10 shared tokens scrubbed
    # clean doc untouched
    assert got[3] == (DOCS[2][1], 10, 0)


def test_no_python_in_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        scrub_cross_doc_dups(df, gram_k=K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan
