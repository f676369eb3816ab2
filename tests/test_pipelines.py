"""End-to-end corpus-curation pipeline test with a hand-built corpus
where every stage's effect is individually checkable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pql_spark.pipelines import curate_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and it runs for the "
    "hills in a way that is entirely typical of foxes in stories"
)


@pytest.fixture(scope="module")
def raw_docs(spark):
    rows = [
        (1, GOOD),                        # keeper
        (2, GOOD),                        # exact dup of 1 → dropped
        (3, GOOD + " basically"),         # near dup of 1 → dropped
        (4, "word " * 40 + "the of is a that it in for and to"),  # keeper
        (5, "short"),                     # fails length/quality
        (6, "der hund und die katze ist ein tier mit im haus nicht "
            "und der mann ist auch da mit dem hund und der katze im"),
        (7, "!!! ??? *** ### " * 20),     # punctuation soup → low quality
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_corpus_stages(raw_docs):
    out = curate_corpus(
        raw_docs,
        min_quality=0.75,
        langs=("en",),
        near_dup_threshold=0.5,
        test_rate=0.3,
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 4}
    # doc 6 is german, 5/7 low quality, 2 exact dup, 3 near dup
    assert all(r.lang_pred == "en" for r in rows.values())
    assert all(r.quality >= 0.75 for r in rows.values())
    assert all(r.split in ("train", "test") for r in rows.values())
    # original columns survive
    assert rows[1].text == GOOD


def test_curate_corpus_split_is_content_keyed(spark, raw_docs):
    out1 = curate_corpus(raw_docs, near_dup_threshold=0.5)
    # same text under a different id gets the same split
    reid = raw_docs.withColumn("doc_id", F.col("doc_id") + 1000)
    out2 = curate_corpus(reid, near_dup_threshold=0.5)
    s1 = {r.text: r.split for r in out1.collect()}
    s2 = {r.text: r.split for r in out2.collect()}
    assert s1 == s2


def test_curate_corpus_new_stages(spark, raw_docs):
    # repetition filter: doc 4 is 'word' x40 — dup 3-gram frac ~1
    out = curate_corpus(
        raw_docs,
        near_dup_threshold=0.5,
        max_dup_ngram_frac=0.5,
    )
    assert {r.doc_id for r in out.collect()} == {1}
    # decontamination: a benchmark sharing doc 1's opening 13-gram
    bench = spark.createDataFrame(
        [(900, GOOD)], "doc_id long, text string"
    )
    out = curate_corpus(
        raw_docs, near_dup_threshold=0.5, benchmark=bench
    )
    assert {r.doc_id for r in out.collect()} == {4}
    # redaction rewrites the surviving text in place
    pii = spark.createDataFrame(
        [(10, GOOD + " reach me at a.b@x.org please thanks")],
        "doc_id long, text string",
    )
    out = curate_corpus(pii, near_dup_threshold=0.5, redact=True)
    assert "<EMAIL>" in out.head().text


def test_curate_corpus_no_lang_filter(raw_docs):
    out = curate_corpus(
        raw_docs, langs=None, near_dup_threshold=0.5, min_quality=0.5
    )
    ids = {r.doc_id for r in out.collect()}
    assert 6 in ids  # german doc kept when lang filter is off
