"""Within-document and corpus-level (C4-style) line deduplication."""

from __future__ import annotations

import pytest

from pql_spark.operators import dedup_lines, dedup_lines_corpus


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "nav menu\nreal content one\n\nnav menu\nmore text"),
            (2, "nav menu\nreal content two\n\n\nreal content two"),
            (3, "unique only"),
            (4, "nav menu"),  # fully boilerplate after corpus dedup
        ],
        "doc_id long, text string",
    )


def test_dedup_lines_within_doc(spark, docs):
    out = {r.doc_id: r for r in dedup_lines(docs).collect()}
    # doc 1: second 'nav menu' removed, blank kept
    assert out[1].text == "nav menu\nreal content one\n\nmore text"
    assert out[1].n_lines_removed == 1
    # doc 2: repeated content line removed; BOTH blanks kept
    assert out[2].text == "nav menu\nreal content two\n\n"
    assert out[2].n_lines_removed == 1
    assert out[3].text == "unique only"
    assert out[3].n_lines_removed == 0
    # other columns preserved
    assert set(dedup_lines(docs).columns) == {
        "doc_id", "text", "n_lines_removed"
    }


def test_dedup_lines_corpus_keeps_first_occurrence(spark, docs):
    out = {r.doc_id: r for r in dedup_lines_corpus(docs).collect()}
    # 'nav menu' first occurs at (doc 1, idx 0): doc 1 keeps it once
    # (its OWN second copy at idx 3 is also a later occurrence)
    assert out[1].text == "nav menu\nreal content one\n\nmore text"
    assert out[1].n_lines_removed == 1
    # doc 2 loses 'nav menu' and its own repeated line, keeps blanks
    assert out[2].text == "real content two\n\n"
    assert out[2].n_lines_removed == 2
    assert out[3].text == "unique only"
    # doc 4 loses its only line -> dropped entirely
    assert 4 not in out
    assert out[1].n_lines_kept == 4


def test_dedup_lines_corpus_deterministic(spark, docs):
    a = sorted(map(tuple, dedup_lines_corpus(docs).collect()))
    b = sorted(
        map(
            tuple,
            dedup_lines_corpus(docs.repartition(7)).collect(),
        )
    )
    assert a == b
