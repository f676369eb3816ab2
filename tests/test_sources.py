"""Source catalog tests: CSV/JSON file catalogs feeding PQL queries."""

from __future__ import annotations

import json

import pytest

from pql_spark import PqlEngine
from pql_spark.sources import file_catalog


@pytest.fixture()
def data_dir(tmp_path):
    (tmp_path / "people.csv").write_text(
        "name,age,city\nana,34,lisbon\nbob,28,porto\ncid,41,lisbon\n"
    )
    rows = [
        {"k": "a", "v": 1},
        {"k": "b", "v": 2},
        {"k": "a", "v": 3},
    ]
    (tmp_path / "kv.json").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )
    return tmp_path


def test_csv_catalog_pql(spark, data_dir):
    engine = PqlEngine(
        spark, resolver=file_catalog(spark, data_dir, fmt="csv")
    )
    rows = engine.query(
        'people | where city == "lisbon" | summarize n = count(),'
        " top_age = max(age) | project n, top_age"
    ).collect()
    assert [tuple(r) for r in rows] == [(2, 41)]


def test_json_catalog_pql(spark, data_dir):
    engine = PqlEngine(
        spark, resolver=file_catalog(spark, data_dir, fmt="json")
    )
    rows = engine.query(
        "kv | summarize total = sum(v) by k | sort by k asc"
    ).collect()
    assert [tuple(r) for r in rows] == [("a", 4), ("b", 2)]


def test_unknown_table_errors(spark, data_dir):
    resolver = file_catalog(spark, data_dir, fmt="csv")
    with pytest.raises(KeyError):
        resolver("missing")
