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


def test_nanos_cache_invalidates_on_replace(tmp_path):
    """ADVICE r8: the footer cache was keyed by path string alone, so a
    file REPLACED at the same path kept serving the stale column list.
    The (path, size, mtime_ns) key must re-read the new footer."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pql_spark.sources.catalog import _nanos_ts_columns

    p = tmp_path / "t.parquet"
    pq.write_table(pa.table({"x": pa.array([1, 2], pa.int64())}), p)
    assert _nanos_ts_columns(p) == []
    time.sleep(0.01)  # ensure mtime_ns moves even on coarse clocks
    pq.write_table(
        pa.table(
            {"ts": pa.array([1, 2], pa.timestamp("ns")), "x": [1, 2]}
        ),
        p,
        coerce_timestamps=None,
    )
    assert _nanos_ts_columns(p) == ["ts"]


def test_clear_source_caches_hook(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pql_spark.sources.catalog import (
        _NANOS_TS_CACHE,
        _nanos_ts_columns,
        clear_source_caches,
    )

    p = tmp_path / "u.parquet"
    pq.write_table(pa.table({"x": pa.array([1], pa.int64())}), p)
    _nanos_ts_columns(p)
    assert _NANOS_TS_CACHE
    clear_source_caches()
    assert not _NANOS_TS_CACHE
