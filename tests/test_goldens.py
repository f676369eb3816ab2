"""Execute the reference's golden corpus against the Spark engine.

Each case under ``/root/reference/testdata/Goldens/<Name>/`` has an
``input.pql`` and (usually) an ``output.csv`` with expected *results*
(ClickHouse CSVWithNames rendering).  We run the PQL through our engine
on the fixture tables and compare rows — sorted first when the case has
an ``unordered`` marker (clickhouse_test.go:102-109).  Cases without an
``output.csv`` (e.g. ProjectNow) are execution-smoke only.

Output normalization (harness-side, not engine semantics — FIXTURES.md):
booleans render 0/1, NULL and empty string both render empty.
"""

from __future__ import annotations

import csv
import datetime as dt
import json
import re
from pathlib import Path

import pytest

from pql_spark import PqlEngine

from .conftest import REFERENCE_TESTDATA

GOLDENS_DIR = REFERENCE_TESTDATA / "Goldens"


def _golden_cases() -> list[str]:
    if not GOLDENS_DIR.is_dir():
        return []
    return sorted(
        p.name for p in GOLDENS_DIR.iterdir() if (p / "input.pql").is_file()
    )


def _parse_jwcc(text: str) -> dict:
    """Parse JSON-with-commas-and-comments (the reference's options.jwcc)."""
    text = re.sub(r"//[^\n]*", "", text)
    text = re.sub(r",(\s*[}\]])", r"\1", text)
    return json.loads(text)


def _load_params(case_dir: Path) -> dict[str, object]:
    options = case_dir / "options.jwcc"
    if not options.is_file():
        return {}
    payload = _parse_jwcc(options.read_text())
    params: dict[str, object] = {}
    for name, spec in payload.get("parameters", {}).items():
        value = spec.get("value")
        ch_type = spec.get("clickhouse", "")
        if "Int" in ch_type:
            params[name] = int(value)
        elif "Float" in ch_type:
            params[name] = float(value)
        else:
            params[name] = value
    return params


def _render_cell(value: object) -> str:
    """Normalize a Spark value to the ClickHouse CSV conventions."""
    if value is None:
        return ""
    if isinstance(value, bool):
        return "1" if value else "0"
    if isinstance(value, float):
        if value == int(value):
            return str(int(value))
        return repr(value)
    if isinstance(value, dt.datetime):
        return value.strftime("%Y-%m-%d %H:%M:%S")
    return str(value)


@pytest.mark.parametrize("case", _golden_cases())
def test_golden(case: str, spark, fixture_tables):
    case_dir = GOLDENS_DIR / case
    if (case_dir / "skip").exists():
        pytest.skip("marked skip in reference corpus")
    query = (case_dir / "input.pql").read_text()
    params = _load_params(case_dir)
    engine = PqlEngine(spark, resolver=fixture_tables, params=params)
    df = engine.query(query)
    rows = df.collect()

    expected_csv = case_dir / "output.csv"
    if not expected_csv.is_file():
        return  # execution-smoke only (e.g. ProjectNow: now() is volatile)

    with open(expected_csv, newline="", encoding="utf-8") as f:
        reader = csv.reader(f)
        expected_header = next(reader)
        expected_rows = [tuple(r) for r in reader]

    assert df.columns == expected_header, (
        f"{case}: column mismatch: {df.columns} != {expected_header}"
    )
    actual_rows = [tuple(_render_cell(v) for v in row) for row in rows]
    if (case_dir / "unordered").exists():
        actual_rows = sorted(actual_rows)
        expected_rows = sorted(expected_rows)
    assert actual_rows == expected_rows, f"{case}: row mismatch"
