"""CLI smoke test (subprocess — the CLI owns its SparkSession)."""

from __future__ import annotations

import subprocess
import sys

import pytest

from tests.conftest import SF_SMOKE


@pytest.mark.skipif(not SF_SMOKE.is_dir(), reason="no testdata")
def test_cli_executes_with_let_prelude():
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pql_spark.cli",
            "--tables",
            str(SF_SMOKE),
            "-c",
            "let big = 40; lineitem | where l_quantity > big"
            " | summarize n=count() by l_returnflag | sort by n",
        ],
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "l_returnflag" in proc.stdout
    assert "433" in proc.stdout  # top row count at sf0.001


@pytest.mark.skipif(not SF_SMOKE.is_dir(), reason="no testdata")
def test_cli_sql_mode_prints_compiled_sql():
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pql_spark.cli",
            "--tables",
            str(SF_SMOKE),
            "--sql",
            "-c",
            "lineitem | where l_quantity > 40 | count",
        ],
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SELECT count(1) AS `count()`" in proc.stdout
    assert "`l_quantity` > 40" in proc.stdout


@pytest.mark.skipif(not SF_SMOKE.is_dir(), reason="no testdata")
def test_cli_reports_parse_errors():
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pql_spark.cli",
            "--tables",
            str(SF_SMOKE),
            "-c",
            "lineitem | where >",
        ],
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert proc.returncode == 1
    assert "error:" in proc.stderr
