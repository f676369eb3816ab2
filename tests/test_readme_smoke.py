"""The README quickstart must run verbatim (VERDICT r12 item 9): the
usage snippet is extracted from README.md and executed against the
test parquet tables — if the public API it shows drifts (imports,
PqlEngine signature, resolver contract), this fails before a user
does."""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF_DIR = "/root/testdata/sf0.001"


def _snippet() -> str:
    text = (REPO / "README.md").read_text()
    blocks = re.findall(r"```python\n(.*?)```", text, re.DOTALL)
    assert blocks, "README has no python code block"
    usage = [b for b in blocks if "PqlEngine" in b and "engine.query" in b]
    assert usage, "README quickstart block not found"
    return usage[0]


def test_readme_quickstart_runs(spark):
    code = _snippet().replace("/data/tables", SF_DIR)
    # df.show() prints — keep it (it executes the plan), capture nothing
    ns: dict = {}
    exec(compile(code, "README.md", "exec"), ns)  # noqa: S102
    df = ns["df"]
    rows = df.collect()
    assert 0 < len(rows) <= 10
    assert {"user_id", "n", "avg_v"} <= set(df.columns)


def test_pyproject_is_consistent():
    import tomllib

    meta = tomllib.loads((REPO / "pyproject.toml").read_text())
    proj = meta["project"]
    assert proj["name"] == "pql-spark"
    # the declared entry point must import and expose main()
    target = proj["scripts"]["pql-spark"]
    mod, fn = target.split(":")
    import importlib

    assert callable(getattr(importlib.import_module(mod), fn))
    # every runtime dependency is importable in this environment
    for dep in proj["dependencies"]:
        name = re.split(r"[<>=\[]", dep)[0].strip()
        importlib.import_module(
            {"pyspark": "pyspark", "pyarrow": "pyarrow"}.get(name, name)
        )
