"""Interactive / batch CLI — the Spark analog of the reference CLI
(``cmd/pql/main.go``): reads PQL statements (stdin or -c), accumulates a
``let`` prelude across statements exactly like the reference
(main.go:73-95), and for each tabular query either executes it and
prints rows, or prints the compiled plan with --plan (our analog of the
reference printing generated SQL).

Usage:
    python -m pql_spark.cli --tables /root/testdata/sf0.001 \
        -c 'lineitem | summarize n=count() by l_returnflag | sort by n'
    echo 'events | take 5' | python -m pql_spark.cli --tables DIR --plan
"""

from __future__ import annotations

import argparse
import sys

from pql_spark.engine import PqlEngine
from pql_spark.lexer import split_statements
from pql_spark.parser import QueryError, parse


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pql-spark", description=__doc__)
    ap.add_argument("-c", "--command", help="PQL text (default: stdin)")
    ap.add_argument(
        "--tables", help="directory of <name>.parquet tables", default=None
    )
    ap.add_argument(
        "--plan",
        action="store_true",
        help="print the optimized plan instead of executing",
    )
    ap.add_argument(
        "--sql",
        action="store_true",
        help="print compiled Spark SQL instead of executing (the "
        "reference CLI's output mode)",
    )
    ap.add_argument(
        "--limit", type=int, default=20, help="max rows to print (default 20)"
    )
    args = ap.parse_args(argv)

    from pql_spark.sources import build_session, parquet_catalog

    spark = build_session("pql-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    resolver = (
        parquet_catalog(spark, args.tables) if args.tables else None
    )
    engine = PqlEngine(spark, resolver=resolver)

    text = args.command if args.command else sys.stdin.read()
    prelude: list[str] = []
    status = 0
    for stmt in split_statements(text):
        if not stmt.strip():
            continue
        full = ";".join([*prelude, stmt]) if prelude else stmt
        try:
            if stmt.lstrip().startswith("let"):
                # parse-validate, then accumulate into the prelude — the
                # reference CLI's behavior (main.go:84-95)
                parse(";".join([*prelude, stmt]) + ";")
                prelude.append(stmt)
                continue
            if args.sql:
                print(engine.to_sql(full))
                continue
            df = engine.query(full)
        except QueryError as err:
            print(f"error: {err}", file=sys.stderr)
            status = 1
            continue
        except Exception as err:  # noqa: BLE001 — resolver/analysis errors
            print(f"error: {err}", file=sys.stderr)
            status = 1
            continue
        if args.plan:
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
    spark.stop()
    return status


if __name__ == "__main__":
    sys.exit(main())
