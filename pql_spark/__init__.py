"""pql_spark — a PySpark-native engine for the Pipeline Query Language.

A from-scratch implementation of the query surface of runreveal/pql
(reference at /root/reference, Apache-2.0) that compiles PQL pipelines
directly to Spark DataFrame transformations, plus first-class
large-scale data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) the reference does not have.
"""

from .engine import MultiResult, PqlEngine, compile_pql, parse
from .parser import QueryError
from .sql_backend import compile_to_sql, compile_to_sql_multi

__all__ = [
    "MultiResult",
    "PqlEngine",
    "compile_pql",
    "compile_to_sql",
    "compile_to_sql_multi",
    "parse",
    "QueryError",
]
__version__ = "0.1.0"
