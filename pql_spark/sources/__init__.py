"""Data-source helpers.

The reference language has named-table sources only (TableRef,
pql.go:532-540); connectors live outside the language.  Here we provide
the Spark-side equivalents: session builders tuned for analytics and
loaders that register parquet/CSV directories as catalogs.
"""

from .catalog import (
    build_session,
    file_catalog,
    load_sf_dir,
    parquet_catalog,
    register_views,
)
from .sinks import (
    cluster_by,
    compact_table,
    write_bucketed,
    write_partitioned,
)

__all__ = [
    "build_session",
    "file_catalog",
    "load_sf_dir",
    "parquet_catalog",
    "register_views",
    "cluster_by",
    "compact_table",
    "write_bucketed",
    "write_partitioned",
]
