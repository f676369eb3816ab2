"""Session construction and table catalogs.

Scale notes: the session defaults enable AQE (runtime re-planning,
skew-join splitting, partition coalescing) and Arrow for any pandas
interchange.  ``spark.sql.shuffle.partitions`` is a *default* sized for
local runs; on a real cluster it should be ~2-3× total cores or left to
AQE's coalescing with a high initial value.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def build_session(
    app_name: str = "pql_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """SparkSession tuned for analytics at scale.

    AQE handles runtime partition coalescing and skew-join splitting —
    the same knobs that matter at 100 TB, exercised locally.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or max(cpus, 8)),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # parquet TIMESTAMP(NANOS) (unsupported by Spark) reads as long;
        # _read_parquet casts it back to a (microsecond) timestamp
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # parquet timestamps without tz otherwise read as TIMESTAMP_NTZ,
        # which unix_micros/window/watermark reject; with a UTC session
        # the LTZ reading is value-identical to the naive oracle's
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode runs driver + every executor thread in ONE JVM:
        # size it for cores × concurrent task memory, not a driver's
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g")
        )
        # generated-class cache: the default 100 entries thrashes on
        # multi-stage pipelines (curate_corpus alone spans ~90 stages,
        # so even its own second run re-Janino-compiles every class)
        # and on any long-lived session running many distinct queries
        # — measured 7.1 s → 5.3 s on the composed curation pipeline
        # at sf0.1 from this alone.  Cost: bounded driver memory for
        # compiled classes.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


_NANOS_TS_CACHE: dict[tuple, list[str]] = {}


def snapshot_key(path: Path) -> tuple:
    """Cache key that invalidates when the file at ``path`` is replaced:
    (path, size, mtime_ns).  Directories key on the path alone (their
    mtime churns with unrelated entries); a stat failure also falls back
    to the bare path so missing files still get negative-cached."""
    p = str(path)
    try:
        st = path.stat()
        if path.is_file():
            return (p, st.st_size, st.st_mtime_ns)
    except OSError:
        pass
    return (p, None, None)


def clear_source_caches() -> None:
    """Drop the per-snapshot footer/schema caches (tests, long sessions
    that overwrite data in place)."""
    from pql_spark.streaming import pipeline as _sp

    _NANOS_TS_CACHE.clear()
    _sp._STREAM_SRC_CACHE.clear()


def _nanos_ts_columns(path: Path) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS) (read by Spark as
    long under ``nanosAsLong``); detected from the parquet footer.
    Cached per (path, size, mtime) — callers probe the same snapshot
    many times per session and each probe is a footer read; a file
    REPLACED at the same path re-keys and re-reads (ADVICE r8)."""
    key = snapshot_key(path)
    got = _NANOS_TS_CACHE.get(key)
    if got is not None:
        return got
    got = _nanos_ts_columns_uncached(path)
    _NANOS_TS_CACHE[key] = got
    return got


def _nanos_ts_columns_uncached(path: Path) -> list[str]:
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(str(path))
    except Exception:  # noqa: BLE001 — footer probe is best-effort
        return []
    return [
        f.name
        for f in schema
        if str(f.type).startswith("timestamp[ns")
    ]


def _force_utc_ltz(spark: SparkSession) -> None:
    """Make parquet timestamps land as TIMESTAMP (LTZ) under a UTC
    session, regardless of who built the session.

    The driver hands us its own SparkSession; Spark 4 defaults
    ``inferTimestampNTZ`` on, so naive parquet timestamps read as
    TIMESTAMP_NTZ — a type ``unix_micros``/``window``/``withWatermark``
    reject.  Both confs are runtime-settable SQL confs; with the session
    pinned to UTC the LTZ micros equal the naive wall-clock micros, so
    results match a naive-timestamp oracle (DuckDB) exactly.
    """
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _cast_ntz(df: DataFrame) -> DataFrame:
    """Belt-and-braces: cast any TIMESTAMP_NTZ column to TIMESTAMP (a
    pure wall-clock reinterpretation under a UTC session)."""
    from pyspark.sql import types as T

    ntz = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def _read_parquet(spark: SparkSession, path: Path) -> DataFrame:
    """Read one parquet table, restoring nanosecond-timestamp columns
    (landed as long nanos) to proper timestamps (microsecond precision —
    Spark's native unit; sub-microsecond bits are truncated).

    Sets ``nanosAsLong`` on the session when needed — callers may hand
    us a session that was not built by :func:`build_session` (it is a
    runtime-settable SQL conf), and without it the read throws
    ``PARQUET_TYPE_ILLEGAL``.
    """
    nanos_cols = _nanos_ts_columns(path)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _force_utc_ltz(spark)
    df = spark.read.parquet(str(path))
    for c in nanos_cols:
        # integer `div` — float division would round 1e18-scale nanos
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return _cast_ntz(df)


def load_sf_dir(
    spark: SparkSession, sf_dir: str | os.PathLike
) -> dict[str, DataFrame]:
    """Load every ``<table>.parquet`` in a scale-factor directory into a
    name→DataFrame catalog (the driver's synthetic TPC-H-ish tables)."""
    catalog: dict[str, DataFrame] = {}
    for path in sorted(Path(sf_dir).glob("*.parquet")):
        catalog[path.stem] = _read_parquet(spark, path)
    return catalog


def parquet_catalog(spark: SparkSession, sf_dir: str | os.PathLike):
    """Resolver callable for PqlEngine over a parquet directory (lazy —
    each table is read on first reference so filters/pruning push into
    the scan of only the tables a query touches)."""
    base = Path(sf_dir)
    cache: dict[str, DataFrame] = {}

    def resolve(name: str) -> DataFrame:
        if name not in cache:
            path = base / f"{name}.parquet"
            if not path.exists():
                raise KeyError(f"no parquet table {name!r} under {base}")
            cache[name] = _read_parquet(spark, path)
        return cache[name]

    return resolve


def register_views(spark: SparkSession, sf_dir: str | os.PathLike) -> None:
    """Register the sf directory's tables as temp views (for spark.sql)."""
    for name, df in load_sf_dir(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


_FORMAT_DEFAULTS: dict[str, dict[str, str]] = {
    "csv": {"header": "true", "inferSchema": "true"},
    "json": {},
    "parquet": {},
}


def file_catalog(
    spark: SparkSession,
    base_dir: str | os.PathLike,
    fmt: str = "parquet",
    **options: str,
):
    """Resolver callable over ``<base_dir>/<name>.<fmt>`` files of any
    Spark-readable format (the reference's test harness exposes CSV and
    JSON files as tables the same way, clickhouse_test.go:64-78).

    CSV defaults to header+inferSchema; pass explicit reader options to
    override (at scale, always pass an explicit ``schema`` option —
    inference scans the data twice).
    """
    if fmt not in _FORMAT_DEFAULTS:
        raise ValueError(f"unsupported format {fmt!r}")
    if fmt == "parquet" and not options:
        return parquet_catalog(spark, base_dir)
    base = Path(base_dir)
    opts = {**_FORMAT_DEFAULTS[fmt], **options}
    cache: dict[str, DataFrame] = {}

    def resolve(name: str) -> DataFrame:
        if name not in cache:
            path = base / f"{name}.{fmt}"
            if not path.exists():
                raise KeyError(f"no {fmt} table {name!r} under {base}")
            cache[name] = spark.read.options(**opts).format(fmt).load(
                str(path)
            )
        return cache[name]

    return resolve
