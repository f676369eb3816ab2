"""geo_point_to_cell (both backends + DuckDB twin) and the
cell-bucketed geo_radius_join (exact vs brute force)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from pql_spark import PqlEngine
from pql_spark.operators.geo import (
    MAX_LEVEL,
    geo_radius_join,
    radius_level,
)

# DuckDB twin of the Morton fold — used to prove the cell id is plain
# ANSI-SQL-expressible (the oracle device the gates use)
DUCK_CELL = """
SELECT list_sum([
    ((CAST(FLOOR(x / pow(2.0, i)) AS BIGINT) % 2)
       * CAST(pow(2.0, 2 * i + 1) AS BIGINT))
  + ((CAST(FLOOR(y / pow(2.0, i)) AS BIGINT) % 2)
       * CAST(pow(2.0, 2 * i) AS BIGINT))
  for i in range({lvl})]) AS cell
FROM (SELECT
  LEAST(CAST(pow(2.0, {lvl}) AS BIGINT) - 1,
        FLOOR(({lon} + 180.0) / 360.0 * pow(2.0, {lvl}))) AS x,
  LEAST(CAST(pow(2.0, {lvl}) AS BIGINT) - 1,
        FLOOR(({lat} + 90.0) / 180.0 * pow(2.0, {lvl}))) AS y)
"""


def py_cell(lon: float, lat: float, level: int) -> int:
    n = 1 << level
    x = min(n - 1, math.floor((lon + 180.0) / 360.0 * float(n)))
    y = min(n - 1, math.floor((lat + 90.0) / 180.0 * float(n)))
    out = 0
    for i in range(level):
        out += ((int(x) >> i) & 1) << (2 * i + 1)
        out += ((int(y) >> i) & 1) << (2 * i)
    return out


@pytest.fixture(scope="module")
def engine(spark):
    df = spark.createDataFrame(
        [
            (1, -122.4194, 37.7749),   # SF
            (2, -74.0060, 40.7128),    # NYC
            (3, 179.999, 0.0),         # antimeridian east
            (4, -179.999, 0.0),        # antimeridian west
            (5, 180.0, 90.0),          # corner clamp
            (6, 999.0, 0.0),           # invalid lon
        ],
        "id long, lon double, lat double",
    )
    df.createOrReplaceTempView("PTS")
    return PqlEngine(spark, resolver={"PTS": df})


def test_cell_matches_python_and_sql_backend(spark, engine):
    q = ("PTS | project id, c8 = geo_point_to_cell(lon, lat, 8),"
         " c0 = geo_point_to_cell(lon, lat, 0),"
         " cbad = geo_point_to_cell(lon, lat, 30)"
         " | sort by id asc")
    rows = engine.query(q).collect()
    pts = {r.id: r for r in spark.table("PTS").collect()}
    for r in rows:
        if r.id == 6:
            assert r.c8 is None and r.c0 is None
        else:
            p = pts[r.id]
            assert r.c8 == py_cell(p.lon, p.lat, 8), r.id
            assert r.c0 == 0
        assert r.cbad is None  # level > 26
    sql_rows = spark.sql(engine.to_sql(q)).collect()
    assert [tuple(r) for r in sql_rows] == [tuple(r) for r in rows]


def test_cell_matches_duckdb_twin(spark, engine):
    con = duckdb.connect()
    for r in spark.table("PTS").filter("id < 6").collect():
        for lvl in (1, 4, 8, 16, 26):
            got = con.execute(
                DUCK_CELL.format(lon=repr(r.lon), lat=repr(r.lat),
                                 lvl=lvl)
            ).fetchone()[0]
            assert got == py_cell(r.lon, r.lat, lvl), (r.id, lvl)


def test_cell_center_roundtrip_and_backends(spark, engine):
    """center is the exact inverse: re-encoding the center recovers
    the cell, on both backends, literal and column levels alike."""
    q = ("PTS | where id < 6"
         " | extend c = geo_point_to_cell(lon, lat, 10)"
         " | extend ctr = geo_cell_center(c, 10)"
         " | extend c2 = geo_point_to_cell(ctr.lon, ctr.lat, 10)"
         " | project id, c, c2, clon = ctr.lon, clat = ctr.lat"
         " | sort by id asc")
    rows = engine.query(q).collect()
    for r in rows:
        assert r.c == r.c2, r.id
        assert -180.0 <= r.clon <= 180.0 and -90.0 <= r.clat <= 90.0
    sql_rows = spark.sql(engine.to_sql(q)).collect()
    assert [tuple(r) for r in sql_rows] == [tuple(r) for r in rows]
    # column-level fold path agrees with the literal unrolled path
    from pql_spark.operators.geo import geo_cell_center, geo_point_to_cell

    pts = spark.table("PTS").filter("id < 6")
    cells = pts.select(
        geo_point_to_cell(F.col("lon"), F.col("lat"), 10).alias("c")
    )
    lit = cells.select(geo_cell_center(F.col("c"), 10).alias("s")).collect()
    col = cells.select(
        geo_cell_center(F.col("c"), F.lit(10)).alias("s")
    ).collect()
    assert lit == col
    # NULL cell -> NULL center
    assert cells.selectExpr("CAST(NULL AS BIGINT) AS c").select(
        geo_cell_center(F.col("c"), 10).alias("s")
    ).collect()[0].s is None


def test_radius_level():
    # largest L whose cells span >= 1 km in BOTH axes up to |lat|=66
    lvl = radius_level(1000.0)
    assert 0 < lvl <= MAX_LEVEL

    def min_span(level):
        lat_m = 180.0 / (1 << level) * 111194.9
        lon_m = (360.0 / (1 << level) * 111194.9
                 * math.cos(math.radians(66.0)))
        return min(lat_m, lon_m)

    assert min_span(lvl) >= 1000.0
    assert min_span(lvl + 1) < 1000.0 or lvl == MAX_LEVEL
    with pytest.raises(ValueError):
        radius_level(0)


def _pt_grid(spark, n, seed_off=0):
    # deterministic scatter around SF incl. near-identical clusters
    return spark.range(n).select(
        (F.col("id") + seed_off).alias("id"),
        (F.lit(-122.5) + (F.col("id") % 40) * 0.004
         + (F.col("id") % 7) * 0.0001).alias("lon"),
        (F.lit(37.6) + ((F.col("id") * 13) % 40) * 0.004
         + (F.col("id") % 5) * 0.0001).alias("lat"),
    )


def test_radius_join_exact_vs_brute_force(spark):
    a = _pt_grid(spark, 120)
    b = _pt_grid(spark, 150, seed_off=1000)
    out = geo_radius_join(a, b, radius_m=500.0)
    got = sorted((r.id_a, r.id_b) for r in out.collect())
    # brute force via the same haversine
    from pql_spark.operators.geo import haversine_m

    brute = (
        a.select(F.col("id").alias("id_a"), F.col("lon").alias("qlon"),
                 F.col("lat").alias("qlat"))
        .crossJoin(b.select(F.col("id").alias("id_b"), "lon", "lat"))
        .filter(haversine_m(F.col("qlon"), F.col("qlat"),
                            F.col("lon"), F.col("lat")) <= 500.0)
    )
    want = sorted((r.id_a, r.id_b) for r in brute.collect())
    assert got == want and len(got) > 0
    # distances attached and within the radius
    assert all(r.dist_m <= 500.0 for r in out.collect())


def test_radius_join_wraps_antimeridian(spark):
    a = spark.createDataFrame(
        [(1, 179.9995, 0.0)], "id long, lon double, lat double"
    )
    b = spark.createDataFrame(
        [(2, -179.9995, 0.0), (3, -179.0, 0.0)],
        "id long, lon double, lat double",
    )
    out = geo_radius_join(a, b, radius_m=500.0)
    assert [(r.id_a, r.id_b) for r in out.collect()] == [(1, 2)]


def test_radius_join_no_false_negatives_at_cell_edges(spark):
    # pairs straddling a cell boundary still meet via the ring
    lvl = radius_level(500.0)
    edge = -180.0 + 360.0 / (1 << lvl) * 7  # an exact x-cell boundary
    a = spark.createDataFrame(
        [(1, edge - 1e-4, 10.0)], "id long, lon double, lat double"
    )
    b = spark.createDataFrame(
        [(2, edge + 1e-4, 10.0)], "id long, lon double, lat double"
    )
    out = geo_radius_join(a, b, radius_m=500.0)
    assert [(r.id_a, r.id_b) for r in out.collect()] == [(1, 2)]


def test_radius_join_coarse_level_no_duplicate_pairs(spark):
    """Grids with <=2 columns alias ring offsets (dx=-1 wraps onto
    dx=+1 at n=2; all dx collide at level 0) — the ring must dedup so
    each qualifying pair is emitted exactly once (ADVICE r10)."""
    a = spark.createDataFrame(
        [(1, -122.4, 37.7), (2, 151.2, -33.9)],
        "id long, lon double, lat double",
    )
    b = spark.createDataFrame(
        [(10, -74.0, 40.7), (11, 139.7, 35.7)],
        "id long, lon double, lat double",
    )
    for lvl in (0, 1):
        out = geo_radius_join(a, b, radius_m=2.1e7, level=lvl)
        got = sorted((r.id_a, r.id_b) for r in out.collect())
        # everything is within 2.1e7 m of everything on the sphere
        want = sorted((x, y) for x in (1, 2) for y in (10, 11))
        assert got == want, lvl
    # the ADVICE repro: auto level for a huge radius is 0
    out = geo_radius_join(a, b, radius_m=9e6)
    pairs = [(r.id_a, r.id_b) for r in out.collect()]
    assert len(pairs) == len(set(pairs))


def test_radius_join_polar_auto_coarsen(spark):
    """|lat| > max_abs_lat: the default level misses cross-cell pairs
    near the pole; the lat-bound check must coarsen and recover them
    (VERDICT r10 stretch)."""
    # ~450 m apart in pure longitude at lat 87: several lon cells at
    # the default (|lat|<=66) level, so the 3x3 ring cannot reach
    dlon = 450.0 / (111194.9 * math.cos(math.radians(87.0)))
    a = spark.createDataFrame(
        [(1, 0.0, 87.0)], "id long, lon double, lat double"
    )
    b = spark.createDataFrame(
        [(2, dlon, 87.0)], "id long, lon double, lat double"
    )
    miss = geo_radius_join(a, b, radius_m=500.0, check_lat_bound=False)
    assert miss.collect() == []          # the silent-bound failure mode
    with pytest.warns(UserWarning, match="auto-coarsened"):
        out = geo_radius_join(a, b, radius_m=500.0)
    assert [(r.id_a, r.id_b) for r in out.collect()] == [(1, 2)]


def test_radius_join_nan_lat_treated_as_polar(spark):
    """A NaN latitude must not silently bypass the lat-bound check
    (NaN > bound is False): the measured max becomes 90.0 and the
    level coarsens, keeping real high-lat pairs (ADVICE r12)."""
    dlon = 450.0 / (111194.9 * math.cos(math.radians(87.0)))
    a = spark.createDataFrame(
        [(1, 0.0, 87.0), (3, 10.0, float("nan"))],
        "id long, lon double, lat double",
    )
    b = spark.createDataFrame(
        [(2, dlon, 87.0)], "id long, lon double, lat double"
    )
    with pytest.warns(UserWarning, match="auto-coarsened"):
        out = geo_radius_join(a, b, radius_m=500.0)
    assert [(r.id_a, r.id_b) for r in out.collect()] == [(1, 2)]


def test_radius_join_streaming_input_skips_eager_check(spark, tmp_path):
    """check_lat_bound's eager scan is impossible on a streaming
    input: construction must not run a batch job (ADVICE r12)."""
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ])
    stream = (
        spark.readStream.schema(schema).format("parquet")
        .load(str(tmp_path))
    )
    b = spark.createDataFrame(
        [(2, 0.001, 10.0)], "id long, lon double, lat double"
    )
    out = geo_radius_join(stream, b, radius_m=500.0)  # must not throw
    assert out.isStreaming


# --------------------------------------------------- property-based

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.floats(-180.0, 180.0, allow_nan=False),
            st.floats(-90.0, 90.0, allow_nan=False),
        ),
        min_size=1, max_size=40,
    ),
    level=st.integers(0, 26),
)
def test_cell_property_matches_python_model(spark, pts, level):
    """Random coords/levels: the Spark cell id equals the pure-Python
    model, and re-encoding the center recovers the cell (both the
    unrolled literal path and the Column fold path)."""
    from pql_spark.operators.geo import geo_cell_center, geo_point_to_cell

    df = spark.createDataFrame(pts, "lon double, lat double")
    out = df.select(
        "lon", "lat",
        geo_point_to_cell(F.col("lon"), F.col("lat"), level).alias("c"),
        geo_point_to_cell(
            F.col("lon"), F.col("lat"), F.lit(level)
        ).alias("cf"),
    ).withColumn(
        "rt",
        geo_point_to_cell(
            geo_cell_center(F.col("c"), level).getField("lon"),
            geo_cell_center(F.col("c"), level).getField("lat"),
            level,
        ),
    ).collect()
    for r in out:
        assert r.c == py_cell(r.lon, r.lat, level)
        assert r.cf == r.c          # fold path == unrolled path
        assert r.rt == r.c          # center re-encodes to the cell


def test_radius_join_self_half_ring_matches_generic(spark):
    """Self-join fast path (``a is b``, level >= 2): the half-ring +
    mirror plan must emit the EXACT multiset the generic 9-ring path
    emits — same ordered pairs (both orientations of every cross-cell
    pair, both orders of same-cell pairs, (p, p) self-pairs once) and
    bit-identical dist_m."""
    pts = _pt_grid(spark, 200)
    twin = _pt_grid(spark, 200)  # distinct object -> generic path
    for lvl in (2, 8, 14):
        new = geo_radius_join(pts, pts, radius_m=700.0, level=lvl)
        old = geo_radius_join(pts, twin, radius_m=700.0, level=lvl)
        cols = ["id_a", "lon_a", "lat_a", "id_b", "lon_b", "lat_b",
                "dist_m"]
        assert new.columns == old.columns
        n, o = new.select(cols), old.select(cols)
        assert n.exceptAll(o).count() == 0
        assert o.exceptAll(n).count() == 0
        assert n.count() == o.count() > 0
    # the half-ring explode is 5 slots, the generic one 9
    plan = geo_radius_join(
        pts, pts, radius_m=700.0, level=14
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "named_struct(c, " in plan  # struct-slot half ring present


def test_radius_join_self_level1_keeps_generic_path(spark):
    """Level <= 1 aliases ring offsets (d == -d mod 2), so the
    one-orientation argument breaks — the self-join must fall back to
    the generic dedup'd ring and still emit each ordered pair once."""
    a = spark.createDataFrame(
        [(1, -122.4, 37.7), (2, 151.2, -33.9), (3, -74.0, 40.7)],
        "id long, lon double, lat double",
    )
    for lvl in (0, 1):
        out = geo_radius_join(a, a, radius_m=2.1e7, level=lvl)
        got = sorted((r.id_a, r.id_b) for r in out.collect())
        want = sorted((x, y) for x in (1, 2, 3) for y in (1, 2, 3))
        assert got == want, lvl
