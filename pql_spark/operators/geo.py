"""Geo bucketing: fixed-level grid cell ids + a cell-bucketed radius
join.

The cell id is a Morton (Z-order) interleave of equirectangular
longitude/latitude bins at ``level`` bits per axis — the same
fixed-level-cell device as KQL's ``geo_point_to_s2cell`` (s2 tokens
use a Hilbert curve on cube faces; this grid keeps the property that
MATTERS for joins — points within one cell size of each other land in
adjacent cells — while staying exactly expressible in Spark SQL *and*
plain ANSI SQL, so every result here is DuckDB-oracle-checkable).

``geo_radius_join`` pairs the cell id with the bucketize-join device
from :mod:`.temporal` (``range_join``): bucket side A on its cell,
explode side B to its 3×3 neighbor ring, hash equi-join on the cell,
then exact haversine verify.  Candidates are bounded by cell
occupancy (never all-pairs) and the equi-join shuffles on a uniform
integer key — the 100 TB-correct shape for a spatial join.

All arithmetic is double-precision IEEE with exact powers of two
(level ≤ 26 keeps every intermediate < 2^53), so Spark's DataFrame
backend, the SQL text backend, and a DuckDB list-comprehension oracle
produce bit-identical cell ids.
"""

from __future__ import annotations

import math
import re
import warnings

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._util import rebalance

#: mean-radius sphere, matches functions.geo_distance_2points
EARTH_R_M = 6371008.8
#: meters per degree of latitude on that sphere (2πR/360)
M_PER_DEG = EARTH_R_M * math.pi / 180.0
MAX_LEVEL = 26


def _valid(lon: Column, lat: Column) -> Column:
    return (
        (lon >= -180) & (lon <= 180) & (lat >= -90) & (lat <= 90)
    )


def _bins(
    lon: Column, lat: Column, level: Column | int
) -> tuple[Column, Column]:
    """Equirectangular (x, y) integer bins at ``level`` bits/axis,
    clamped so lon=180 / lat=90 land in the top bin.  An int level
    folds 2^level Python-side (same double value as the pow() path,
    so bins are bit-identical)."""
    if isinstance(level, int):
        n: Column = F.lit(float(1 << level))
        top = F.lit((1 << level) - 1).cast("long")
    else:
        n = F.pow(F.lit(2.0), level.cast("int"))
        top = (n - 1).cast("long")
    x = F.least(
        top, F.floor((lon.cast("double") + 180.0) / 360.0 * n)
    )
    y = F.least(
        top, F.floor((lat.cast("double") + 90.0) / 180.0 * n)
    )
    return x, y


def _morton(x: Column, y: Column, level: Column) -> Column:
    """Interleave ``level`` bits of x (odd positions) and y (even):
    Σ_i bit_i(x)·2^(2i+1) + bit_i(y)·2^(2i).  Pure Catalyst fold —
    no shift-by-column builtin exists in the Python API, but powers
    of two are exact in doubles through 2^53, so divide/mod is
    bit-exact here (level ≤ 26 ⇒ result < 2^52).  level 0 short-
    circuits to cell 0 (Spark's sequence(0, -1) would DESCEND)."""
    fold = F.aggregate(
        F.sequence(F.lit(0), level.cast("int") - 1),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + (
            F.floor(x / F.pow(F.lit(2.0), i)).cast("long") % 2
        ) * F.pow(F.lit(2.0), 2 * i + 1).cast("long")
        + (
            F.floor(y / F.pow(F.lit(2.0), i)).cast("long") % 2
        ) * F.pow(F.lit(2.0), 2 * i).cast("long"),
    )
    lvl = level.cast("int")
    return F.when(lvl == 0, F.lit(0).cast("long")).otherwise(fold)


def _sql_ident(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


#: column references safe to splice into SQL text verbatim: plain or
#: backticked identifiers and dotted struct-field paths only
_SIMPLE_COL_SQL = re.compile(r"^[A-Za-z0-9_.`]+$")


def _col_sql(c: Column | str) -> str | None:
    """SQL text of a Column when it is a plain (possibly dotted)
    column reference — the guard that lets literal-level cell math be
    emitted as ONE ``F.expr`` parse instead of ~8 py4j round trips
    per level.  Anything more complex returns None (callers keep the
    Column-API build, which handles arbitrary expressions)."""
    if isinstance(c, str):
        return _sql_ident(c)
    try:
        s = c._jc.expr().sql()
    except Exception:  # noqa: BLE001 — connect/foreign Column: no _jc
        return None
    return s if _SIMPLE_COL_SQL.match(s) else None


def _bins_sql(lon: str, lat: str, level: int) -> tuple[str, str]:
    """SQL-text twin of :func:`_bins` for a literal level — same
    Catalyst tree from ONE parse instead of ~10 py4j round trips.
    ``lon``/``lat`` are SQL expression strings (already quoted)."""
    n = float(1 << level)
    top = (1 << level) - 1
    x = (
        f"least(CAST({top} AS BIGINT), floor((CAST({lon} AS DOUBLE)"
        f" + 180.0D) / 360.0D * {n!r}D))"
    )
    y = (
        f"least(CAST({top} AS BIGINT), floor((CAST({lat} AS DOUBLE)"
        f" + 90.0D) / 180.0D * {n!r}D))"
    )
    return x, y


def _morton_sql(x: str, y: str, level: int) -> str:
    """SQL-text twin of :func:`_morton_unrolled`: the same flat
    left-associated sum of shift/AND terms, parsed once.  Building
    this tree through the Column API costs ~8 py4j round trips per
    level (~1.3 s at level 18 with the ring twin); the text form is
    one ``F.expr`` parse."""
    if level == 0:
        return "CAST(0 AS BIGINT)"
    parts = [
        f"(shiftleft(shiftright({x}, {i}) & 1, {2 * i + 1})"
        f" + shiftleft(shiftright({y}, {i}) & 1, {2 * i}))"
        for i in range(level)
    ]
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def _morton_unrolled(x: Column, y: Column, level: int) -> Column:
    """Literal-level Morton interleave as a flat sum of native
    shift/AND terms — no sequence/aggregate, no pow(); ~7× cheaper
    per row than the fold at level 12 and bit-identical to it."""
    if level == 0:
        return F.lit(0).cast("long")
    out: Column | None = None
    for i in range(level):
        t = F.shiftleft(
            F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i + 1
        ) + F.shiftleft(
            F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i
        )
        out = t if out is None else out + t
    return out.cast("long")


def geo_point_to_cell(
    lon: Column, lat: Column, level: Column | int
) -> Column:
    """Fixed-level grid cell id (long) of a lon/lat point; NULL for
    coordinates outside [-180,180]×[-90,90] or level outside
    [0, 26].  level 0 ⇒ the single cell 0.  A literal (int) level —
    the common case — takes the unrolled shift/AND path; a Column
    level falls back to the sequence-fold (same values)."""
    if isinstance(level, int):
        if not 0 <= level <= MAX_LEVEL:
            return F.lit(None).cast("long")
        lo, la = _col_sql(lon), _col_sql(lat)
        if lo is not None and la is not None:
            # plain column refs: same tree, ONE SQL parse
            xs, ys = _bins_sql(lo, la, level)
            return F.expr(
                f"CASE WHEN CAST({lo} AS DOUBLE) >= -180"
                f" AND CAST({lo} AS DOUBLE) <= 180"
                f" AND CAST({la} AS DOUBLE) >= -90"
                f" AND CAST({la} AS DOUBLE) <= 90"
                f" THEN {_morton_sql(xs, ys, level)} END"
            )
        x, y = _bins(lon, lat, level)
        return F.when(
            _valid(lon.cast("double"), lat.cast("double")),
            _morton_unrolled(x, y, level),
        )
    lvl = level.cast("int")
    x, y = _bins(lon, lat, lvl)
    return F.when(
        _valid(lon.cast("double"), lat.cast("double"))
        & lvl.between(0, MAX_LEVEL),
        _morton(x, y, lvl),
    )


def geo_cell_center(cell: Column, level: Column | int) -> Column:
    """Inverse of :func:`geo_point_to_cell`: the center (lon, lat) of
    a cell as ``struct(lon double, lat double)``; NULL for NULL cells
    or level outside [0, 26].  Round-trip law (tested):
    ``geo_point_to_cell(center(c, L), L) == c`` for every valid cell.
    Literal levels decompact the Morton bits with flat shift/AND
    terms; Column levels use the sequence-fold (same values)."""
    if isinstance(level, int):
        if not 0 <= level <= MAX_LEVEL:
            return F.lit(None).cast("struct<lon:double,lat:double>")
        cs = _col_sql(cell)
        if cs is not None:
            # plain column ref: same tree, ONE SQL parse
            if level == 0:
                xs = ys = "CAST(0 AS BIGINT)"
            else:
                xs = "CAST(" + " + ".join(
                    f"shiftleft(shiftright({cs}, {2 * i + 1}) & 1, {i})"
                    for i in range(level)
                ) + " AS BIGINT)"
                ys = "CAST(" + " + ".join(
                    f"shiftleft(shiftright({cs}, {2 * i}) & 1, {i})"
                    for i in range(level)
                ) + " AS BIGINT)"
            w_lon = 360.0 / float(1 << level)
            w_lat = 180.0 / float(1 << level)
            return F.expr(
                f"CASE WHEN {cs} IS NOT NULL THEN struct("
                f"-180.0D + (CAST({xs} AS DOUBLE) + 0.5D)"
                f" * {w_lon!r}D AS lon, "
                f"-90.0D + (CAST({ys} AS DOUBLE) + 0.5D)"
                f" * {w_lat!r}D AS lat) END"
            )
        if level == 0:
            x: Column = F.lit(0).cast("long")
            y: Column = F.lit(0).cast("long")
        else:
            xt = [
                F.shiftleft(
                    F.shiftright(cell, 2 * i + 1).bitwiseAND(F.lit(1)),
                    i,
                )
                for i in range(level)
            ]
            yt = [
                F.shiftleft(
                    F.shiftright(cell, 2 * i).bitwiseAND(F.lit(1)), i
                )
                for i in range(level)
            ]
            x = sum(xt[1:], xt[0]).cast("long")
            y = sum(yt[1:], yt[0]).cast("long")
        w_lon = 360.0 / float(1 << level)
        w_lat = 180.0 / float(1 << level)
        lon = F.lit(-180.0) + (x.cast("double") + 0.5) * F.lit(w_lon)
        lat = F.lit(-90.0) + (y.cast("double") + 0.5) * F.lit(w_lat)
        return F.when(
            cell.isNotNull(),
            F.struct(lon.alias("lon"), lat.alias("lat")),
        )
    lvl = level.cast("int")
    seq = F.sequence(F.lit(0), lvl - 1)

    def compact(offset: int) -> Column:
        return F.aggregate(
            seq,
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + (
                F.floor(
                    cell / F.pow(F.lit(2.0), 2 * i + offset)
                ).cast("long")
                % 2
            )
            * F.pow(F.lit(2.0), i).cast("long"),
        )

    n = F.pow(F.lit(2.0), lvl)
    x, y = compact(1), compact(0)
    lon = F.lit(-180.0) + (x.cast("double") + 0.5) * (F.lit(360.0) / n)
    lat = F.lit(-90.0) + (y.cast("double") + 0.5) * (F.lit(180.0) / n)
    body = F.when(lvl == 0, F.struct(
        F.lit(0.0).alias("lon"), F.lit(0.0).alias("lat")
    )).otherwise(F.struct(lon.alias("lon"), lat.alias("lat")))
    return F.when(
        cell.isNotNull() & lvl.between(0, MAX_LEVEL), body
    )


def haversine_m(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """Great-circle meters on the mean-radius sphere (same formula as
    the ``geo_distance_2points`` scalar in functions.py)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    h = (
        F.pow(F.sin((rlat2 - rlat1) / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2)
        * F.pow(F.sin((F.radians(lon2) - F.radians(lon1)) / 2), 2)
    )
    return F.lit(2.0 * EARTH_R_M) * F.asin(
        F.least(F.lit(1.0), F.sqrt(h))
    )


def radius_level(radius_m: float, max_abs_lat: float = 66.0) -> int:
    """Largest level whose cell spans ≥ ``radius_m`` in BOTH axes for
    every |lat| ≤ ``max_abs_lat`` — the coverage condition under which
    a 3×3 neighbor ring contains every point within ``radius_m``.
    Latitude cells span 180/2^L degrees; longitude cells span
    360/2^L degrees · cos(lat) meters at their narrowest."""
    if radius_m <= 0:
        raise ValueError("radius_m must be positive")
    lat_span = 180.0 * M_PER_DEG          # meters at level 0
    lon_span = 360.0 * M_PER_DEG * math.cos(math.radians(max_abs_lat))
    lvl = math.floor(math.log2(min(lat_span, lon_span) / radius_m))
    return max(0, min(MAX_LEVEL, lvl))


def geo_radius_join(
    a: DataFrame,
    b: DataFrame,
    radius_m: float,
    lon_col: str = "lon",
    lat_col: str = "lat",
    suffixes: tuple[str, str] = ("_a", "_b"),
    level: int | None = None,
    max_abs_lat: float = 66.0,
    check_lat_bound: bool = True,
) -> DataFrame:
    """All (a, b) pairs within ``radius_m`` meters (great-circle), via
    cell bucketing — never all-pairs.

    Side A keys on its own cell; side B explodes to its 3×3 neighbor
    ring (≤ 9 cells, built from the (x, y) bins directly — longitude
    wraps modulo the grid, latitude rows outside the grid drop), then
    one hash equi-join on the integer cell id and an exact haversine
    verify.  A appears in exactly ONE bucket, so no pair dedup is
    needed.  Output: all A columns suffixed, all B columns suffixed,
    plus ``dist_m``.

    Coverage contract: exact (no false negatives) while every point
    has |lat| ≤ ``max_abs_lat`` and ``level`` ≤
    :func:`radius_level` (the default picks exactly that).  Beyond
    the lat bound, longitude cells narrow below the radius and
    cross-meridian pairs near the poles can be missed — so when
    ``level`` is auto-picked and ``check_lat_bound`` is on (default),
    the actual max |lat| of both sides is measured (one column-pruned
    1-row aggregate) and the level auto-coarsens to the data's real
    bound, with a warning.  NOTE: that measurement runs an EAGER Spark
    job at DataFrame-construction time (the one laziness exception in
    this module); streaming inputs skip it (no batch scan is possible)
    and keep the ``max_abs_lat`` default.  A NaN latitude makes the
    measured max NaN — treated as 90.0 (worst case) so the coarsen
    cannot be silently bypassed.  Pass an explicit ``level`` or
    ``check_lat_bound=False`` to skip the extra scan when the data's
    latitude range is known.

    Scale: the join shuffles on a uniform integer key; candidate
    count is Σ_cell |A_cell|·|B_ring(cell)| — bounded by occupancy,
    like the LSH band join.  A pathologically hot cell (everything at
    one landmark) degrades like any skewed join key and is AQE
    skew-splittable, since the verify filter is per-row.

    Self-join fast path (r15, guide §2.3/§3.3 — an explode before a
    join multiplies the shuffle): when ``a is b`` (the same DataFrame
    object — a guaranteed self-join) and ``level ≥ 2``, side B
    explodes to a HALF ring of 5 cells (center + the 4 offsets with
    (dy, dx) lexicographically positive) instead of all 9.  Every
    unordered cross-cell pair then matches in exactly ONE orientation
    (for distinct cells, exactly one of δ and −δ lies in the half
    set), so the missing orientation is reconstructed AFTER the
    haversine verify by mirroring non-same-cell result rows (swap the
    A/B column groups; ``dist_m`` is orientation-invariant because
    every haversine intermediate is symmetric under IEEE negation/
    commutation).  Same-cell matches already produce both orders via
    the center slot, and (p, p) self-pairs appear exactly once —
    output rows are identical to the 9-ring path (asserted by
    tests/test_geo.py); only the exploded/shuffled side shrinks 9→5
    and the candidate verify halves.  Level ≤ 1 keeps the full ring
    (ring offsets alias under the 2-cell wrap, breaking the
    one-orientation argument).
    """
    if level is None:
        level = radius_level(radius_m, max_abs_lat)
        if check_lat_bound and not (a.isStreaming or b.isStreaming):
            actual = _max_abs_lat(a, b, lat_col)
            if actual is not None and math.isnan(actual):
                actual = 90.0  # NaN compares False everywhere; assume worst
            if actual is not None and actual > max_abs_lat:
                level = radius_level(radius_m, min(actual, 90.0))
                warnings.warn(
                    f"geo_radius_join: data reaches |lat|={actual:.2f}"
                    f" > max_abs_lat={max_abs_lat}; auto-coarsened to"
                    f" level {level} to keep the pair set exact"
                    " (pass level= or check_lat_bound=False to"
                    " override)",
                    stacklevel=2,
                )
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    n_cells = 1 << level
    sa, sb = suffixes
    # `a is b` guarantees a self-join semantically; streaming frames
    # keep the generic path (no reason to vary plan shape there)
    self_pair = a is b and level >= 2 and not a.isStreaming

    def pick(df: DataFrame, suf: str) -> DataFrame:
        return rebalance(df).select(
            *[F.col(c).alias(f"{c}{suf}") for c in df.columns]
        )

    a2 = pick(a, sa)
    b2 = pick(b, sb)
    # Cell ids as SQL text, ONE F.expr parse per side: the Column-API
    # build of the unrolled Morton sum + 3x3 ring ran to ~400 py4j
    # round trips (~1.3 s of driver time per call at level 18).
    ax, ay = _bins_sql(
        _sql_ident(lon_col + sa), _sql_ident(lat_col + sa), level
    )
    a2 = a2.withColumn("__cell", F.expr(_morton_sql(ax, ay, level)))
    bx, by = _bins_sql(
        _sql_ident(lon_col + sb), _sql_ident(lat_col + sb), level
    )
    dist = haversine_m(
        F.col(lon_col + sa), F.col(lat_col + sa),
        F.col(lon_col + sb), F.col(lat_col + sb),
    )
    if self_pair:
        # HALF ring (center first): each unordered cross-cell pair
        # matches in exactly one orientation; mirrored after verify
        slots = []
        for dx, dy in ((0, 0), (1, 0), (-1, 1), (0, 1), (1, 1)):
            xx = f"(({bx} + ({dx}) + {n_cells}) % {n_cells})" if dx else bx
            yy = f"({by} + {dy})" if dy else by
            s = (
                f"named_struct('c', {_morton_sql(xx, yy, level)},"
                f" 'ctr', {'true' if (dx, dy) == (0, 0) else 'false'})"
            )
            if dy:  # dy=+1 clips at the top grid row (lat never wraps)
                s = f"CASE WHEN {yy} <= {n_cells - 1} THEN {s} END"
            slots.append(s)
        half_sql = (
            "filter(array(" + ", ".join(slots) + "), s -> s IS NOT NULL)"
        )
        b2 = b2.withColumn("__bk", F.explode(F.expr(half_sql)))
        joined = (
            a2.join(b2, F.col("__cell") == F.col("__bk.c"))
            .withColumn("dist_m", dist)
            .filter(F.col("dist_m") <= F.lit(float(radius_m)))
        )
        # self-join: a.columns == b.columns, so the swapped twin maps
        # each A-suffixed value into the B slot and vice versa; struct
        # field order (= output column order) matches the generic path
        orig = F.struct(
            *[F.col(f"{c}{sa}").alias(f"{c}{sa}") for c in a.columns],
            *[F.col(f"{c}{sb}").alias(f"{c}{sb}") for c in b.columns],
            F.col("dist_m").alias("dist_m"),
        )
        swap = F.struct(
            *[F.col(f"{c}{sb}").alias(f"{c}{sa}") for c in a.columns],
            *[F.col(f"{c}{sa}").alias(f"{c}{sb}") for c in b.columns],
            F.col("dist_m").alias("dist_m"),
        )
        return joined.select(
            F.explode(
                F.when(F.col("__bk.ctr"), F.array(orig)).otherwise(
                    F.array(orig, swap)
                )
            ).alias("__p")
        ).select("__p.*")
    # 3x3 ring from the bins directly (no cell decode): dx wraps the
    # antimeridian, dy clips at the poles; NULL slots filter out
    xx = f"(({bx} + (k % 3 - 1) + {n_cells}) % {n_cells})"
    yy = f"({by} + (CAST(floor(k / 3) AS INT) - 1))"
    ring_sql = (
        "filter(transform(sequence(0, 8), k -> CASE WHEN"
        f" {yy} >= 0 AND {yy} <= {n_cells - 1}"
        f" THEN {_morton_sql(xx, yy, level)} END),"
        " c -> c IS NOT NULL)"
    )
    if level <= 1:
        # grids with <=2 columns alias ring offsets (dx=-1 wraps onto
        # dx=+1 when n_cells==2; everything collides at level 0), which
        # would duplicate output pairs — dedup the <=9 cells.  At
        # level >= 2 all ring cells are distinct by construction.
        ring_sql = f"array_distinct({ring_sql})"
    b2 = b2.withColumn("__cell", F.explode(F.expr(ring_sql)))
    return (
        a2.join(b2, "__cell")
        .withColumn("dist_m", dist)
        .filter(F.col("dist_m") <= F.lit(float(radius_m)))
        .drop("__cell")
    )


def _max_abs_lat(
    a: DataFrame, b: DataFrame, lat_col: str
) -> float | None:
    """Max |lat| across both inputs — ONE bounded 1-row collect over a
    column-pruned scan (only the lat column reaches the reader)."""
    m = F.max(F.abs(F.col(lat_col).cast("double"))).alias("m")
    row = a.select(m).unionAll(b.select(m)).agg(F.max("m")).first()
    return None if row is None else row[0]


