"""Planar geospatial queries: ST_* point math, Bing tiles, spatial joins.

The largest reference surface previously at zero coverage (VERDICT r3
"What's missing" #1): presto-geospatial's GeoFunctions.java (ST_* scalars)
and BingTileFunctions.java, plus SpatialJoinNode.java's two join predicates
(contains, distance-within). Full polygon geometry stays out of scope
(Sedona territory, SURVEY.md §2.6); everything here is the dependency-free
planar subset as pure SQL arithmetic, oracle-checked against DuckDB running
the identical expressions.

The fixtures carry no coordinates, so every query derives deterministic
lat/lon from integer keys (exact rationals — identical in both engines);
the *operators* under test are the geo expressions and join shapes.

Scale notes (100 TB):
- Both spatial joins are GRID-BLOCKED: candidates come from an equi-join on
  a 10-degree cell key (points map to exactly one cell; a zone/city
  enumerates its few covering cells), then the exact predicate refines.
  Never all-pairs — the same banding discipline as the LSH dedup join, and
  the planar analog of the reference's KdbTree-partitioned spatial join
  (SpatialJoinOperator.java:41). Plan shape pinned by
  tests/test_plan_shapes.py::test_spatial_join_has_no_cartesian.
- Cell width (10 deg) must exceed the zone rectangle span so each zone
  covers <= 4 cells; a production tuning knob, fixed here.
- Antimeridian wrap is not handled (a zone straddling lon 180 misses
  neighbors across the wrap) — same clip behavior as the reference's
  bing_tiles_around at the map edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import geo as G
from .registry import query, sql_over

ZOOM = 12
CELL_DEG = 10
CITY_RADIUS_KM = 500.0

# Deterministic synthetic coordinates from integer keys (exact in DOUBLE).
_POINTS = """
    SELECT c_custkey,
           CAST((c_custkey * 7919) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon,
           CAST((c_custkey * 104729) % 16000 AS DOUBLE) / 100.0 - 80.0 AS lat
    FROM customer
"""

_ZONES = """
    SELECT n_nationkey AS zone_id,
           CAST((n_nationkey * 6151) % 34000 AS DOUBLE) / 100.0 - 170.0 AS cx,
           CAST((n_nationkey * 9973) % 15000 AS DOUBLE) / 100.0 - 75.0 AS cy
    FROM nation
"""
ZONE_HALF_W = 4.5  # zone span 9 deg < CELL_DEG, so <= 2 cells per axis
ZONE_HALF_H = 3.5


def _cell_x(lon: str) -> str:
    return f"CAST(floor(({lon}) / {CELL_DEG}.0) AS BIGINT)"


def _cell_id(cx: str, cy: str) -> str:
    # Collision-free pack: cx in [-18, 18], cy in [-9, 9] for our derivations.
    return f"(({cx}) + 20) * 100 + (({cy}) + 20)"


def _point_distance_sql(dialect: str) -> str:
    gc = G.great_circle_sql("lat", "lon", "47.6062", "-122.3321")
    return f"""
WITH pts AS ({_POINTS})
SELECT c_custkey,
       lon AS st_x,
       lat AS st_y,
       round(sqrt((lon - 10.0) * (lon - 10.0) + (lat - 20.0) * (lat - 20.0)), 6) AS planar_dist,
       round({gc}, 6) AS gc_km_seattle,
       (lon > -20.0 AND lon < 60.0 AND lat > -10.0 AND lat < 50.0) AS in_env
FROM pts
WHERE c_custkey % 7 = 0
ORDER BY c_custkey
"""


@query(
    "fn_geo_point_distance",
    oracle=_point_distance_sql("duck"),
    doc="ST_Point/ST_X/ST_Y, planar ST_Distance to a fixed point, "
    "great_circle_distance (BingTileFunctions.java:705 form, R=6371.01 km), "
    "and ST_Contains(envelope, point) with the strict-interior boundary rule "
    "(GeoFunctions.java stPoint/stX/stY/stDistance/stContains).",
    tags=("geo",),
)
def fn_geo_point_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _point_distance_sql("spark"), ("customer",))


def _bingtile_sql(dialect: str) -> str:
    qk = G.quadkey_sql("tile_x", "tile_y", ZOOM, dialect)
    dec_x = G.quadkey_decode_sql("quadkey", ZOOM, "x", dialect)
    dec_y = G.quadkey_decode_sql("quadkey", ZOOM, "y", dialect)
    return f"""
WITH pts AS ({_POINTS}),
tiles AS (
    SELECT c_custkey, lat, lon,
           {G.bing_tile_x_sql("lon", ZOOM, dialect)} AS tile_x,
           {G.bing_tile_y_sql("lat", ZOOM, dialect)} AS tile_y
    FROM pts
    WHERE c_custkey % 11 = 0
),
keyed AS (
    SELECT c_custkey, tile_x, tile_y, {qk} AS quadkey FROM tiles
)
SELECT c_custkey, tile_x, tile_y, quadkey,
       ({dec_x} = tile_x AND {dec_y} = tile_y) AS roundtrip_ok,
       round({G.tile_corner_lat_sql("tile_y", ZOOM)}, 6) AS corner_lat,
       round({G.tile_corner_lon_sql("tile_x", ZOOM)}, 6) AS corner_lon
FROM keyed
ORDER BY c_custkey
"""


@query(
    "fn_geo_bingtile",
    oracle=_bingtile_sql("duck"),
    doc="Bing tile algebra at zoom 12: bing_tile_at (lat/lon -> tile x/y, "
    "BingTileFunctions.java:154), bing_tile_quadkey (base-4 interleave), "
    "quadkey decode round-trip, and the tile's upper-left corner "
    "(tileXYToLatitudeLongitude, :580). All unrolled codegen arithmetic — "
    "no UDF.",
    tags=("geo",),
)
def fn_geo_bingtile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _bingtile_sql("spark"), ("customer",))


def _bbox_join_sql(dialect: str) -> str:
    # Zone covering cells: the 4 corner cells of the rectangle, deduplicated.
    ids = [
        _cell_id(_cell_x(x), _cell_x(y))
        for x in ("xmin", "xmax")
        for y in ("ymin", "ymax")
    ]
    if dialect == "spark":
        cells = f"SELECT zone_id, xmin, xmax, ymin, ymax, explode(array_distinct(array({', '.join(ids)}))) AS cell_id FROM rects"
    else:
        cells = f"SELECT zone_id, xmin, xmax, ymin, ymax, unnest(list_distinct([{', '.join(ids)}])) AS cell_id FROM rects"
    return f"""
WITH pts AS ({_POINTS}),
zones AS ({_ZONES}),
rects AS (
    SELECT zone_id,
           cx - {ZONE_HALF_W} AS xmin, cx + {ZONE_HALF_W} AS xmax,
           cy - {ZONE_HALF_H} AS ymin, cy + {ZONE_HALF_H} AS ymax
    FROM zones
),
zone_cells AS ({cells}),
point_cells AS (
    SELECT c_custkey, lon, lat, {_cell_id(_cell_x("lon"), _cell_x("lat"))} AS cell_id
    FROM pts
),
contained AS (
    SELECT z.zone_id, p.c_custkey
    FROM zone_cells z JOIN point_cells p ON z.cell_id = p.cell_id
    WHERE p.lon > z.xmin AND p.lon < z.xmax
      AND p.lat > z.ymin AND p.lat < z.ymax
)
SELECT zone_id,
       count(*) AS n_points,
       CAST(sum(c_custkey) AS BIGINT) AS sum_custkey
FROM contained
GROUP BY zone_id
ORDER BY zone_id
"""


@query(
    "op_spatial_bbox_join",
    oracle=_bbox_join_sql("duck"),
    doc="SpatialJoinNode with the ST_Contains predicate "
    "(SpatialJoinNode.java:33, rectangle/point case): grid-blocked — zones "
    "explode to <= 4 covering 10-degree cells, points map to exactly one "
    "cell, candidates come from the cell equi-join, the exact strict-interior "
    "containment refines. Never all-pairs; a point joins each zone at most "
    "once (one cell per point, distinct cells per zone), so no dedup step.",
    tags=("geo",),
)
def op_spatial_bbox_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _bbox_join_sql("spark"), ("customer", "nation"))


_CITIES = (
    (1, 47.6062, -122.3321),  # Seattle
    (2, 40.7128, -74.0060),  # New York
    (3, 51.5074, -0.1278),  # London
    (4, -33.8688, 151.2093),  # Sydney
    (5, 35.6762, 139.6503),  # Tokyo
)


def _distance_join_sql(dialect: str) -> str:
    values = ", ".join(f"({i}, {la}, {lo})" for i, la, lo in _CITIES)
    if dialect == "spark":
        cities = f"SELECT * FROM VALUES {values} AS t(city_id, city_lat, city_lon)"
    else:
        cities = f"SELECT * FROM (VALUES {values}) t(city_id, city_lat, city_lon)"
    # 3x3 neighborhood of the city's cell covers the 500 km radius up to
    # |lat| ~ 76 deg (lon span = R / (111.32 * cos(lat)) plus the point's own
    # cell quantization stays under CELL_DEG on each side).
    offsets = [
        _cell_id(f"{_cell_x('city_lon')} + {dx}", f"{_cell_x('city_lat')} + {dy}")
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    ]
    if dialect == "spark":
        cells = f"SELECT city_id, city_lat, city_lon, explode(array({', '.join(offsets)})) AS cell_id FROM cities"
    else:
        cells = f"SELECT city_id, city_lat, city_lon, unnest([{', '.join(offsets)}]) AS cell_id FROM cities"
    gc = G.great_circle_sql("c.city_lat", "c.city_lon", "p.lat", "p.lon")
    return f"""
WITH cities AS ({cities}),
city_cells AS ({cells}),
pts AS ({_POINTS}),
point_cells AS (
    SELECT c_custkey, lon, lat, {_cell_id(_cell_x("lon"), _cell_x("lat"))} AS cell_id
    FROM pts
),
within AS (
    SELECT c.city_id, p.c_custkey, {gc} AS gc_km
    FROM city_cells c JOIN point_cells p ON c.cell_id = p.cell_id
    WHERE {gc} <= {CITY_RADIUS_KM}
)
SELECT city_id,
       count(*) AS n_within,
       CAST(sum(c_custkey) AS BIGINT) AS sum_custkey,
       round(min(gc_km), 3) AS nearest_km
FROM within
GROUP BY city_id
ORDER BY city_id
"""


@query(
    "op_spatial_distance_join",
    oracle=_distance_join_sql("duck"),
    doc="SpatialJoinNode with the ST_Distance-within predicate "
    "(SpatialJoinNode.java:33, distance case; bing_tiles_around's radius "
    "cover, BingTileFunctions.java:169): each probe enumerates its 3x3 cell "
    "neighborhood, candidates come from the cell equi-join, the exact "
    "great-circle distance refines. The probe side scales to any count — "
    "the join key is the cell, never a cross product.",
    tags=("geo",),
)
def op_spatial_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _distance_join_sql("spark"), ("customer",))
