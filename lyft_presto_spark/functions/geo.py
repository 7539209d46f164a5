"""Planar geospatial core: ST_* point/envelope math + Bing tiles.

The reference ships 68 ``ST_*`` scalars plus Bing tile functions
(presto-geospatial/.../GeoFunctions.java, BingTileFunctions.java) backed by
the Esri geometry library. Full geometry (polygons, buffers, unions) is
Sedona territory and stays out of scope (SURVEY.md §2.6); this module
implements the dependency-free planar subset — points, envelopes, distances,
and the Bing tile quadkey algebra — as pure Spark codegen expressions, the
shapes a 100 TB pipeline actually joins and filters on.

Surface (reference parity targets):
- ``st_point/st_x/st_y``          — GeoFunctions.java stPoint/stX/stY
- ``st_distance``                 — planar point distance (stDistance, point case)
- ``st_contains_envelope``        — stContains for an envelope vs a point
  (point-on-boundary is NOT contained, matching the OGC interior rule the
  reference implements)
- ``great_circle_distance``       — BingTileFunctions.java:705 (same
  atan2 form, EARTH_RADIUS_KM = 6371.01)
- ``bing_tile_at/bing_tile_quadkey/bing_tile_from_quadkey/
  bing_tile_corner`` — BingTileFunctions.java:86-169,580-640 (map size
  256·2^zoom, pixel truncation, base-4 quadkey interleave)

Every function also has a dual-dialect SQL generator (``*_sql``) so registry
queries can run the identical arithmetic on Spark and the DuckDB oracle —
the same discipline as operators/similarity.py. Zoom is a Python int: the
quadkey interleave unrolls into ``zoom`` codegen-friendly terms instead of a
per-row loop UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.01  # BingTileFunctions.java:70
TILE_PIXELS = 256
MAX_ZOOM = 23


# --- Column API (Spark-side engine surface) ---------------------------------


def st_point(x: Column, y: Column) -> Column:
    """Point as a struct<x,y> (GeometryType's point case, GeoFunctions.java stPoint)."""
    return F.struct(x.cast("double").alias("x"), y.cast("double").alias("y"))


def st_x(p: Column) -> Column:
    return p["x"]


def st_y(p: Column) -> Column:
    return p["y"]


def st_distance(p1: Column, p2: Column) -> Column:
    """Planar euclidean distance between two points (stDistance, point-point)."""
    dx = p1["x"] - p2["x"]
    dy = p1["y"] - p2["y"]
    return F.sqrt(dx * dx + dy * dy)


def st_envelope(xmin: Column, ymin: Column, xmax: Column, ymax: Column) -> Column:
    """Axis-aligned rectangle as struct (the stEnvelope result shape)."""
    return F.struct(
        xmin.cast("double").alias("xmin"),
        ymin.cast("double").alias("ymin"),
        xmax.cast("double").alias("xmax"),
        ymax.cast("double").alias("ymax"),
    )


def st_contains_envelope(env: Column, p: Column) -> Column:
    """stContains(envelope, point): strict interior containment.

    OGC contains requires the point to intersect the *interior*, so a point
    on the rectangle boundary is NOT contained (GeoFunctions.java stContains
    via Esri's OperatorContains).
    """
    return (
        (p["x"] > env["xmin"])
        & (p["x"] < env["xmax"])
        & (p["y"] > env["ymin"])
        & (p["y"] < env["ymax"])
    )


def great_circle_distance(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (BingTileFunctions.java:705 atan2 form)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlon = F.radians(lon1) - F.radians(lon2)
    t1 = F.cos(rlat2) * F.sin(dlon)
    t2 = F.cos(rlat1) * F.sin(rlat2) - F.sin(rlat1) * F.cos(rlat2) * F.cos(dlon)
    t3 = F.sin(rlat1) * F.sin(rlat2) + F.cos(rlat1) * F.cos(rlat2) * F.cos(dlon)
    return F.atan2(F.sqrt(t1 * t1 + t2 * t2), t3) * F.lit(EARTH_RADIUS_KM)


def _axis_to_tile(axis: Column, map_size: int) -> Column:
    # (int) clip(axis * mapSize, 0, mapSize - 1) / TILE_PIXELS — Java's (int)
    # truncates; values are non-negative so floor == truncation.
    px = F.floor(F.least(F.greatest(axis * F.lit(float(map_size)), F.lit(0.0)), F.lit(float(map_size - 1))))
    return (px / TILE_PIXELS).cast("long")


def bing_tile_at(lat: Column, lon: Column, zoom: int) -> Column:
    """Tile struct<x,y,zoom> containing the point (bing_tile_at, BingTileFunctions.java:154)."""
    if not 0 < zoom <= MAX_ZOOM:
        raise ValueError(f"Zoom level must be in (0, {MAX_ZOOM}]: {zoom}")
    map_size = TILE_PIXELS << zoom
    x_axis = (lon + F.lit(180.0)) / F.lit(360.0)
    sin_lat = F.sin(F.radians(lat))
    y_axis = F.lit(0.5) - F.log((F.lit(1.0) + sin_lat) / (F.lit(1.0) - sin_lat)) / F.lit(
        4 * 3.141592653589793
    )
    return F.struct(
        _axis_to_tile(x_axis, map_size).alias("x"),
        _axis_to_tile(y_axis, map_size).alias("y"),
        F.lit(zoom).cast("int").alias("zoom"),
    )


def bing_tile_quadkey(tile: Column, zoom: int) -> Column:
    """Base-4 quadkey string of a tile (bing_tile_quadkey; BingTile.java toQuadKey)."""
    digits = []
    for i in range(zoom, 0, -1):  # most-significant bit first
        mask = 1 << (i - 1)
        digit = (
            F.when((tile["y"].bitwiseAND(F.lit(mask))) != 0, 2).otherwise(0)
            + F.when((tile["x"].bitwiseAND(F.lit(mask))) != 0, 1).otherwise(0)
        )
        digits.append(digit.cast("string"))
    return F.concat(*digits)


def bing_tile_from_quadkey(qk: Column, zoom: int) -> Column:
    """Decode a quadkey back to struct<x,y,zoom> (bing_tile(quadkey) overload)."""
    x = F.lit(0).cast("long")
    y = F.lit(0).cast("long")
    for i in range(1, zoom + 1):
        digit = F.substring(qk, i, 1).cast("long")
        weight = 1 << (zoom - i)
        x = x + (digit % 2) * weight
        y = y + (digit.cast("long") / F.lit(2)).cast("long") * weight
    return F.struct(x.alias("x"), y.alias("y"), F.lit(zoom).cast("int").alias("zoom"))


def bing_tile_corner(tile: Column, zoom: int) -> Column:
    """Upper-left corner lat/lon of a tile (tileXYToLatitudeLongitude, :580)."""
    map_size = TILE_PIXELS << zoom
    x_axis = F.least(
        F.greatest(tile["x"] * F.lit(float(TILE_PIXELS)), F.lit(0.0)), F.lit(float(map_size))
    ) / F.lit(float(map_size)) - F.lit(0.5)
    y_axis = F.lit(0.5) - F.least(
        F.greatest(tile["y"] * F.lit(float(TILE_PIXELS)), F.lit(0.0)), F.lit(float(map_size))
    ) / F.lit(float(map_size))
    pi = 3.141592653589793
    lat = F.lit(90.0) - F.lit(360.0) * F.atan(F.exp(-y_axis * F.lit(2 * pi))) / F.lit(pi)
    lon = F.lit(360.0) * x_axis
    return F.struct(lat.alias("lat"), lon.alias("lon"))


def bing_tiles_around(lat: Column, lon: Column, zoom: int) -> Column:
    """The 3x3 tile neighborhood of the point, clipped at map edges — the
    candidate cover for radius probes (bing_tiles_around,
    BingTileFunctions.java:169). Element order matches the reference's
    x-major iteration; no antimeridian wrap (same as the reference's 3x3
    overload)."""
    t = bing_tile_at(lat, lon, zoom)
    max_idx = (1 << zoom) - 1
    tiles = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            tiles.append(
                F.struct(
                    (t["x"] + dx).alias("x"),
                    (t["y"] + dy).alias("y"),
                    F.lit(zoom).cast("int").alias("zoom"),
                )
            )
    return F.filter(
        F.array(*tiles),
        lambda s: (s["x"] >= 0) & (s["x"] <= max_idx) & (s["y"] >= 0) & (s["y"] <= max_idx),
    )


def st_point_from_wkt(wkt: Column) -> Column:
    """Parse ``POINT (x y)`` well-known text into a point struct
    (stGeometryFromText/stPoint round-trip, the point case of
    GeoFunctions.java stGeometryFromText). Non-point WKT yields NULL coords
    (full WKT is the Esri surface — out of scope)."""
    num = r"(-?[0-9]+(?:\.[0-9]+)?(?:[eE][-+]?[0-9]+)?)"
    pat = r"^\s*POINT\s*\(\s*" + num + r"\s+" + num + r"\s*\)\s*$"
    x = F.regexp_extract(wkt, pat, 1)
    y = F.regexp_extract(wkt, pat, 2)
    return F.struct(
        F.when(x != "", x.cast("double")).alias("x"),
        F.when(y != "", y.cast("double")).alias("y"),
    )


def st_as_text(p: Column) -> Column:
    """Render a point struct as WKT (stAsText, point case). Note: double
    formatting follows Spark's cast-to-string (``60.0``), where the
    reference's Esri writer trims integral doubles (``60``)."""
    return F.concat(
        F.lit("POINT ("), p["x"].cast("string"), F.lit(" "), p["y"].cast("string"), F.lit(")")
    )


# --- dual-dialect SQL generators (oracle parity) ----------------------------


def idiv_sql(a: str, b: int, dialect: str) -> str:
    """Integer division: Spark ``div``, DuckDB ``//`` (both truncate toward zero
    for non-negative operands, which is all the tile math produces)."""
    return f"({a} div {b})" if dialect == "spark" else f"({a} // {b})"


def great_circle_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Great-circle km; identical spelling works in Spark SQL and DuckDB."""
    return (
        f"(atan2(sqrt(pow(cos(radians({lat2})) * sin(radians({lon1}) - radians({lon2})), 2)"
        f" + pow(cos(radians({lat1})) * sin(radians({lat2}))"
        f" - sin(radians({lat1})) * cos(radians({lat2})) * cos(radians({lon1}) - radians({lon2})), 2)),"
        f" sin(radians({lat1})) * sin(radians({lat2}))"
        f" + cos(radians({lat1})) * cos(radians({lat2})) * cos(radians({lon1}) - radians({lon2})))"
        f" * {EARTH_RADIUS_KM})"
    )


def bing_tile_x_sql(lon: str, zoom: int, dialect: str) -> str:
    # Integer-divide the pixel AFTER casting: CAST(double AS BIGINT) rounds
    # in DuckDB but truncates in Spark, so `floor(px)/256` cast as one double
    # expression silently disagrees between engines at half-tile fractions.
    map_size = TILE_PIXELS << zoom
    px = f"CAST(floor(least(greatest((({lon}) + 180e0) / 360e0 * {map_size}e0, 0e0), {map_size - 1}e0)) AS BIGINT)"
    return idiv_sql(px, TILE_PIXELS, dialect)


def bing_tile_y_sql(lat: str, zoom: int, dialect: str) -> str:
    map_size = TILE_PIXELS << zoom
    axis = f"(5e-1 - ln((1e0 + sin(radians({lat}))) / (1e0 - sin(radians({lat})))) / (4e0 * pi()))"
    px = f"CAST(floor(least(greatest({axis} * {map_size}e0, 0e0), {map_size - 1}e0)) AS BIGINT)"
    return idiv_sql(px, TILE_PIXELS, dialect)


def quadkey_sql(x: str, y: str, zoom: int, dialect: str) -> str:
    """Unrolled base-4 quadkey of integer tile coords (both dialects)."""
    parts = []
    for i in range(zoom, 0, -1):
        xb = f"({idiv_sql(x, 1 << (i - 1), dialect)} % 2)"
        yb = f"({idiv_sql(y, 1 << (i - 1), dialect)} % 2)"
        parts.append(f"CAST({yb} * 2 + {xb} AS VARCHAR)" if dialect == "duck" else f"CAST({yb} * 2 + {xb} AS STRING)")
    return "concat(" + ", ".join(parts) + ")"


def quadkey_decode_sql(qk: str, zoom: int, axis: str, dialect: str) -> str:
    """Unrolled decode of a quadkey column back to the x or y tile coordinate."""
    terms = []
    for i in range(1, zoom + 1):
        digit = f"CAST(substr({qk}, {i}, 1) AS BIGINT)"
        weight = 1 << (zoom - i)
        bit = f"({digit} % 2)" if axis == "x" else idiv_sql(digit, 2, dialect)
        terms.append(f"{bit} * {weight}")
    return "(" + " + ".join(terms) + ")"


def tile_corner_lat_sql(y: str, zoom: int) -> str:
    # e0 suffix: Spark parses plain decimal literals as DECIMAL, and an
    # all-integer-input pipeline would then run (and round) in decimal
    # arithmetic, diverging from DuckDB's double math; 2e0 etc. is DOUBLE in
    # both dialects.
    map_size = TILE_PIXELS << zoom
    y_axis = f"(5e-1 - least(greatest(({y}) * {TILE_PIXELS}e0, 0e0), {map_size}e0) / {map_size}e0)"
    return f"(90e0 - 360e0 * atan(exp(-{y_axis} * 2e0 * pi())) / pi())"


def tile_corner_lon_sql(x: str, zoom: int) -> str:
    map_size = TILE_PIXELS << zoom
    x_axis = f"(least(greatest(({x}) * {TILE_PIXELS}e0, 0e0), {map_size}e0) / {map_size}e0 - 5e-1)"
    return f"(360e0 * {x_axis})"
