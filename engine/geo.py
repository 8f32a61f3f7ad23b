"""Geo search operators (ES geo_distance query / geo sort / geotile_grid agg
[public: ES geo queries & aggregations docs]).

The driver fixtures carry no geographic columns, so the contract queries
derive deterministic synthetic coordinates from integer event columns with
pure arithmetic (same closed-form formula on the Spark and DuckDB sides) —
the operators under test are the distance predicate, the distance sort, and
the web-mercator tile bucketing, not the data source.

Everything is built-in expression arithmetic (JVM-side, whole-stage codegen):
haversine is sin/cos/asin over doubles; geotile is floor/ln/tan. No UDFs, no
shuffles beyond the final agg — at 100 TB a geo_distance filter is a scan
predicate and geotile_grid is a two-column hash aggregate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km between two (degree) coordinate pairs —
    the standard haversine [public formula]; all Column arithmetic."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def with_synthetic_coords(ev: DataFrame) -> DataFrame:
    """Deterministic lat/lon derived from (user_id, event_id) — documented
    fixture surrogate (no geo columns in the driver tables)."""
    return ev.withColumn(
        "lat", (F.col("user_id") % 179 - 89).cast("double") + F.lit(0.5)
    ).withColumn(
        "lon", (F.col("event_id") % 359 - 179).cast("double") + F.lit(0.5)
    )


# the same derivation as a DuckDB fragment (kept adjacent so they can't drift)
COORDS_SQL = (
    "CAST(user_id % 179 - 89 AS DOUBLE) + 0.5 AS lat, "
    "CAST(event_id % 359 - 179 AS DOUBLE) + 0.5 AS lon"
)


def geo_distance_search(
    ev: DataFrame, center_lat: float, center_lon: float, radius_km: float, k: int = 20
) -> DataFrame:
    """ES geo_distance query + geo-distance sort: events within radius_km of
    the center, nearest first. The distance expression is a scan predicate —
    with the table written bucketed/partitioned by a coarse geotile this
    prunes partitions; here it codegens into the scan filter."""
    with_d = with_synthetic_coords(ev).withColumn(
        "distance_km",
        F.round(haversine_km(F.col("lat"), F.col("lon"), F.lit(center_lat), F.lit(center_lon)), 4),
    )
    return (
        with_d.filter(F.col("distance_km") <= radius_km)
        .select("event_id", "lat", "lon", "distance_km")
        .orderBy(F.col("distance_km").asc(), F.col("event_id").asc())
        .limit(k)
    )


def polygon_contains(lat, lon, polygon: list[tuple[float, float]]):
    """Even-odd (ray-casting / crossing-number) point-in-polygon [public:
    classic computational-geometry algorithm; the test ES geo_shape uses for
    polygon containment]: cast a ray east from the point and count edge
    crossings — odd = inside. The polygon is a literal vertex list
    [(lat, lon), ...] (auto-closed), so the whole test unrolls into a fixed
    sum of per-edge WHEN expressions — pure whole-stage-codegen Column
    arithmetic, no UDF. Vertex count is query-sized (constant), so the cost
    is O(|V|) per row inside the scan."""
    if len(polygon) < 3:
        raise ValueError(f"polygon needs >= 3 vertices, got {len(polygon)}")
    crossings = F.lit(0)
    n = len(polygon)
    for i in range(n):
        y1, x1 = polygon[i]
        y2, x2 = polygon[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge can't cross a horizontal ray
        straddles = (F.lit(y1) > lat) != (F.lit(y2) > lat)
        x_at = (
            (F.lit(x2) - F.lit(x1)) * (lat - F.lit(y1))
            / (F.lit(y2) - F.lit(y1)) + F.lit(x1)
        )
        crossings = crossings + F.when(straddles & (lon < x_at), 1).otherwise(0)
    return crossings % 2 == F.lit(1)


def polygon_contains_sql(lat_expr: str, lon_expr: str,
                         polygon: list[tuple[float, float]]) -> str:
    """The SAME crossing-number test as a DuckDB SQL fragment, generated
    from the same vertex literals with the identical arithmetic shape so
    the two sides cannot drift (both are IEEE-double, same association
    order)."""
    parts = []
    n = len(polygon)
    for i in range(n):
        y1, x1 = polygon[i]
        y2, x2 = polygon[(i + 1) % n]
        if y1 == y2:
            continue
        parts.append(
            f"(CASE WHEN (({y1} > {lat_expr}) <> ({y2} > {lat_expr}))"
            f" AND {lon_expr} < ({x2} - {x1}) * ({lat_expr} - {y1})"
            f" / ({y2} - {y1}) + {x1} THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(parts) + ") % 2 = 1"


def geo_polygon_search(
    ev: DataFrame, polygon: list[tuple[float, float]], k: int = 20
) -> DataFrame:
    """ES geo_shape/geo_polygon query [public: ES geo_shape docs]: events
    whose point falls inside the polygon. The polygon's bounding box goes
    FIRST as a simple range predicate — that is what pushes to the parquet
    scan (and prunes partitions on a geo-partitioned table at 100 TB); the
    exact crossing-number test then runs only on bbox survivors."""
    lats = [p[0] for p in polygon]
    lons = [p[1] for p in polygon]
    pts = with_synthetic_coords(ev)
    bbox = (
        (F.col("lat") >= min(lats)) & (F.col("lat") <= max(lats))
        & (F.col("lon") >= min(lons)) & (F.col("lon") <= max(lons))
    )
    return (
        pts.filter(bbox)
        .filter(polygon_contains(F.col("lat"), F.col("lon"), polygon))
        .select("event_id", "lat", "lon")
        .orderBy("event_id")
        .limit(k)
    )


GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_expr(lat, lon, precision: int = 4):
    """Geohash cell id as a Column [public: Niemeyer geohash; ES
    geohash_grid agg]: quantize lon/lat to 2^b cells each (b = 5·precision/2
    bits, lon taking the extra bit when odd), interleave bits lon-first,
    and map each 5-bit group to the base-32 alphabet. Fixed precision means
    the whole encode unrolls to shifts/ands — pure whole-stage-codegen
    integer arithmetic, no UDF."""
    if not 1 <= precision <= 6:
        raise ValueError(f"precision must be 1..6, got {precision}")
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    # clamp BOTH bounds: without the GREATEST, lat < -90 / lon < -180 gives
    # a negative cell index → wrong interleaved bits and a non-positive
    # substr offset (ADVICE r04). ES rejects out-of-range points; clamping
    # to the edge cell is this engine's documented divergence.
    ix = F.greatest(
        F.least(
            F.floor((lon + 180.0) / 360.0 * (1 << nlon)).cast("long"),
            F.lit((1 << nlon) - 1),
        ),
        F.lit(0),
    )
    iy = F.greatest(
        F.least(
            F.floor((lat + 90.0) / 180.0 * (1 << nlat)).cast("long"),
            F.lit((1 << nlat) - 1),
        ),
        F.lit(0),
    )
    val = F.lit(0).cast("long")
    for i in range(nlon):  # lon bit i (from LSB) → interleaved position
        pos = nbits - 1 - 2 * (nlon - 1 - i)
        val = val + F.shiftright(ix, i).bitwiseAND(F.lit(1)) * F.lit(1 << pos)
    for i in range(nlat):
        pos = nbits - 2 - 2 * (nlat - 1 - i)
        val = val + F.shiftright(iy, i).bitwiseAND(F.lit(1)) * F.lit(1 << pos)
    chars = [
        F.substring(
            F.lit(GEOHASH_ALPHABET),
            (F.shiftright(val, 5 * (precision - 1 - c)).bitwiseAND(F.lit(31))
             + F.lit(1)).cast("int"),
            1,
        )
        for c in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql(lat_expr: str, lon_expr: str, precision: int = 4) -> str:
    """The SAME encode as a DuckDB fragment, generated from the same
    constants (identical quantize/interleave arithmetic)."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    ix = (f"GREATEST(LEAST(CAST(floor(({lon_expr} + 180.0) / 360.0 * "
          f"{1 << nlon}) AS BIGINT), {(1 << nlon) - 1}), 0)")
    iy = (f"GREATEST(LEAST(CAST(floor(({lat_expr} + 90.0) / 180.0 * "
          f"{1 << nlat}) AS BIGINT), {(1 << nlat) - 1}), 0)")
    parts = []
    for i in range(nlon):
        pos = nbits - 1 - 2 * (nlon - 1 - i)
        parts.append(f"((({ix}) >> {i}) & 1) * {1 << pos}")
    for i in range(nlat):
        pos = nbits - 2 - 2 * (nlat - 1 - i)
        parts.append(f"((({iy}) >> {i}) & 1) * {1 << pos}")
    val = "(" + " + ".join(parts) + ")"
    chars = [
        f"substr('{GEOHASH_ALPHABET}', "
        f"CAST((({val} >> {5 * (precision - 1 - c)}) & 31) + 1 AS INT), 1)"
        for c in range(precision)
    ]
    return " || ".join(chars)


def geohash_grid_agg(ev: DataFrame, precision: int = 3) -> DataFrame:
    """ES geohash_grid aggregation [public]: bucket points into geohash
    cells and count per cell — a two-column hash aggregate over the scan,
    the geohash twin of geotile_grid_agg."""
    pts = with_synthetic_coords(ev)
    return (
        pts.groupBy(
            geohash_expr(F.col("lat"), F.col("lon"), precision).alias("cell")
        )
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("cell").asc())
    )


MERCATOR_LAT_MAX = 85.0511287798  # web-mercator domain bound (atan(sinh(pi)))


def geotile_grid_agg(ev: DataFrame, zoom: int = 4) -> DataFrame:
    """ES geotile_grid aggregation: bucket points into web-mercator tiles
    `z/x/y` at a fixed zoom and count per tile. x/y are closed-form floor
    arithmetic over lon/lat — one hash aggregate, no UDF. Latitudes are
    clamped to the mercator domain (±85.0511°) the way every tile scheme
    does, so y always lands in [0, 2^zoom)."""
    n = float(1 << zoom)
    lon = F.col("lon")
    lat = F.greatest(
        F.lit(-MERCATOR_LAT_MAX), F.least(F.lit(MERCATOR_LAT_MAX), F.col("lat"))
    )
    x = F.floor((lon + 180.0) / 360.0 * n).cast("bigint")
    lat_rad = F.radians(lat)
    y = F.floor(
        (1.0 - F.log(F.tan(lat_rad) + 1.0 / F.cos(lat_rad)) / math.pi) / 2.0 * n
    ).cast("bigint")
    return (
        with_synthetic_coords(ev)
        .select(
            F.concat_ws(
                "/", F.lit(zoom).cast("string"), x.cast("string"), y.cast("string")
            ).alias("tile")
        )
        .groupBy("tile")
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("tile").asc())
        .limit(20)
    )


def geo_bounds_agg(ev: DataFrame, group_by: str = "event_type") -> DataFrame:
    """ES geo_bounds aggregation [public: ES geo_bounds docs]: the smallest
    lat/lon bounding box enclosing every point, per group — top_left =
    (max lat, min lon), bottom_right = (min lat, max lon). One hash
    aggregate over the coordinate columns; at 100 TB this is a map-side
    combining min/max, no different from any stats agg. (Dateline-crossing
    minimal boxes — ES wrap_longitude — need circular statistics the fixture
    can't express; pinned to the flat box, documented.)"""
    return (
        with_synthetic_coords(ev)
        .groupBy(group_by)
        .agg(
            F.max("lat").alias("top_lat"),
            F.min("lon").alias("left_lon"),
            F.min("lat").alias("bottom_lat"),
            F.max("lon").alias("right_lon"),
        )
        .orderBy(group_by)
    )


def geo_centroid_agg(ev: DataFrame, group_by: str = "event_type") -> DataFrame:
    """ES geo_centroid aggregation [public: ES geo_centroid docs]: the
    arithmetic mean location per group, plus the point count — ES's own
    definition is the running average over lat/lon (not the spherical
    centroid), so a plain avg matches it exactly. One hash aggregate."""
    return (
        with_synthetic_coords(ev)
        .groupBy(group_by)
        .agg(
            F.round(F.avg("lat"), 4).alias("centroid_lat"),
            F.round(F.avg("lon"), 4).alias("centroid_lon"),
            F.count("*").alias("doc_count"),
        )
        .orderBy(group_by)
    )


def geo_bounding_box_search(
    ev: DataFrame,
    top: float,
    left: float,
    bottom: float,
    right: float,
    k: int = 20,
) -> DataFrame:
    """ES geo_bounding_box query [public: ES geo_bounding_box docs]: points
    inside the (top_left, bottom_right) rectangle, filter context. Pure
    range predicates — at scale this pushes to the parquet scan (and under
    a geohash/tile partitioning prunes whole partitions), strictly cheaper
    than the haversine predicate. Flat lat/lon box, no dateline wrap —
    documented divergence, same policy as geo_bounds (E36)."""
    boxed = ev.filter(
        (F.col("lat") <= top)
        & (F.col("lat") >= bottom)
        & (F.col("lon") >= left)
        & (F.col("lon") <= right)
    )
    return (
        boxed.select("event_id", "lat", "lon")
        .orderBy("event_id")
        .limit(k)
    )


def geo_distance_rings_agg(
    ev: DataFrame,
    center_lat: float,
    center_lon: float,
    edges: list[float],
    value_col: str = "value",
) -> DataFrame:
    """ES geo_distance aggregation [public: ES geo_distance agg docs]:
    concentric distance rings around a pinned origin, one bucket per range
    (from inclusive, to exclusive) with doc_count and an avg sub-metric.
    Bucket keys use the ES "from-to" label form ("*-2000.0", "2000.0-*").
    One scan, one hash-agg; the haversine expression codegens into the scan
    — no UDF, no extra shuffle beyond the groupBy exchange."""
    if not edges or sorted(edges) != list(edges):
        raise ValueError("edges must be a non-empty ascending list")
    d = with_synthetic_coords(ev).withColumn(
        "_d",
        F.round(
            haversine_km(
                F.col("lat"), F.col("lon"), F.lit(center_lat), F.lit(center_lon)
            ),
            4,
        ),
    )
    ring = F.when(F.col("_d") < edges[0], F.lit(f"*-{edges[0]}"))
    for lo, hi in zip(edges, edges[1:]):
        ring = ring.when(F.col("_d") < hi, F.lit(f"{lo}-{hi}"))
    ring = ring.otherwise(F.lit(f"{edges[-1]}-*"))
    return (
        d.withColumn("ring", ring)
        .groupBy("ring")
        .agg(
            F.count("*").alias("doc_count"),
            F.round(F.avg(value_col), 4).alias("avg_value"),
        )
        .orderBy("ring")
    )


def geo_line_agg(
    ev: DataFrame,
    group_by: str = "user_id",
    size: int = 10,
) -> DataFrame:
    """ES geo_line aggregation [public: ES geo_line agg docs]: aggregate the
    points of each bucket into a LINESTRING ordered by a sort field,
    truncated to the first `size` points (ES caps at size, default 10k).
    ES emits GeoJSON; the pinned output here is the equivalent WKT-style
    string ("lon lat, lon lat, …") plus the ES-reported `complete` flag
    (false when the track was truncated).

    Scale shape: one hash aggregate on the bucket key — collect_list gathers
    only that key's points, array_sort orders them inside the row, and
    slice() caps the payload at `size` BEFORE stringification, so executor
    memory per group is O(points-per-key), never corpus-sized. All built-in
    expressions (no UDF, no window): the sort is per-row array_sort, not a
    global orderBy."""
    pts = with_synthetic_coords(ev)
    # struct sorts lexicographically by field order → (ts, event_id) gives
    # the deterministic ES sort-field order with a unique tiebreak
    gathered = pts.groupBy(group_by).agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "lon", "lat"))
        ).alias("pts")
    )
    head = F.slice(F.col("pts"), 1, size)
    line = F.concat_ws(
        ", ",
        F.transform(
            head,
            lambda p: F.concat_ws(
                " ",
                F.format_number(p["lon"], 1),
                F.format_number(p["lat"], 1),
            ),
        ),
    )
    return (
        gathered.select(
            F.col(group_by),
            F.size("pts").alias("n_points"),
            (F.size("pts") <= size).alias("complete"),
            line.alias("line"),
        )
        .orderBy(group_by)
    )
