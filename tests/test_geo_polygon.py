"""geo_shape polygon containment (VERDICT r03 #8): crossing-number Column
arithmetic vs a pure-Python reference on known points, including a concave
polygon where bbox membership is NOT sufficient."""

from pyspark.sql import functions as F

from engine.geo import geo_polygon_search, polygon_contains

SQUARE = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
# concave "C" shape: the notch (lat 2..8, lon 4..10) is OUTSIDE
CONCAVE = [
    (0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (8.0, 10.0), (8.0, 4.0),
    (2.0, 4.0), (2.0, 10.0), (0.0, 10.0),
]


def _py_inside(lat, lon, poly):
    n, inside = len(poly), False
    for i in range(n):
        y1, x1 = poly[i]
        y2, x2 = poly[(i + 1) % n]
        if (y1 > lat) != (y2 > lat) and lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


def _spark_inside(spark, pts, poly):
    df = spark.createDataFrame(pts, "lat double, lon double")
    return [
        r["in"]
        for r in df.select(
            polygon_contains(F.col("lat"), F.col("lon"), poly).alias("in")
        ).collect()
    ]


def test_square(spark):
    pts = [(5.0, 5.0), (-1.0, 5.0), (5.0, 11.0), (9.5, 9.5), (0.5, 0.5)]
    assert _spark_inside(spark, pts, SQUARE) == [
        _py_inside(a, b, SQUARE) for a, b in pts
    ] == [True, False, False, True, True]


def test_concave_notch(spark):
    # (5, 7) is inside the square bbox but inside the NOTCH → outside
    pts = [(5.0, 7.0), (5.0, 2.0), (9.0, 7.0), (1.0, 7.0), (5.0, 3.9)]
    got = _spark_inside(spark, pts, CONCAVE)
    want = [_py_inside(a, b, CONCAVE) for a, b in pts]
    assert got == want == [False, True, True, True, True]


def test_grid_property(spark):
    pts = [(la + 0.5, lo + 0.5) for la in range(-2, 13) for lo in range(-2, 13)]
    assert _spark_inside(spark, pts, CONCAVE) == [
        _py_inside(a, b, CONCAVE) for a, b in pts
    ]


def test_search_returns_bbox_subset(spark, sf_dir):
    from engine.io import read_fixture

    ev = read_fixture(spark, sf_dir, "events")
    poly = [(10.0, -30.0), (40.0, -10.0), (55.0, 20.0), (25.0, 40.0), (0.0, 5.0)]
    rows = geo_polygon_search(ev, poly, k=50).collect()
    for r in rows:
        assert 0.0 <= r["lat"] <= 55.0 and -30.0 <= r["lon"] <= 40.0
        assert _py_inside(r["lat"], r["lon"], poly)


def test_degenerate_polygon_raises(spark):
    import pytest

    with pytest.raises(ValueError, match=">= 3"):
        polygon_contains(F.lit(0.0), F.lit(0.0), [(0.0, 0.0), (1.0, 1.0)])


def _ref_geohash(lat, lon, precision):
    """Independent reference: the classic bisection encoder [public:
    Niemeyer geohash algorithm description]."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
    bits, out, even = 0, "", True
    n = 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits = bits * 2 + 1
                lon_lo = mid
            else:
                bits = bits * 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits = bits * 2 + 1
                lat_lo = mid
            else:
                bits = bits * 2
                lat_hi = mid
        even = not even
        n += 1
        if n == 5:
            out += alphabet[bits]
            bits, n = 0, 0
    return out


def test_geohash_known_vectors(spark):
    """The classic published vector plus an independent bisection-encoder
    reference on spread-out points (incl. the ±90/±180 clamp edges)."""
    from engine.geo import geohash_expr

    pts = [
        (57.64911, 10.40744),  # 'u4pruy', the classic example
        (38.897, -77.036), (-33.86, 151.21), (0.0, 0.0),
        (89.9999, 179.9999), (-90.0, -180.0), (90.0, 180.0),
        (12.3456, -98.7654), (-45.5, 100.25),
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    assert (
        df.limit(1)
        .select(geohash_expr(F.col("lat"), F.col("lon"), 6).alias("g"))
        .collect()[0][0]
        == "u4pruy"
    )
    for p in (1, 3, 6):
        got = [
            r["g"]
            for r in df.select(
                geohash_expr(F.col("lat"), F.col("lon"), p).alias("g")
            ).collect()
        ]
        want = [
            _ref_geohash(min(la, 89.999999999), min(lo, 179.999999999), p)
            for la, lo in pts
        ]
        assert got == want, p


def test_geohash_validation():
    import pytest

    from engine.geo import geohash_expr

    with pytest.raises(ValueError, match="precision"):
        geohash_expr(F.lit(0.0), F.lit(0.0), 7)
