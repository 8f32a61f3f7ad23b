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


def test_geohash_known_vectors(spark):
    """Canonical geohash test vectors [public: Niemeyer geohash examples] —
    and the prefix property (precision p is a prefix of precision p+1)."""
    from engine.geo import geohash_expr

    cases = [
        (57.64911, 10.40744, "u4pruy"),   # Jutland, the classic example
        (38.897, -77.036, "dqcjqc"),      # Washington DC
        (-33.86, 151.21, "r3gx2f"),       # Sydney
        (0.0, 0.0, "s00000"),
        (90.0, 180.0, "zzzzzz"),          # edge clamp
        (-90.0, -180.0, "000000"),
    ]
    df = spark.createDataFrame(
        [(la, lo) for la, lo, _ in cases], "lat double, lon double"
    )
    for p in (1, 3, 6):
        got = [
            r["g"]
            for r in df.select(
                geohash_expr(F.col("lat"), F.col("lon"), p).alias("g")
            ).collect()
        ]
        assert got == [w[:p] for _, _, w in cases], p


def test_geohash_validation():
    import pytest

    from engine.geo import geohash_expr

    with pytest.raises(ValueError, match="precision"):
        geohash_expr(F.lit(0.0), F.lit(0.0), 7)
