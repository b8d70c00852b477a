"""Geo operators (X96, operators/geo.py): haversine goldens, radius
search ≡ python brute force (incl. pole / antimeridian box guards),
bounding box wrap, grid agg recompute + edge clamp, geohash goldens."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.geo import (
    EARTH_RADIUS_KM,
    geo_bounding_box,
    geo_distance_search,
    geo_grid_agg,
    geohash_encode,
    haversine_km,
)


def _hav(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    a = (math.sin(math.radians(lat2 - lat1) / 2) ** 2
         + math.cos(p1) * math.cos(p2)
         * math.sin(math.radians(lon2 - lon1) / 2) ** 2)
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(min(a, 1.0)))


@pytest.fixture(scope="module")
def points(spark):
    rng = np.random.default_rng(96)
    n = 4000
    rows = [
        (int(i), float(lat), float(lon), float(v))
        for i, (lat, lon, v) in enumerate(zip(
            rng.uniform(-90, 90, n), rng.uniform(-180, 180, n),
            rng.uniform(0, 10, n)))
    ]
    # pin exact edge + pole + antimeridian rows
    rows += [(n, 90.0, 180.0, 1.0), (n + 1, -90.0, -180.0, 1.0),
             (n + 2, 89.5, 0.0, 1.0), (n + 3, 0.0, 179.9, 1.0)]
    df = spark.createDataFrame(
        rows, "event_id bigint, lat double, lon double, value double")
    df.cache().count()
    return df, rows


def test_haversine_goldens(spark):
    df = spark.range(1).select(
        haversine_km(F.lit(48.8566), F.lit(2.3522),
                     F.lit(51.5074), F.lit(-0.1278)).alias("paris_london"),
        haversine_km(F.lit(0.0), F.lit(0.0),
                     F.lit(0.0), F.lit(180.0)).alias("half_circumference"),
        haversine_km(F.lit(10.0), F.lit(20.0),
                     F.lit(10.0), F.lit(20.0)).alias("zero"),
    ).first()
    assert df["paris_london"] == pytest.approx(343.5, abs=1.0)
    assert df["half_circumference"] == pytest.approx(
        math.pi * EARTH_RADIUS_KM, rel=1e-9)
    assert df["zero"] == 0.0


@pytest.mark.parametrize("center,radius", [
    ((48.8566, 2.3522), 1500.0),   # mid-latitude
    ((88.0, 10.0), 500.0),         # cap over the pole
    ((0.0, 179.5), 300.0),         # antimeridian wrap
    ((-89.0, 0.0), 2000.0),        # south pole cap
])
def test_geo_distance_search_matches_python(points, center, radius):
    df, rows = points
    got = geo_distance_search(df, center[0], center[1], radius).collect()
    exp = sorted(
        ((i, round(_hav(center[0], center[1], la, lo), 6))
         for i, la, lo, _ in rows
         if round(_hav(center[0], center[1], la, lo), 6) <= radius),
        key=lambda t: (t[1], t[0]))
    assert [(r["event_id"], r["distance_km"]) for r in got] == exp
    assert len(exp) > 0  # the fixture must actually exercise each case


def test_geo_distance_k_truncates(points):
    df, _ = points
    full = geo_distance_search(df, 10.0, 10.0, 3000.0).collect()
    top5 = geo_distance_search(df, 10.0, 10.0, 3000.0, k=5).collect()
    assert [r["event_id"] for r in top5] == \
           [r["event_id"] for r in full[:5]]
    with pytest.raises(ValueError, match="radius_km"):
        geo_distance_search(df, 0.0, 0.0, 0.0)


def test_bounding_box_and_wrap(points):
    df, rows = points
    got = {r["event_id"] for r in
           geo_bounding_box(df, -10.0, 10.0, 170.0, -170.0).collect()}
    exp = {i for i, la, lo, _ in rows
           if -10.0 <= la <= 10.0 and (lo >= 170.0 or lo <= -170.0)}
    assert got == exp and len(exp) > 0
    plain = {r["event_id"] for r in
             geo_bounding_box(df, 0.0, 45.0, -20.0, 20.0).collect()}
    assert plain == {i for i, la, lo, _ in rows
                     if 0.0 <= la <= 45.0 and -20.0 <= lo <= 20.0}


def test_grid_agg_matches_python(points):
    df, rows = points
    n = 16
    cells = {}
    for i, la, lo, v in rows:
        cx = min(int(math.floor((lo + 180.0) / 360.0 * n)), n - 1)
        cy = min(int(math.floor((la + 90.0) / 180.0 * n)), n - 1)
        cells.setdefault((cx, cy), []).append((la, lo, v))
    got = geo_grid_agg(df, n, value_col="value").collect()
    assert len(got) == len(cells)
    counts = [r["n_points"] for r in got]
    assert counts == sorted(counts, reverse=True)
    for r in got[:25]:
        pts = cells[(r["cell_x"], r["cell_y"])]
        assert r["n_points"] == len(pts)
        assert r["sum_value"] == pytest.approx(
            round(sum(v for _, _, v in pts), 6), abs=1e-6)
        assert r["centroid_lat"] == pytest.approx(
            round(sum(la for la, _, _ in pts) / len(pts), 6), abs=1e-6)
    # closed upper edge: lat=90 / lon=180 land in the last cell
    edge = [r for r in got
            if r["cell_x"] == n - 1 and r["cell_y"] == n - 1]
    assert edge and edge[0]["n_points"] == len(cells[(n - 1, n - 1)])
    with pytest.raises(ValueError, match="cells_per_axis"):
        geo_grid_agg(df, 0)


def test_geohash_published_goldens():
    # canonical examples from the geohash literature
    assert geohash_encode(42.605, -5.603, 5) == "ezs42"
    assert geohash_encode(57.64911, 10.40744, 11) == "u4pruydqqvj"
    assert geohash_encode(0.0, 0.0, 1) == "s"
    assert geohash_encode(90.0, 180.0, 3) == "zzz"
    assert geohash_encode(-90.0, -180.0, 3) == "000"
    with pytest.raises(ValueError, match="precision"):
        geohash_encode(0.0, 0.0, 0)


def test_geo_bounds_and_centroid_hand_computed(spark):
    from mahout_spark.operators.geo import geo_bounds, geo_centroid

    pts = spark.createDataFrame(
        [(1, 10.0, -5.0), (2, -3.0, 7.5), (3, 4.0, 0.0),
         (4, None, 1.0), (5, 2.0, None)],
        "id long, lat double, lon double")
    b = geo_bounds(pts).first()
    assert (b["top_left_lat"], b["top_left_lon"]) == (10.0, -5.0)
    assert (b["bottom_right_lat"], b["bottom_right_lon"]) == (-3.0, 7.5)
    c = geo_centroid(pts).first()
    assert c["count"] == 3  # NULL coordinates excluded
    assert c["lat"] == round((10.0 - 3.0 + 4.0) / 3, 6)
    assert c["lon"] == round((-5.0 + 7.5 + 0.0) / 3, 6)
