"""Geo search and grid aggregation (X96 — the ES geo query family).

Elasticsearch ships four geo primitives a crawl/logs corpus with point
coordinates leans on: ``geo_distance`` query (radius filter),
``geo_distance`` sort (nearest-first), ``geo_bounding_box`` query, and
the ``geohash_grid`` / ``geotile_grid`` bucket aggs (map heat tiles).
This module is that family over plain lat/lon double columns.

Spark-first shape — every predicate and the distance itself are
whole-stage-codegen JVM expressions (radians/sin/cos/asin/sqrt), so:

* the bounding box pushes straight to the parquet scan as two range
  predicates (row-group min/max stats prune spatially IF the table is
  laid out by location — write with ``write_sorted_table`` (X92) on a
  grid key to get that layout);
* ``geo_distance_search`` wraps the haversine in a CHEAP bounding-box
  prefilter (the standard index trick: a radius circle sits inside the
  lat/lon box it inscribes, with longitude widened by cos(lat) and
  antimeridian/pole guards) so the transcendental math runs only on
  box survivors and the scan still prunes on the box;
* the grid agg is one partial-aggregated groupBy on integer cell keys
  computed with floor arithmetic — no shuffle beyond the single rollup
  exchange.

Numeric contract: distances are haversine on the WGS84 mean radius
6371.0088 km, rounded to 1e-6 km (1 mm) so last-ulp libm differences
between engines can never flip a hash; grid keys are exact integer
floor arithmetic (no transcendentals near cell boundaries — geotile's
Mercator ln/tan would let a boundary point land in different tiles on
different libms, which is why the grid here subdivides lat/lon
linearly, the geohash model). Geohash STRING encoding (base32) is
provided for presentation and pinned against published golden values in
tests; relations the driver hashes use the integer keys.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: WGS84 mean earth radius, km (the value Lucene's haversin uses).
EARTH_RADIUS_KM = 6371.0088

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km between two (lat, lon) Column pairs
    (degrees) — one codegen'd expression tree, no UDF."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1) / 2.0
    dl = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dp) * F.sin(dp)
        + F.cos(p1) * F.cos(p2) * F.sin(dl) * F.sin(dl)
    )
    # clamp: rounding can push a antipodal-ish a infinitesimally over 1
    a = F.least(a, F.lit(1.0))
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_bounding_box(
    df: DataFrame, lat_min: float, lat_max: float,
    lon_min: float, lon_max: float,
    lat_col: str = "lat", lon_col: str = "lon",
) -> DataFrame:
    """ES ``geo_bounding_box``: rows inside the box (edges inclusive,
    the ES contract). Two range predicates — pushes to the scan.
    Boxes crossing the antimeridian (lon_min > lon_max) wrap, per ES."""
    lat = F.col(lat_col).between(lat_min, lat_max)
    lon = (
        F.col(lon_col).between(lon_min, lon_max)
        if lon_min <= lon_max
        else (F.col(lon_col) >= lon_min) | (F.col(lon_col) <= lon_max)
    )
    return df.filter(lat & lon)


def geo_distance_search(
    df: DataFrame, center_lat: float, center_lon: float,
    radius_km: float, k: int | None = None,
    lat_col: str = "lat", lon_col: str = "lon", id_col: str = "event_id",
) -> DataFrame:
    """ES ``geo_distance`` query + sort: rows within ``radius_km`` of
    the center, nearest first (ties on id asc), distance_km attached
    (rounded to 1 mm). ``k`` truncates (TakeOrdered — no full sort).

    The haversine only runs on survivors of the inscribing lat/lon box
    (radius → Δlat = r/R rad; Δlon = Δlat / cos(|lat|+Δlat), unbounded
    when the cap touches a pole), so the scan prunes on two simple
    range predicates and the trig stays off the cold rows."""
    if radius_km <= 0:
        raise ValueError(f"radius_km must be > 0: {radius_km}")
    dlat = math.degrees(radius_km / EARTH_RADIUS_KM)
    # widest latitude the cap reaches decides the longitude span
    edge = min(abs(center_lat) + dlat, 89.9999)
    cap_hits_pole = abs(center_lat) + dlat >= 90.0
    boxed = df.filter(
        F.col(lat_col).between(center_lat - dlat, center_lat + dlat))
    if not cap_hits_pole:
        dlon = dlat / math.cos(math.radians(edge))
        if dlon < 180.0:
            lo, hi = center_lon - dlon, center_lon + dlon
            if lo >= -180.0 and hi <= 180.0:
                boxed = boxed.filter(F.col(lon_col).between(lo, hi))
            else:  # antimeridian wrap
                boxed = boxed.filter(
                    (F.col(lon_col) >= ((lo + 540.0) % 360.0 - 180.0))
                    | (F.col(lon_col) <= ((hi + 540.0) % 360.0 - 180.0)))
    out = (
        boxed.withColumn(
            "distance_km",
            F.round(haversine_km(
                F.lit(float(center_lat)), F.lit(float(center_lon)),
                F.col(lat_col), F.col(lon_col)), 6))
        .filter(F.col("distance_km") <= radius_km)
        .orderBy(F.col("distance_km").asc(), F.col(id_col).asc())
    )
    return out.limit(k) if k is not None else out


def grid_cells(
    lat, lon, cells_per_axis: int,
):
    """Integer grid keys (cell_x from lon, cell_y from lat) on a linear
    lat/lon subdivision — the geohash cell model with exact floor
    arithmetic. Returns (cell_x, cell_y) Columns; the edge lat=90 /
    lon=180 clamps into the last cell (closed upper edge)."""
    n = F.lit(int(cells_per_axis))
    cx = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * n),
        n - 1).cast("bigint")
    cy = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * n),
        n - 1).cast("bigint")
    return cx, cy


def geo_grid_agg(
    df: DataFrame, cells_per_axis: int = 32,
    lat_col: str = "lat", lon_col: str = "lon",
    value_col: str | None = None, top: int | None = None,
) -> DataFrame:
    """ES ``geohash_grid``-style bucket agg on the integer grid:
    (cell_x, cell_y, n_points[, sum_value], centroid_lat, centroid_lon)
    — the centroid is ES's ``geo_centroid`` sub-agg (plain coordinate
    mean, 1e-6 rounded). Ordered by count desc (ES returns densest
    cells first), ties on (cell_x, cell_y); ``top`` truncates. One
    partial-aggregated exchange keyed on the two small ints."""
    if cells_per_axis < 1:
        raise ValueError(f"cells_per_axis must be >= 1: {cells_per_axis}")
    cx, cy = grid_cells(F.col(lat_col), F.col(lon_col), cells_per_axis)
    aggs = [
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.avg(lat_col), 6).alias("centroid_lat"),
        F.round(F.avg(lon_col), 6).alias("centroid_lon"),
    ]
    if value_col:
        aggs.insert(1, F.round(F.sum(value_col), 6).alias("sum_value"))
    out = (
        df.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
        .groupBy(cx.alias("cell_x"), cy.alias("cell_y"))
        .agg(*aggs)
        .orderBy(F.col("n_points").desc(), F.col("cell_x").asc(),
                 F.col("cell_y").asc())
    )
    return out.limit(top) if top is not None else out


def geohash_encode(lat: float, lon: float, precision: int = 5) -> str:
    """Classic base32 geohash of a point (driver-side presentation
    helper for grid keys; pinned against published goldens in tests).
    Equivalent closed form of the interleaved binary subdivision:
    lon contributes ceil(5p/2) bits, lat floor(5p/2)."""
    if not (1 <= precision <= 12):
        raise ValueError(f"precision must be in [1, 12]: {precision}")
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    ix = min(int((lon + 180.0) / 360.0 * (1 << lon_bits)),
             (1 << lon_bits) - 1)
    iy = min(int((lat + 90.0) / 180.0 * (1 << lat_bits)),
             (1 << lat_bits) - 1)
    bits = []
    for i in range(nbits):
        if i % 2 == 0:  # even positions (0-based) take longitude bits
            lon_bits -= 1
            bits.append((ix >> lon_bits) & 1)
        else:
            lat_bits -= 1
            bits.append((iy >> lat_bits) & 1)
    return "".join(
        _BASE32[
            (bits[j] << 4) | (bits[j + 1] << 3) | (bits[j + 2] << 2)
            | (bits[j + 3] << 1) | bits[j + 4]
        ]
        for j in range(0, nbits, 5)
    )


def geo_bounds(
    df: DataFrame, lat_col: str = "lat", lon_col: str = "lon"
) -> DataFrame:
    """ES ``geo_bounds`` agg: the tight bounding box of the point set —
    one row ``(top_left_lat, top_left_lon, bottom_right_lat,
    bottom_right_lon)`` (ES corner convention: top-left = max lat / min
    lon). Exact min/max, one partial aggregation; NULL coordinates
    excluded. Antimeridian-crossing minimal boxes are out of contract
    (ES's own default is the same naive min/max unless ``wrap_longitude``
    — the wrapped variant needs a gap-scan over sorted longitudes)."""
    return (
        df.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
        .agg(
            F.max(lat_col).alias("top_left_lat"),
            F.min(lon_col).alias("top_left_lon"),
            F.min(lat_col).alias("bottom_right_lat"),
            F.max(lon_col).alias("bottom_right_lon"),
        )
    )


def geo_centroid(
    df: DataFrame, lat_col: str = "lat", lon_col: str = "lon"
) -> DataFrame:
    """ES ``geo_centroid`` agg: one row ``(lat, lon, count)`` — the
    arithmetic mean of latitudes and longitudes (round 6). Pinned to
    the plain degree-space mean (ES accumulates on its internal integer
    grid encoding, which only matters at the ~1e-7 degree quantization
    level); point sets straddling the antimeridian average naively,
    per the same contract note as ``geo_bounds``."""
    return (
        df.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
        .agg(
            F.round(F.avg(lat_col), 6).alias("lat"),
            F.round(F.avg(lon_col), 6).alias("lon"),
            F.count(F.lit(1)).alias("count"),
        )
    )
