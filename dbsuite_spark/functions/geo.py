"""Geospatial battery (round 5 cont.): haversine distance and the
grid-binned radius join — the geo operator family a warehouse needs for
store/customer proximity analytics, built on deterministic fixture-derived
coordinates (integer modular arithmetic on the keys → identical doubles on
both engines).

Cross-engine exactness note: trig (sin/cos/asin) is the one scalar family
where Java's Math and C's libm may disagree in the final ulp, so every
emitted distance is rounded to 6 decimal places (≈ millimeter precision)
— the same discipline as ``agg_geometric_mean_log``'s 6dp-rounded ln. The
radius predicate compares the ROUNDED distance, so both engines keep or
drop identical pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.registry import query
from dbsuite_spark.tables import t

EARTH_KM = 6371.0
GEO_REF_LAT, GEO_REF_LON = 45.0, 90.0
RADIUS_KM = 50.0  # radius-join threshold
MAX_ABS_LAT = 60.0  # mid-latitude band: 1° lon ≥ 55.5 km → ±1-cell join


def _lat(key: Column, mult: int) -> Column:
    """Deterministic latitude in [-90, 90): exact integer modular walk."""
    return ((key * mult) % 1800).cast("double") / 10.0 - 90.0


def _lon(key: Column, mult: int) -> Column:
    return ((key * mult) % 3600).cast("double") / 10.0 - 180.0


def _LAT_SQL(key: str, mult: int) -> str:
    return f"CAST(({key} * {mult}) % 1800 AS DOUBLE) / 10.0 - 90.0"


def _LON_SQL(key: str, mult: int) -> str:
    return f"CAST(({key} * {mult}) % 3600 AS DOUBLE) / 10.0 - 180.0"


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance, 6dp-rounded (see module docstring)."""
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.sin(dlmb) * F.sin(dlmb)
    )
    return F.round(2 * F.lit(EARTH_KM) * F.asin(F.sqrt(a)), 6)


def _HAVERSINE_SQL(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"ROUND(2 * {EARTH_KM} * ASIN(SQRT("
        f"SIN(RADIANS(({lat2}) - ({lat1})) / 2)"
        f" * SIN(RADIANS(({lat2}) - ({lat1})) / 2)"
        f" + COS(RADIANS({lat1})) * COS(RADIANS({lat2}))"
        f" * SIN(RADIANS(({lon2}) - ({lon1})) / 2)"
        f" * SIN(RADIANS(({lon2}) - ({lon1})) / 2))), 6)"
    )


_GEO_BATTERY_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey,
         {_LAT_SQL('c_custkey', 7)} AS lat,
         {_LON_SQL('c_custkey', 13)} AS lon
  FROM customer)
SELECT c_custkey, lat, lon,
       {_HAVERSINE_SQL('lat', 'lon', str(GEO_REF_LAT), str(GEO_REF_LON))}
           AS dist_ref_km,
       CAST(FLOOR(lat) AS INT) AS cell_lat,
       CAST(FLOOR(lon) AS INT) AS cell_lon
FROM pts
"""


@query("fn_geo_haversine", oracle=_GEO_BATTERY_ORACLE, category="H")
def fn_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial scalar battery: deterministic per-customer coordinates,
    6dp-rounded haversine distance to a reference point, and the 1° grid
    cell ids the radius join bins on. Pure row-local expression work —
    whole-stage codegen, zero shuffle."""
    c = t(spark, sf_dir, "customer")
    lat = _lat(F.col("c_custkey"), 7)
    lon = _lon(F.col("c_custkey"), 13)
    return c.select(
        "c_custkey",
        lat.alias("lat"),
        lon.alias("lon"),
    ).select(
        "c_custkey",
        "lat",
        "lon",
        haversine_km(
            F.col("lat"), F.col("lon"),
            F.lit(GEO_REF_LAT), F.lit(GEO_REF_LON),
        ).alias("dist_ref_km"),
        F.floor("lat").cast("int").alias("cell_lat"),
        F.floor("lon").cast("int").alias("cell_lon"),
    )


_GEO_RADIUS_ORACLE = f"""
WITH cust AS (
  SELECT c_custkey,
         {_LAT_SQL('c_custkey', 7)} AS clat,
         {_LON_SQL('c_custkey', 13)} AS clon
  FROM customer),
supp AS (
  SELECT s_suppkey,
         {_LAT_SQL('s_suppkey', 17)} AS slat,
         {_LON_SQL('s_suppkey', 23)} AS slon
  FROM supplier),
cb AS (SELECT * FROM cust WHERE ABS(clat) <= {MAX_ABS_LAT}),
sb AS (SELECT * FROM supp WHERE ABS(slat) <= {MAX_ABS_LAT}),
hit AS (
  SELECT s_suppkey, c_custkey,
         {_HAVERSINE_SQL('slat', 'slon', 'clat', 'clon')} AS dist_km
  FROM sb CROSS JOIN cb)
SELECT s_suppkey, c_custkey, dist_km
FROM hit WHERE dist_km < {RADIUS_KM}
"""


@query("join_geo_radius_grid", oracle=_GEO_RADIUS_ORACLE, category="C")
def join_geo_radius_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join (customers within 50 km of a supplier) by 1° grid
    binning: each supplier explodes to its 3×3 neighbor cells, the join
    is a hash equi-join on cell id, and only cell-collided pairs pay the
    haversine — the geohash-bucketed pattern that keeps a geo join off
    the O(N·M) cross product at 100 TB (same family as
    ``join_range_binned``'s 1-D bins).

    Correctness of the banding: inside the |lat| ≤ 60° service band one
    cell is ≥ 55.5 km of longitude and 111 km of latitude, so every
    < 50 km pair differs by ≤1 cell in lat and ≤1 cell in lon MOD 360 —
    supplier cells wrap across the ±180° antimeridian (cell -181 → 179,
    180 → -180; the haversine itself is wrap-exact since sin²(Δλ/2) has
    period 360°), closing the seam gap ADVICE r05 flagged. The band
    bound stays part of the operator contract (polar data needs
    latitude-dependent cell widths). The oracle is genuinely UNBINNED —
    a pure haversine predicate over the banded cross product — so it
    independently verifies the grid rewrite instead of mirroring it.
    Distances are 6dp-rounded pre-predicate (module docstring), so both
    engines keep identical pairs.

    Scale: supplier side (dimension) fans out ×9 and broadcasts; the
    customer side is scanned once with its cell computed row-locally —
    no shuffle of the big side at all."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat(F.col("c_custkey"), 7).alias("clat"),
        _lon(F.col("c_custkey"), 13).alias("clon"),
    ).filter(F.abs(F.col("clat")) <= MAX_ABS_LAT)
    s = t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _lat(F.col("s_suppkey"), 17).alias("slat"),
        _lon(F.col("s_suppkey"), 23).alias("slon"),
    ).filter(F.abs(F.col("slat")) <= MAX_ABS_LAT)
    d = spark.range(-1, 2).select(F.col("id").cast("int").alias("d"))
    dl = d.select(F.col("d").alias("dlat"))
    dn = d.select(F.col("d").alias("dlon"))
    # lon cells wrap at the antimeridian: raw cell -181 → 179, 180 → -180
    # (customer cells are always in [-180, 179], so the wrapped supplier
    # cell is the one that collides). Lat never wraps inside the band.
    raw_lon = F.floor("slon").cast("int") + F.col("dlon")
    wrapped_lon = ((raw_lon + 180) % 360 + 360) % 360 - 180
    s9 = (
        s.crossJoin(F.broadcast(dl))
        .crossJoin(F.broadcast(dn))
        .select(
            "s_suppkey", "slat", "slon",
            (F.floor("slat").cast("int") + F.col("dlat")).alias("cell_lat"),
            wrapped_lon.alias("cell_lon"),
        )
    )
    cand = c.select(
        "c_custkey", "clat", "clon",
        F.floor("clat").cast("int").alias("cell_lat"),
        F.floor("clon").cast("int").alias("cell_lon"),
    ).join(F.broadcast(s9), ["cell_lat", "cell_lon"])
    dist = haversine_km(
        F.col("slat"), F.col("slon"), F.col("clat"), F.col("clon")
    )
    return (
        cand.select("s_suppkey", "c_custkey", dist.alias("dist_km"))
        .filter(F.col("dist_km") < RADIUS_KM)
    )
