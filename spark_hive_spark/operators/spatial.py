"""Distributed spatial joins — the banded (geohash-style) radius
join the haversine query's docstring promises as the at-scale path.

The all-pairs great-circle join (`geo_haversine_nearest_nation`,
operators/scalars.py) is fine for a 25-row dimension; a point TABLE
needs the standard spatial-join shape: assign every point to a fixed
lat/lon grid cell, explode one side to its 3×3 cell neighborhood,
equi-join on the cell key, and verify candidates with the exact
haversine predicate. Same architecture as every other candidate
generator in this engine (LSH bands, IVF cells, SNM windows, prefix
filters): a provably COMPLETE bucketing join + exact verification on
candidates only.

Completeness proof (the part a reviewer should check): with radius
R_km, any matching pair differs by at most R/111.195 degrees of
latitude (111.195 km per degree = 2πR_earth/360), and at most
R/(111.195·cos(φmax)) degrees of longitude for points with
|lat| ≤ φmax. Cell heights/widths are chosen STRICTLY larger than
those bounds (5° > 4.50°, 10° > 8.99° at R=500, φmax=60°), so two
matching points can never be more than one cell apart on either
axis — the 3×3 neighborhood catches every pair. The fixture keeps
|lat| ≤ 60° and |lon| ≤ 170°: the first bounds cos(lat) away from
zero (real deployments special-case polar caps), the second keeps
any antimeridian-wrapping pair provably beyond R (equivalent
angular Δlon ≥ 20° → distance ≥ 6371·sin(10°) ≈ 1106 km), so the
non-wrapping cell arithmetic is exact — production code adds the
modular lon-cell offset instead.

Reference surface: extends the reference's join family (SURVEY.md
§2A F1-F3/joins) with the spatial-band shape; no reference
counterpart (course scope ends at equi-joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.operators.scalars import EARTH_R_KM
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

GEO_RADIUS_KM = 500.0
CELL_LAT_DEG = 5.0  # > 500 / 111.195 = 4.497
CELL_LON_DEG = 10.0  # > 500 / (111.195 * cos(60°)) = 8.993

# deterministic point cloud: lat ∈ [-60, 60], lon ∈ [-170, 170]
_LAT_SQL = "CAST((c_custkey * 37) % 12001 AS DOUBLE) / 100 - 60"
_LON_SQL = "CAST((c_custkey * 73) % 34001 AS DOUBLE) / 100 - 170"

_RADIUS_ORACLE = f"""
    WITH pts AS (
        SELECT c_custkey AS k, {_LAT_SQL} AS lat, {_LON_SQL} AS lon
        FROM customer
    ),
    pairs AS (
        SELECT a.k AS ka, b.k AS kb,
               round(2 * {EARTH_R_KM} * asin(sqrt(
                   pow(sin(radians(b.lat - a.lat) / 2), 2)
                   + cos(radians(a.lat)) * cos(radians(b.lat))
                     * pow(sin(radians(b.lon - a.lon) / 2), 2)
               )), 1) AS dist_km
        FROM pts a JOIN pts b ON a.k < b.k
    ),
    matched AS (
        SELECT ka, kb, dist_km,
               CAST(floor(dist_km / 50) AS INT) AS dist_band
        FROM pairs WHERE dist_km <= {GEO_RADIUS_KM}
    )
    SELECT dist_band,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(ka * 1000003 + kb) AS BIGINT) AS pair_checksum,
           CAST(sum(CAST(dist_km AS DECIMAL(14, 1))) AS DECIMAL(20, 1))
               AS sum_dist_km
    FROM matched
    GROUP BY dist_band
    ORDER BY dist_band
"""


@register(
    "geo_geohash_radius_join",
    oracle=_RADIUS_ORACLE,
    tags=("geo", "spatial", "band-join", "radius-join"),
)
def geo_geohash_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPATIAL RADIUS SELF-JOIN, banded: every customer gets a
    deterministic (lat, lon); find all pairs within 500 km of each
    other, bucketed into 50 km distance bands with pair checksums —
    hash-equality against DuckDB's EXHAUSTIVE O(n²) join is a
    cross-algorithm completeness proof of the banding (the PPJoin /
    phrase-index oracle recipe).

    Plan: one narrow scan computes (cell_lat, cell_lon) per point;
    the probe side explodes to its 3×3 neighbor cells (9× a narrow
    5-column table, not the fact); both sides shuffle once on the
    cell key; the exact haversine predicate runs on candidates only.
    Candidates are ~(9/cells)·n² instead of n² — density-bounded,
    and AQE's skew split handles hot cells (urban clusters in real
    data). The 1 dp rounding before both the threshold and the band
    floor keeps libm ULP divergence out of the hash (the engine's
    standard trig-pipeline policy, cf. geo_haversine_nearest_nation).
    """
    pts = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.expr(_LAT_SQL).alias("lat"),
        F.expr(_LON_SQL).alias("lon"),
    )
    pts = pts.select(
        "k", "lat", "lon",
        F.floor(F.col("lat") / CELL_LAT_DEG).alias("cla"),
        F.floor(F.col("lon") / CELL_LON_DEG).alias("clo"),
    )
    offsets = F.expr(
        "explode(array(-1, 0, 1))"
    )
    probe = (
        pts.withColumn("dlat", F.expr("explode(array(-1, 0, 1))"))
        .withColumn("dlon", offsets)
        .select(
            F.col("k").alias("ka"),
            F.col("lat").alias("lat1"),
            F.col("lon").alias("lon1"),
            (F.col("cla") + F.col("dlat")).alias("jla"),
            (F.col("clo") + F.col("dlon")).alias("jlo"),
        )
    )
    build = pts.select(
        F.col("k").alias("kb"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
        F.col("cla").alias("jla"),
        F.col("clo").alias("jlo"),
    )
    dist = F.round(
        2
        * EARTH_R_KM
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("lat2") - F.col("lat1")) / 2), 2)
                + F.cos(F.radians("lat1"))
                * F.cos(F.radians("lat2"))
                * F.pow(
                    F.sin(F.radians(F.col("lon2") - F.col("lon1")) / 2), 2
                )
            )
        ),
        1,
    )
    matched = (
        probe.join(build, ["jla", "jlo"])
        .filter(F.col("ka") < F.col("kb"))
        .select("ka", "kb", dist.alias("dist_km"))
        .filter(F.col("dist_km") <= F.lit(GEO_RADIUS_KM))
    )
    return (
        matched.groupBy(
            F.floor(F.col("dist_km") / 50).cast("int").alias("dist_band")
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.col("ka") * 1000003 + F.col("kb")).alias("pair_checksum"),
            F.sum(F.col("dist_km").cast("decimal(14,1)"))
            .cast("decimal(20,1)")
            .alias("sum_dist_km"),
        )
        .orderBy("dist_band")
    )
