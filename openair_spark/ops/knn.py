"""Cell-local k-nearest-neighbors over airspace centroids (north rule).

Centroids (small side, ~10^4-10^6) are exploded into their cell plus a
neighbor ring at a chosen resolution and broadcast; points join on their
single cell (JVM-side key), distances are computed with built-in column
arithmetic (haversine in Spark SQL functions — no Python), and
row_number() over (point, distance) keeps the top k.

EXACTNESS is guaranteed for any distribution, not assumed from density:
a point's ring-local top-k is provably complete iff its k-th candidate
distance is smaller than the geodesic margin between the point and the
edge of its (2*rings+1)^2 cell window. Points that fail the margin test
(or have < k candidates — e.g. empty neighborhoods, polar cells) fall
back to an exact brute-force pass against the broadcast centroid set.
With a sane `res` the fallback set is empty; with a hostile one the
answer is still exact, just slower.

`res=None` picks a resolution from the centroid bounding box and count
so a ring window holds ~4k..64 expected centroids.

Determinism: ties broken by (distance, centroid_id).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index import quadkey

_KM_PER_DEG = 111.19492664455873  # pi * 6371.0088 / 180, turf-consistent R


def haversine_km(lat1, lon1, lat2, lon2):
    """Spark-column haversine (R = 6371.0088 km, matching the core
    kernels) — stays inside whole-stage codegen."""
    rlat1 = F.radians(lat1)
    rlat2 = F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.pow(F.sin(dlon / 2), 2) * F.cos(rlat1) * F.cos(rlat2)
    return F.atan2(F.sqrt(a), F.sqrt(1 - a)) * 2 * 6371.0088


def pick_res(cent_rows, k: int, lat_col: str, lon_col: str) -> int:
    """Resolution so one ring-1 window expects ~max(4k, 16)..64 of the
    given centroids (uniformity heuristic only — exactness never
    depends on it, see margin fallback)."""
    n = len(cent_rows)
    if n == 0:
        return 6
    lats = [r[lat_col] for r in cent_rows]
    lons = [r[lon_col] for r in cent_rows]
    bbox_h = max(max(lats) - min(lats), 1e-6)
    bbox_w = max(max(lons) - min(lons), 1e-6)
    target = max(4 * k, 16)
    # ring-1 window is 3x3 cells; want density * window_area ~ target
    density = n / (bbox_h * bbox_w)  # per deg^2
    window_area = target / density
    window_side = math.sqrt(window_area)
    cell_h = max(window_side / 3.0, 1e-6)
    res = int(round(math.log2(180.0 / cell_h)))
    return max(2, min(res, 12))


def knn_join(points: DataFrame, centroids: DataFrame, k: int = 3,
             res: int | None = None, rings: int = 1,
             point_id: str = "point_id", centroid_id: str = "centroid_id",
             lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """points(point_id, lat, lon) x centroids(centroid_id, lat, lon)
    -> (point columns, centroid_id, dist_km, rank<=k). Exact.
    """
    spark = points.sparkSession
    cent_rows = centroids.select(centroid_id, lat_col, lon_col).collect()
    if res is None:
        res = pick_res(cent_rows, k, lat_col, lon_col)
    exploded = set()  # set: ring explosion near clamped edges can repeat a cell
    for row in cent_rows:
        base = int(quadkey.cell_id(row[lat_col], row[lon_col], res))
        for cell in quadkey.neighbors(base, rings):
            exploded.add((int(cell), str(row[centroid_id]),
                          float(row[lat_col]), float(row[lon_col])))
    index_df = spark.createDataFrame(
        sorted(exploded), f"cell long, {centroid_id} string, c_lat double, c_lon double")
    cent_b = centroids.selectExpr(
        f"CAST({centroid_id} AS STRING) AS {centroid_id}",
        f"{lat_col} AS c_lat", f"{lon_col} AS c_lon")

    point_cols = points.columns
    pts = points.withColumn("cell", F.expr(quadkey.sql_cell_expr(lat_col, lon_col, res)))

    cand = pts.join(F.broadcast(index_df), "cell", "inner")
    cand = cand.withColumn(
        "dist_km", haversine_km(F.col(lat_col), F.col(lon_col), F.col("c_lat"), F.col("c_lon"))
    )
    w = Window.partitionBy(point_id).orderBy(F.col("dist_km").asc(), F.col(centroid_id).asc())
    ranked = (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("cell", "c_lat", "c_lon")
    )

    # ---- exactness margin: geodesic distance from the point to the
    # nearest edge of its ring window, conservatively min of the lat
    # margin and the lon margin at the worst latitude inside the window
    cell_h = 180.0 / (1 << res)
    window_h = rings * cell_h  # degrees of guaranteed lat slack
    worst_lat = F.least(F.abs(F.col(lat_col)) + F.lit(2.0 * cell_h), F.lit(89.999))
    lon_margin_km = (
        F.lit(2.0 * window_h * _KM_PER_DEG) * F.cos(F.radians(worst_lat)))
    margin_km = F.least(F.lit(window_h * _KM_PER_DEG), lon_margin_km)

    per_point = ranked.groupBy(point_id).agg(
        F.count("*").alias("_n"), F.max("dist_km").alias("_kth"))
    safety = per_point.withColumn(
        "_safe", (F.col("_n") >= F.least(F.lit(k), F.lit(len(cent_rows)))))
    pts_meta = points.select(point_id, lat_col).join(safety, point_id, "left")
    unsafe_ids = pts_meta.where(
        F.col("_safe").isNull() | ~F.col("_safe")
        | (F.col("_kth") >= margin_km)
    ).select(point_id)

    safe_hits = ranked.join(F.broadcast(unsafe_ids), point_id, "left_anti")

    unsafe_pts = points.join(F.broadcast(unsafe_ids), point_id, "left_semi")
    brute = unsafe_pts.crossJoin(F.broadcast(cent_b)).withColumn(
        "dist_km", haversine_km(F.col(lat_col), F.col(lon_col), F.col("c_lat"), F.col("c_lon")))
    brute_hits = (
        brute.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("c_lat", "c_lon")
    )
    out_cols = point_cols + [centroid_id, "dist_km", "rank"]
    return safe_hits.select(out_cols).unionByName(brute_hits.select(out_cols))


def knn_bruteforce(points: DataFrame, centroids: DataFrame, k: int = 3,
                   point_id: str = "point_id", centroid_id: str = "centroid_id",
                   lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Exact cross-join baseline (oracle twin / small inputs)."""
    c = centroids.select(
        F.col(centroid_id),
        F.col(lat_col).alias("c_lat"),
        F.col(lon_col).alias("c_lon"),
    )
    cand = points.crossJoin(F.broadcast(c)).withColumn(
        "dist_km", haversine_km(F.col(lat_col), F.col(lon_col), F.col("c_lat"), F.col("c_lon"))
    )
    w = Window.partitionBy(point_id).orderBy(F.col("dist_km").asc(), F.col(centroid_id).asc())
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k).drop("c_lat", "c_lon")
