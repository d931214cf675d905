"""Cell-local k-nearest-neighbors over airspace centroids (north rule).

Centroids (small side, ~10^4-10^6) are exploded into their cell plus a
neighbor ring at a chosen resolution and broadcast; points join on their
single cell (JVM-side key), distances are computed with built-in column
arithmetic (haversine in Spark SQL functions — no Python), and
row_number() over (point, distance) keeps the top k.

Correctness: a candidate set from ring-1 neighbors is exact as long as
k-th-neighbor distance < one cell width; pick `res` so the expected
centroid density satisfies that, or raise `rings`. The driver-side
oracle checks this against brute force at sandbox scale.

Determinism: ties broken by (distance, centroid_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index import quadkey


def haversine_km(lat1, lon1, lat2, lon2):
    """Spark-column haversine (R = 6371.0088 km, matching the core
    kernels) — stays inside whole-stage codegen."""
    rlat1 = F.radians(lat1)
    rlat2 = F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.pow(F.sin(dlon / 2), 2) * F.cos(rlat1) * F.cos(rlat2)
    return F.atan2(F.sqrt(a), F.sqrt(1 - a)) * 2 * 6371.0088


def knn_join(points: DataFrame, centroids: DataFrame, k: int = 3,
             res: int = 6, rings: int = 1,
             point_id: str = "point_id", centroid_id: str = "centroid_id",
             lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """points(point_id, lat, lon) x centroids(centroid_id, lat, lon)
    -> (point columns, centroid_id, dist_km, rank<=k).

    Cell-local: centroids broadcast exploded over their rings-`rings`
    neighborhood; points compute one cell id each.
    """
    spark = points.sparkSession
    cent_rows = centroids.select(centroid_id, lat_col, lon_col).collect()
    exploded = []
    for row in cent_rows:
        base = int(quadkey.cell_id(row[lat_col], row[lon_col], res))
        for cell in quadkey.neighbors(base, rings):
            exploded.append((int(cell), row[centroid_id], float(row[lat_col]), float(row[lon_col])))
    index_df = spark.createDataFrame(
        exploded, f"cell long, {centroid_id} string, c_lat double, c_lon double")

    pts = points.withColumn("cell", F.expr(quadkey.sql_cell_expr(lat_col, lon_col, res)))
    cand = pts.join(F.broadcast(index_df), "cell", "inner")
    cand = cand.withColumn(
        "dist_km", haversine_km(F.col(lat_col), F.col(lon_col), F.col("c_lat"), F.col("c_lon"))
    )
    w = Window.partitionBy(point_id).orderBy(F.col("dist_km").asc(), F.col(centroid_id).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("cell", "c_lat", "c_lon")
    )


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
