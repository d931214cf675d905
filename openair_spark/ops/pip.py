"""Salted broadcast point-in-polygon join (north rule).

Plan shape (for 10^12 points x ~10^5 polygons):

  polygons --driver--> compact covers --> cell index rows
      (cell, polygon_id, is_full, ring)          [small: broadcast]
  points  --map--> cell = quadkey(point, res per cover row's res range)
  join    points x broadcast(cell_index) on cell  [NO shuffle]
  exact   is_full rows skip PIP; partial rows run the vectorized
          ray-cast in one Arrow-batched kernel

Skew: a broadcast join has no shuffle skew, but a hot *cell* (dense
megacity airspace) still concentrates exact-PIP work in whichever tasks
scan those points. Because candidate work is per-point-row and the scan
partitioning is independent of cell, hot cells are already spread across
input partitions — the residual skew knob is `salt` for the shuffle-join
variant (`pip_join_shuffle`), which repartitions by (cell, salt) with
the polygon side replicated per salt. Mega-polygons are split by the
compact cover itself (bounded cells per row).
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index import quadkey
from ..index.cover import compact_cover
from ..index.pip import points_in_ring

MIN_RES = 5
MAX_RES = 9


def build_cell_index(polygons: list[dict], min_res: int = MIN_RES,
                     max_res: int = MAX_RES) -> pd.DataFrame:
    """polygons: [{'polygon_id': str, 'ring': [[lon,lat],...]}] ->
    rows (cell, polygon_id, is_full, ring_json). Runs driver-side for
    broadcast-scale polygon sets; ring_json carried only on PARTIAL rows
    (FULL rows need no exact test) to keep the broadcast small."""
    rows = []
    for poly in polygons:
        ring = poly["ring"]
        ring_json = json.dumps(ring)
        for cell, is_full in compact_cover(np.asarray(ring, dtype=np.float64),
                                           min_res=min_res, max_res=max_res):
            rows.append({
                "cell": int(cell),
                "polygon_id": poly["polygon_id"],
                "is_full": bool(is_full),
                "ring_json": None if is_full else ring_json,
            })
    return pd.DataFrame(rows, columns=["cell", "polygon_id", "is_full", "ring_json"])


def _point_cells_expr(lat_col: str, lon_col: str, cover_resolutions: list[int]):
    """Array of the point's cell ids at every resolution the cover uses —
    pure Spark SQL so the join key computation stays JVM-side."""
    return F.array(*[
        F.expr(quadkey.sql_cell_expr(lat_col, lon_col, res))
        for res in cover_resolutions
    ])


def pip_join(points: DataFrame, polygons: list[dict],
             lat_col: str = "lat", lon_col: str = "lon",
             min_res: int = MIN_RES, max_res: int = MAX_RES) -> DataFrame:
    """Broadcast PIP join: returns points columns + polygon_id for every
    (point, polygon) containment pair."""
    spark = points.sparkSession
    index_pdf = build_cell_index(polygons, min_res, max_res)
    resolutions = list(range(min_res, max_res + 1))
    index_df = spark.createDataFrame(
        index_pdf, "cell long, polygon_id string, is_full boolean, ring_json string")

    pts = points.withColumn(
        "_cells", _point_cells_expr(lat_col, lon_col, resolutions)
    ).withColumn("cell", F.explode("_cells")).drop("_cells")

    candidates = pts.join(F.broadcast(index_df), "cell", "inner")

    full_hits = candidates.where(F.col("is_full")).drop("is_full", "ring_json", "cell")

    partial = candidates.where(~F.col("is_full"))
    out_fields = [f for f in full_hits.schema.fieldNames()]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in full_hits.schema.fields
    )

    def exact_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ring_cache: dict[str, np.ndarray] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            for ring_json, group in pdf.groupby("ring_json"):
                ring = ring_cache.get(ring_json)
                if ring is None:
                    ring = np.asarray(json.loads(ring_json), dtype=np.float64)
                    ring_cache[ring_json] = ring
                mask = points_in_ring(group[lon_col].to_numpy(),
                                      group[lat_col].to_numpy(), ring)
                keep[group.index.to_numpy()] = mask
            yield pdf.loc[keep, out_fields]

    partial_hits = (
        partial.drop("is_full", "cell")
        .mapInPandas(lambda it: exact_kernel(
            (p.reset_index(drop=True) for p in it)), schema + "")
    )
    return full_hits.unionByName(partial_hits)


def pip_join_shuffle(points: DataFrame, polygon_cells: DataFrame,
                     salt: int = 8, lat_col: str = "lat", lon_col: str = "lon",
                     res: int = 7) -> DataFrame:
    """Shuffle-join variant for polygon sets too big to broadcast:
    both sides repartition on (cell, salt); the polygon side is
    replicated across all salt values so every point salt bucket sees
    the full candidate set for its cell. Hot cells spread over `salt`
    reducers (explicit skew handling, north rule).

    polygon_cells: DataFrame(cell long, polygon_id string, ring_json string)
    """
    pts = points.withColumn("cell", F.expr(quadkey.sql_cell_expr(lat_col, lon_col, res)))
    pts = pts.withColumn("_salt", F.pmod(F.hash(lon_col, lat_col), F.lit(salt)))
    replicated = polygon_cells.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    candidates = pts.repartition("cell", "_salt").join(
        replicated, ["cell", "_salt"], "inner"
    ).drop("_salt")

    out_fields = [f for f in candidates.schema.fields if f.name != "ring_json"]
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    names = [f.name for f in out_fields]

    def exact_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.reset_index(drop=True)
            keep = np.zeros(len(pdf), dtype=bool)
            for ring_json, group in pdf.groupby("ring_json"):
                ring = np.asarray(json.loads(ring_json), dtype=np.float64)
                keep[group.index.to_numpy()] = points_in_ring(
                    group[lon_col].to_numpy(), group[lat_col].to_numpy(), ring)
            yield pdf.loc[keep, names]

    return candidates.mapInPandas(exact_kernel, schema)
