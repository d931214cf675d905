"""Raster-tile <-> vector-polygon assignment (north rule).

A raster layer is modeled as a regular grid: tile = quadkey cell at a
fixed resolution with a value column. Assignment joins tiles to polygons
through the polygon cover (JVM broadcast join on cell) and resolves
PARTIAL cells by testing the tile *center* against the ring (standard
center-point rasterization rule — deterministic and oracle-expressible
for rectangles).

Zonal statistics then aggregate tile values per polygon (hash agg,
partial+final handled by Spark).
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index import quadkey
from ..index.pip import points_in_ring
from .pip import build_cell_index


def tiles_from_points(points: DataFrame, res: int,
                      lat_col: str = "lat", lon_col: str = "lon",
                      value_col: str = "value") -> DataFrame:
    """Rasterize a point layer: mean value per res-`res` tile."""
    return (
        points
        .withColumn("tile", F.expr(quadkey.sql_cell_expr(lat_col, lon_col, res)))
        .groupBy("tile")
        .agg(F.avg(value_col).alias("tile_value"),
             F.sum(value_col).alias("tile_sum"),
             F.count("*").alias("n_points"))
    )


def assign_tiles(tiles: DataFrame, polygons: list[dict], res: int,
                 tile_col: str = "tile") -> DataFrame:
    """tiles(tile, ...) x polygons -> (tile rows, polygon_id).

    The polygon cover is built at exactly the tile resolution so the
    join key is the tile id itself; FULL cover cells assign directly,
    PARTIAL cells test the tile center in the Arrow kernel.
    """
    spark = tiles.sparkSession
    index_pdf = build_cell_index(polygons, min_res=res, max_res=res)
    index_df = spark.createDataFrame(
        index_pdf, "cell long, polygon_id string, is_full boolean, ring_json string")

    cand = tiles.join(F.broadcast(index_df), tiles[tile_col] == index_df.cell, "inner").drop("cell")
    full = cand.where(F.col("is_full")).drop("is_full", "ring_json")
    partial = cand.where(~F.col("is_full")).drop("is_full")

    out_fields = [f for f in full.schema.fields]
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    names = [f.name for f in out_fields]

    def center_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.reset_index(drop=True)
            west, south, east, north = quadkey.cell_bounds(pdf[tile_col].to_numpy())
            cx = (np.asarray(west) + np.asarray(east)) / 2.0
            cy = (np.asarray(south) + np.asarray(north)) / 2.0
            keep = np.zeros(len(pdf), dtype=bool)
            for ring_json, group in pdf.groupby("ring_json"):
                ring = np.asarray(json.loads(ring_json), dtype=np.float64)
                gi = group.index.to_numpy()
                keep[gi] = points_in_ring(cx[gi], cy[gi], ring)
            yield pdf.loc[keep, names]

    partial_hits = partial.mapInPandas(center_kernel, schema)
    return full.unionByName(partial_hits)


def zonal_stats(assigned: DataFrame, value_col: str = "tile_value") -> DataFrame:
    return assigned.groupBy("polygon_id").agg(
        F.count("*").alias("n_tiles"),
        F.sum(value_col).alias("sum_value"),
        F.avg(value_col).alias("avg_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )
