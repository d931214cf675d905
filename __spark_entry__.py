"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)`   — flagship: synthetic Common-Crawl-style pages ->
                   byte-identical OpenAIR extraction -> Arrow-vectorized
                   parse (tokenize grammar + geometry kernels, reference
                   openAIP/openaip-openair-parser src/tokenizer.ts +
                   src/airspace-factory.ts) -> polygon tile covers ->
                   per-cell polygon histogram.
`queries()`      — one entry per implemented operator (SURVEY.md §2 /
                   §2.9), incl. the training-data ops over documents/
                   embeddings.
`oracle_sql()`   — DuckDB-equivalent SQL for every SQL-expressible
                   entry; parse-pipeline entries are rows-only (the
                   reference fixture corpus is their oracle, checked in
                   tests/test_core_fixtures.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from openair_spark.queries import build_catalog  # noqa: E402

_N_PAGES = {"sf0.001": 40, "sf0.01": 150, "sf0.1": 800}


def _pages_for(spark: SparkSession, sf_dir: str):
    from openair_spark.spark.corpus import pages_df

    name = os.path.basename(sf_dir.rstrip("/"))
    n = _N_PAGES.get(name, 150)
    return pages_df(spark, n, seed=f"entry-{name}")


def _parse_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openair_spark.spark.pipeline import parse_features

    feats = parse_features(_pages_for(spark, sf_dir))
    return feats.select(
        "url", "airspace_idx", "name", "class", "geometry_type",
        F.size("ring").alias("ring_len"), "success", "error",
    )


def _parse_tile_cover_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openair_spark.ops.tiling import polygon_tiles
    from openair_spark.spark.pipeline import parse_features

    feats = parse_features(_pages_for(spark, sf_dir))
    return polygon_tiles(feats)


def _parse_pip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: parse airspaces from pages, then PIP-join a synthetic
    point grid against the parsed polygons (rows-only: polygons come
    from the parse, not from a SQL-visible table)."""
    from openair_spark.ops.pip import pip_join
    from openair_spark.spark.pipeline import parse_features

    feats = parse_features(_pages_for(spark, sf_dir)).where(
        F.col("success") & (F.col("geometry_type") == "Polygon"))
    polys = feats.select(
        F.concat_ws("#", "url", "airspace_idx").alias("polygon_id"), "ring")
    points = spark.range(0, 20000).selectExpr(
        "CAST(id AS STRING) AS point_id",
        "(30.0e0 + (id * 40093) % 35000 / 1000.0e0) AS lat",
        "(-12.0e0 + (id * 69697) % 45000 / 1000.0e0) AS lon",
    )
    hits = pip_join(points, polys)
    return hits.groupBy("polygon_id").agg(F.count("*").alias("n_points"))


def _feature_collections_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openair_spark.spark.pipeline import feature_collections, parse_features

    feats = parse_features(_pages_for(spark, sf_dir))
    return feature_collections(feats)


def _openair_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoJSON -> OpenAIR writer (reference O3, src/geojson-to-openair.ts)
    applied per feature; returns url + emitted line count + first line."""
    from openair_spark.spark.pipeline import parse_features
    from openair_spark.spark.writer import openair_lines

    feats = parse_features(_pages_for(spark, sf_dir))
    return openair_lines(feats)


def _checkpoint_manifest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition checkpoint/lineage surface (north rule): run a tiny
    bucketed parse job through run_partitioned twice (second pass must
    skip everything), return the manifest rows (lineage: rows in/out +
    order-insensitive checksum; timestamps excluded for determinism)."""
    import tempfile

    from pyspark.sql import functions as F2

    from openair_spark.ops.checkpoint import read_manifest, run_partitioned
    from openair_spark.spark.pipeline import parse_features

    root = tempfile.mkdtemp(prefix="ckpt_q_")
    pages = _pages_for(spark, sf_dir).withColumn(
        "_bucket", F2.pmod(F2.xxhash64("url"), F2.lit(4)))

    def build(pid: str):
        part = pages.where(F2.col("_bucket") == int(pid)).drop("_bucket")
        return parse_features(part), part.count()

    manifest_path = f"{root}/manifest"
    run_partitioned(spark, [str(b) for b in range(4)], build,
                    output_root=f"{root}/features", manifest_path=manifest_path)
    again = run_partitioned(spark, [str(b) for b in range(4)], build,
                            output_root=f"{root}/features", manifest_path=manifest_path)
    assert again["processed"] == [] and len(again["skipped"]) == 4
    return read_manifest(spark, manifest_path).select(
        "partition_id", "status", "input_rows", "output_rows", "checksum", "attempt")


def _spark_native_blocks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark-native (window/groupBy) formulation of the reference's
    tokenize + block-segmentation FSM over REAL OpenAIR text — the
    running-sum window replaces src/parser.ts:129-159; classification is
    a JVM when/rlike cascade (no Python)."""
    from openair_spark.spark.extract import extract_openair
    from openair_spark.spark.tokenize import blocks_df, tokens_df

    extracted = extract_openair(_pages_for(spark, sf_dir))
    blocks = blocks_df(tokens_df(extracted))
    return (
        blocks.groupBy("url", "block_id")
        .agg(F.count("*").alias("n_tokens"),
             F.min("line_no").alias("first_line"),
             F.max("line_no").alias("last_line"))
    )


def _multimodal_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary asset pipeline: pages html -> typed asset rows -> Arrow
    decode kernel (deterministic stub decoder — no codecs in this
    container; plumbing is real, see ops/multimodal.py)."""
    from openair_spark.ops.multimodal import decode_features, extract_assets

    assets = extract_assets(_pages_for(spark, sf_dir))
    return decode_features(assets, fake=True)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001-scale corpus: parse -> tile -> cell histogram."""
    from openair_spark.ops.tiling import polygon_tiles, tile_histogram
    from openair_spark.spark.pipeline import parse_features

    pages = _pages_for(spark, "/root/testdata/sf0.001")
    tiles = polygon_tiles(parse_features(pages))
    return tile_histogram(tiles)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: qd.spark_fn for name, qd in build_catalog().items()
    }
    out["parse_features_corpus"] = _parse_features_q
    out["parse_tile_cover"] = _parse_tile_cover_q
    out["parse_pip_join"] = _parse_pip_q
    out["feature_collections"] = _feature_collections_q
    out["openair_roundtrip"] = _openair_roundtrip_q
    out["multimodal_decode"] = _multimodal_decode_q
    out["spark_native_blocks"] = _spark_native_blocks_q
    out["checkpoint_manifest"] = _checkpoint_manifest_q
    return out


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.oracle_sql
        for name, qd in build_catalog().items()
        if qd.oracle_sql is not None
    }
