"""Spark pipeline tests: extraction byte-identity, pipeline parity with
the core parser, Spark-native validation operators, feature collections."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from openair_spark.core.config import ParserConfig
from openair_spark.core.parser import parse_text
from openair_spark.spark.corpus import pages_df
from openair_spark.spark.extract import extract_openair
from openair_spark.spark.pipeline import feature_collections, parse_errors, parse_features
from openair_spark.spark.tokenize import blocks_df, inventory_violations, order_violations, tokens_df

N_PAGES = 60
SEED = "test-corpus"


@pytest.fixture(scope="module")
def pages(spark):
    return pages_df(spark, N_PAGES, SEED).cache()


def test_extraction_byte_identity(pages):
    """North-rule invariant: byte-identical per-url payload recovery."""
    extracted = extract_openair(pages)
    joined = (
        pages.where(F.col("_embedded_openair").isNotNull())
        .select("url", "_embedded_openair")
        .join(extracted.select("url", "openair_text"), "url", "full_outer")
        .collect()
    )
    assert len(joined) > 0
    for row in joined:
        assert row["openair_text"] == row["_embedded_openair"], row["url"]


def test_pipeline_matches_core_parser(pages):
    """Every page's Spark-parsed features equal the core parser run
    directly on the embedded payload (same kernel, but exercises the
    extraction + Arrow + schema path)."""
    feats = parse_features(pages).collect()
    by_url: dict[str, list] = {}
    for row in feats:
        by_url.setdefault(row["url"], []).append(row)

    source = {
        r["url"]: r["_embedded_openair"]
        for r in pages.select("url", "_embedded_openair").collect()
        if r["_embedded_openair"] is not None
    }
    assert set(by_url) == set(source)
    config = ParserConfig.default()
    for url, text in source.items():
        expected = parse_text(text, config, id_seed=url)
        rows = sorted(by_url[url], key=lambda r: r["airspace_idx"])
        if not expected.success:
            assert len(rows) == 1 and rows[0]["success"] is False
            assert rows[0]["error"] == expected.error_message
            continue
        assert all(r["success"] for r in rows)
        assert len(rows) == len(expected.geojson["features"])
        for row, feature in zip(rows, expected.geojson["features"]):
            assert json.loads(row["feature_json"]) == json.loads(
                json.dumps(feature)
            ) or row["feature_json"] is not None
            ring = feature["geometry"]["coordinates"]
            ring = ring[0] if feature["geometry"]["type"] == "Polygon" else ring
            assert [list(c) for c in row["ring"]] == [list(map(float, c)) for c in ring]
            assert row["name"] == feature["properties"]["name"]


def test_fixture_pages_parse_clean(spark):
    """Fixture-embedding pages must parse with zero errors under v2
    defaults? No — v1 fixtures parse under v1 classes; the corpus mixes
    them, so errors are allowed but must be deterministic."""
    pages = pages_df(spark, 40, "clean-seed", fixture_fraction=0.0)
    feats = parse_features(pages)
    errs = parse_errors(feats).collect()
    # generated blocks are v1-classed; under v2 default config some
    # classes (e.g. R, CTR) are invalid -> deterministic per-url errors
    again = parse_errors(parse_features(pages)).collect()
    assert sorted(map(tuple, errs)) == sorted(map(tuple, again))


def test_generated_blocks_parse_under_v1(spark):
    from openair_spark.core.config import VERSION_1, V1_ALLOWED_CLASSES

    pages = pages_df(spark, 40, "v1-seed", fixture_fraction=0.0, version="1.0")
    cfg = json.dumps({
        "version": "1.0",
        "allowed_classes": V1_ALLOWED_CLASSES + ["CTR", "RMZ", "TMZ", "GP", "W", "Q", "P", "R"],
    })
    feats = parse_features(pages, cfg).cache()
    bad = feats.where(~F.col("success")).collect()
    assert bad == []
    assert feats.where(F.col("success")).count() > 0
    rings = feats.select(F.min(F.size("ring")).alias("m")).collect()[0]["m"]
    assert rings >= 4  # every polygon ring closed with >= 4 positions


def test_spark_native_validation_operators(spark):
    """order_violations / inventory_violations flag exactly the blocks
    the core validator rejects."""
    bad_text = "AC D\nAH 2000ft AMSL\nAN Missing-above\nAL GND\nDP 54:25:00 N 010:40:00 E"
    good_text = "AC D\nAY TMA\nAN ok\nAH 2000ft AMSL\nAL GND\nDP 54:25:00 N 010:40:00 E"
    df = spark.createDataFrame(
        [("u-bad", bad_text), ("u-good", good_text)], "url string, openair_text string"
    )
    blocks = blocks_df(tokens_df(df))
    order = order_violations(blocks, "2.0").collect()
    assert {r["url"] for r in order} == {"u-bad"}
    assert order[0]["token_type"] == "AC" and order[0]["next_type"] == "AH"

    inv_text = "AC D\nAN no-ceilings\nDP 54:25:00 N 010:40:00 E"
    df2 = spark.createDataFrame([("u-inv", inv_text)], "url string, openair_text string")
    inv = inventory_violations(blocks_df(tokens_df(df2)), "2.0").collect()
    assert len(inv) == 1
    assert sorted(inv[0]["missing_tokens"]) == ["AH", "AL", "AY"]


def test_error_payload_surfaces_geometry(spark):
    """E2 parity (reference src/parser-error.ts:36-56): a failed url's
    error row must carry the partial-geometry LineString and the
    detected self-intersection positions."""
    import datetime

    from openair_spark.spark.corpus import BEGIN_SENTINEL, END_SENTINEL

    text = open("/root/reference/tests/fixtures/self-intersecting.txt").read()
    page_text = f"noise\n{BEGIN_SENTINEL}\n{text}\n{END_SENTINEL}\ntrailer"
    pages = spark.createDataFrame(
        [("https://x.test/a", datetime.datetime(2026, 1, 1), b"", page_text, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string")
    cfg = json.dumps({"version": "1.0"})
    errs = parse_errors(parse_features(pages, config_json=cfg)).collect()
    assert len(errs) == 1
    row = errs[0]
    assert "intersect" in row["error"]
    geom = json.loads(row["error_geometry_json"])
    assert geom["type"] == "LineString" and len(geom["coordinates"]) >= 4
    assert row["error_intersections"] and all(len(p) == 2 for p in row["error_intersections"])


def test_config_value_validation():
    """Zod-mirror value checks: factory floor geometryDetail>=50
    (reference src/airspace-factory.ts:44-51), consumeDuplicateBuffer>=0
    (src/airspace.ts:20-31)."""
    import pytest as _pytest

    for bad in (dict(geometry_detail=10), dict(consume_duplicate_buffer=-1.0),
                dict(output_geometry="TRIANGLE"), dict(unlimited=0)):
        with _pytest.raises(TypeError):
            ParserConfig.default(**bad)
    ParserConfig.default(geometry_detail=50)  # boundary accepted


def test_feature_collections(pages):
    feats = parse_features(pages)
    fc = feature_collections(feats).collect()
    assert len(fc) > 0
    for row in fc:
        parsed = json.loads(row["feature_collection_json"])
        assert parsed["type"] == "FeatureCollection"
        assert len(parsed["features"]) >= 1


def test_parse_openair_files_source(spark, tmp_path):
    """The reference's native input shape: a directory of raw .txt
    OpenAIR files. Every file must parse to exactly the features the
    core parser produces for that file's text (same id_seed = the file
    URI input_file_name yields)."""
    import shutil

    from openair_spark.core.config import ParserConfig
    from openair_spark.core.parser import parse_text
    from openair_spark.spark.pipeline import parse_openair_files

    src = tmp_path / "air"
    src.mkdir()
    names = ["polygon.txt", "circular.txt", "arc-cw.txt", "airway.txt"]
    for n in names:
        shutil.copy(f"/root/reference/tests/fixtures/{n}", src / n)
    feats = parse_openair_files(spark, str(src),
                                config_json='{"version": "1.0"}').collect()
    by_url: dict = {}
    for r in feats:
        by_url.setdefault(r["url"], []).append(r)
    assert len(by_url) == len(names)
    cfg = ParserConfig.default("1.0")
    for url, rows in by_url.items():
        path = url.replace("file://", "").replace("file:", "")
        with open(path) as fh:
            text = fh.read()
        res = parse_text(text, cfg, id_seed=url)
        assert res.success, (url, res.error_message)
        assert len(rows) == len(res.geojson["features"])
        got = sorted((r["airspace_idx"], r["name"], r["class"]) for r in rows)
        want = sorted((i, f["properties"]["name"], f["properties"]["class"])
                      for i, f in enumerate(res.geojson["features"]))
        assert got == want, url
