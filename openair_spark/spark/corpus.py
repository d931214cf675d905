"""Deterministic synthetic Common-Crawl-style page corpus.

Builds the `pages` table mandated by the north rule's input hint
(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING):
each page's text embeds zero or more OpenAIR definition blocks verbatim
between sentinel lines, surrounded by deterministic noise paragraphs.
The per-url extraction invariant is byte-identical recovery of the
embedded OpenAIR text.

Sources of OpenAIR payloads:
  - the 43 reference fixture texts (for parity-grade pages)
  - generated blocks from the same grammar (seeded), for volume

Everything is seeded — no wall-clock, no randomness outside the seed.
"""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta, timezone

BEGIN_SENTINEL = "-----BEGIN OPENAIR-----"
END_SENTINEL = "-----END OPENAIR-----"

_LANGS = ["en", "de", "fr", "it", "es"]

_NOISE_WORDS = (
    "aviation notice chart sector frequency glider soaring terrain valley "
    "ridge thermal crosscountry airfield runway circuit altitude pressure "
    "weather forecast briefing pilot logbook airspace boundary restricted "
    "danger prohibited control zone terminal area information service"
).split()

_CLASSES_V1 = ["A", "B", "C", "D", "E", "F", "G", "R", "Q", "P", "CTR", "RMZ", "TMZ", "GP", "W"]
_CLASSES_V2 = ["A", "B", "C", "D", "E", "F", "G", "UNC"]
_TYPES_V2 = ["TMA", "CTR", "CTA", "ATZ", "RMZ", "TMZ", "TRA", "TSA", "FIR", "P", "Q", "R"]


def _rng(seed: str) -> random.Random:
    return random.Random(int(hashlib.sha256(seed.encode()).hexdigest()[:16], 16))


def _noise_paragraph(rng: random.Random, sentences: int = 3) -> str:
    out = []
    for _ in range(sentences):
        n = rng.randint(6, 14)
        words = [rng.choice(_NOISE_WORDS) for _ in range(n)]
        words[0] = words[0].capitalize()
        out.append(" ".join(words) + ".")
    return " ".join(out)


def _dms_axis(value: float) -> tuple[int, int, int]:
    total = int(round(abs(value) * 3600.0))
    return total // 3600, (total // 60) % 60, total % 60


def _dms(rng: random.Random, lat: float, lon: float) -> str:
    lat_deg, lat_min, lat_sec = _dms_axis(lat)
    lon_deg, lon_min, lon_sec = _dms_axis(lon)
    return f"{lat_deg:02d}:{lat_min:02d}:{lat_sec:02d} N {lon_deg:03d}:{lon_min:02d}:{lon_sec:02d} E"


def generate_block(seed: str, version: str = "2.0") -> str:
    """One grammar-valid OpenAIR polygon/circle block (seeded).

    version 2.0 blocks carry AY (required by the v2 inventory) and only
    v2-allowed classes, so they parse under the default config."""
    rng = _rng(seed)
    lat_base = rng.uniform(35.0, 60.0)
    lon_base = rng.uniform(2.0, 25.0)
    classes = _CLASSES_V2 if version == "2.0" else _CLASSES_V1
    lines = [f"AC {rng.choice(classes)}"]
    if version == "2.0":
        lines.append(f"AY {rng.choice(_TYPES_V2)}")
    lines += [
        f"AN SYN-{seed[-12:].upper()} SECTOR {rng.randint(1, 99)}",
        # upper always above lower for the same datum (MSL floors cap at
        # 4000 ft, MSL ceilings start at 5000 ft)
        f"AH {rng.choice(['FL' + str(rng.randint(10, 66) * 5), str(rng.randint(50, 120) * 100) + 'ft AMSL', 'UNL'])}",
        f"AL {rng.choice(['GND', str(rng.randint(5, 40) * 100) + 'ft AMSL', str(rng.randint(3, 15) * 100) + 'ft AGL'])}",
    ]
    if rng.random() < 0.25:
        # circle geometry
        lines.append(f"V X={_dms(rng, lat_base, lon_base)}")
        lines.append(f"DC {rng.randint(2, 25) / 2.0}")
    else:
        # star-shaped polygon (vertices angle-sorted around the center ->
        # guaranteed simple ring), 4..9 vertices, closed
        import math

        n = rng.randint(4, 9)
        # evenly spaced angles with bounded jitter: stays strictly sorted
        # even after rounding coordinates to the 1-arcsecond grid
        step = 2 * math.pi / n
        angles = [i * step + rng.uniform(0.1, 0.9) * step for i in range(n)]
        pts = []
        for ang in angles:
            r = rng.uniform(0.2, 0.45)
            pts.append(_dms(rng, lat_base + r * math.sin(ang), lon_base + r * math.cos(ang)))
        for p in pts + [pts[0]]:
            lines.append(f"DP {p}")
    return "\n".join(lines)


def _fixture_texts() -> list[tuple[str, str]]:
    """Grammar-valid reference fixture payloads (name, text). Only
    fixtures that parse cleanly under v1/v2 defaults are embedded in the
    clean corpus; error fixtures are used by dedicated tests."""
    import os

    fixture_dir = "/root/reference/tests/fixtures"
    good = [
        "polygon.txt", "circular.txt", "arc-cw.txt", "arc-ccw.txt",
        "arc-angle-cw.txt", "arc-angle-ccw.txt", "arc-angle-single-vx.txt",
        "arc-cw-ccw.txt", "arc-first.txt", "airway.txt", "inline-comments.txt",
        "skipped-tokens.txt",
    ]
    out = []
    for name in good:
        with open(os.path.join(fixture_dir, name), encoding="utf-8") as fh:
            out.append((name, fh.read()))
    return out


def make_page_rows(n_pages: int, seed: str = "openair-corpus",
                   fixture_fraction: float = 0.25,
                   empty_fraction: float = 0.2,
                   version: str = "2.0") -> list[dict]:
    """Deterministic page rows. ~empty_fraction pages carry no OpenAIR
    payload; ~fixture_fraction of payload pages embed a reference fixture
    text verbatim; the rest embed 1-3 generated blocks.

    `_embedded_openair` is ground truth for the extraction-invariant
    test only; the engine never reads it."""
    fixtures = _fixture_texts()
    return [
        make_page_row(i, seed, fixtures, fixture_fraction, empty_fraction, version)
        for i in range(n_pages)
    ]


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "_embedded_openair string"
)


def pages_df(spark, n_pages: int, seed: str = "openair-corpus", **kwargs):
    rows = make_page_rows(n_pages, seed, **kwargs)
    return spark.createDataFrame(rows, schema=PAGES_SCHEMA)


def make_page_row(i: int, seed: str, fixtures: list[tuple[str, str]],
                  fixture_fraction: float = 0.25, empty_fraction: float = 0.2,
                  version: str = "2.0") -> dict:
    """Row i of the corpus — independent of every other row, so
    generation distributes trivially (see pages_df_dist)."""
    rng = _rng(f"{seed}|{i}")
    t0 = datetime(2025, 1, 1, tzinfo=timezone.utc)
    url = f"https://example.test/aip/{hashlib.sha256(f'{seed}|{i}'.encode()).hexdigest()[:12]}/{i}"
    lang = _LANGS[i % len(_LANGS)]
    parts = [_noise_paragraph(rng)]
    openair_text = None
    if rng.random() >= empty_fraction:
        if rng.random() < fixture_fraction:
            openair_text = fixtures[rng.randrange(len(fixtures))][1]
        else:
            blocks = [generate_block(f"{seed}|{i}|{b}", version)
                      for b in range(rng.randint(1, 3))]
            openair_text = "\n\n".join(blocks)
        parts.append(BEGIN_SENTINEL)
        parts.append(openair_text)
        parts.append(END_SENTINEL)
    parts.append(_noise_paragraph(rng))
    text = "\n".join(parts)
    html = f"<html><body><pre>{text}</pre></body></html>".encode("utf-8")
    return {
        "url": url,
        "warc_ts": t0 + timedelta(seconds=i * 97),
        "html": html,
        "text": text,
        "lang": lang,
        "_embedded_openair": openair_text,
    }


def pages_df_dist(spark, n_pages: int, seed: str = "openair-corpus",
                  partitions: int | None = None, **kwargs):
    """Executor-parallel corpus generation: spark.range drives row ids,
    each mapInPandas task generates its own slice (rows are seeded per
    id, so the result is identical to pages_df for the same seed)."""
    import pandas as pd

    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    def kernel(batches):
        fixtures = _fixture_texts()
        cols = [c.split()[0] for c in PAGES_SCHEMA.split(", ")]
        for pdf in batches:
            rows = [make_page_row(int(i), seed, fixtures, **kwargs) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.range(0, n_pages, numPartitions=partitions)
        .mapInPandas(kernel, PAGES_SCHEMA)
    )


def write_pages_parquet(spark, path: str, n_pages: int, seed: str = "openair-corpus",
                        partitions: int | None = None, **kwargs) -> None:
    df = pages_df(spark, n_pages, seed, **kwargs)
    if partitions:
        df = df.repartition(partitions)
    df.write.mode("overwrite").parquet(path)
