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
