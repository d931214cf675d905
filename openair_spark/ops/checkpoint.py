"""Per-partition checkpoint manifest (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

Model: a long job is a list of logical partitions (e.g. Iceberg
partition values or bucket ids). Each partition is processed
independently and idempotently:

  manifest row: (partition_id, status, input_rows, output_rows,
                 checksum, attempt, finished_at)

`run_partitioned` skips partitions already 'done' in the manifest
(resume), writes each partition's output to its own directory
(overwrite = idempotent retry), and appends the manifest row last —
write-then-commit ordering means a crash can only leave a partition
re-runnable, never half-recorded.

The checksum is an order-insensitive wrapping SUM of per-row hashes so
lineage can be verified without re-reading outputs in order.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "partition_id string, status string, input_rows long, output_rows long, "
    "checksum long, attempt int, finished_at timestamp"
)


def read_manifest(spark: SparkSession, manifest_path: str) -> DataFrame:
    if not os.path.exists(manifest_path):
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    return spark.read.parquet(manifest_path)


def done_partitions(spark: SparkSession, manifest_path: str) -> set[str]:
    manifest = read_manifest(spark, manifest_path)
    return {
        r["partition_id"]
        for r in manifest.where(F.col("status") == "done").select("partition_id").collect()
    }


def dataset_checksum(df: DataFrame) -> tuple[int, int]:
    """Order-insensitive checksum: wrapping SUM of per-row hashes
    (sum is commutative, so row order never changes the value)."""
    row = df.select(
        F.coalesce(
            F.expr("cast(sum(cast(hash(*) as bigint)) as bigint)"), F.lit(0)
        ).alias("c"),
        F.count("*").alias("n"),
    ).collect()[0]
    return int(row["c"]), int(row["n"])


def run_partitioned(spark: SparkSession, partition_ids: list[str],
                    build_partition, output_root: str, manifest_path: str,
                    attempt: int = 1) -> dict:
    """Process each partition not yet 'done'.

    build_partition(partition_id) -> (DataFrame to write, input_rows).
    Returns {'processed': [...], 'skipped': [...]} for observability.
    """
    already = done_partitions(spark, manifest_path)
    processed, skipped = [], []
    for pid in partition_ids:
        if pid in already:
            skipped.append(pid)
            continue
        df, input_rows = build_partition(pid)
        out_dir = os.path.join(output_root, f"partition_id={pid}")
        df.write.mode("overwrite").parquet(out_dir)
        written = spark.read.parquet(out_dir)
        checksum, output_rows = dataset_checksum(written)
        manifest_row = spark.createDataFrame(
            [(pid, "done", int(input_rows), output_rows, checksum, attempt,
              datetime.now(timezone.utc))],
            MANIFEST_SCHEMA,
        )
        manifest_row.write.mode("append").parquet(manifest_path)
        processed.append(pid)
    return {"processed": processed, "skipped": skipped}
