"""Streaming sinks — SURVEY.md §2.1 S5/S6, §2.9 T8/T9.

The reference writes DWS rows to ClickHouse ReplacingMergeTree,
which dedups to the latest row per key at merge time [R]. The Spark
equivalent is a `foreachBatch` idempotent upsert: each micro-batch
merges into the target keeping the max-version row per key. The
merge is re-runnable, so micro-batch replays (at-least-once
delivery) still yield exactly-once TABLE STATE — the same effect
the reference gets from merge-time dedup.

Output modes (T9): append = finalized results only (requires
watermark for aggs), update = changed keys each batch, complete =
full result each batch. Tests exercise all three.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def upsert_latest_by_key(target_dir: str, key_cols: list[str], version_col: str):
    """Build a foreachBatch function that merges each micro-batch into
    a parquet 'table', keeping the highest-`version_col` row per key
    (ties broken by the key tuple — deterministic).

    At warehouse scale the same function body targets an ACID table
    (MERGE INTO on Delta/Iceberg) or a ClickHouse JDBC batch insert;
    parquet-overwrite keeps this repo dependency-free. State is in
    the TARGET, not the stream — so the operator itself is stateless
    and restarts are safe.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        target = Path(target_dir)
        merged = batch_df
        if any(target.glob("*.parquet")):
            existing = spark.read.parquet(str(target))
            merged = existing.unionByName(batch_df)
        w = Window.partitionBy(*key_cols).orderBy(F.col(version_col).desc())
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # Two-phase write: parquet can't overwrite a dir being read.
        tmp = str(target) + f".tmp{batch_id}"
        latest.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(str(target))

    return write


def run_to_completion(query: StreamingQuery) -> None:
    """Drain all available input then stop (end-of-stream for tests).

    If the query died, surface its ROOT CAUSE as the raised error —
    `processAllAvailable` alone buries e.g. a parquet schema mismatch
    twenty frames deep in a Py4J trace (or, worse, a caller polling
    `lastProgress` never learns the query is dead at all)."""
    try:
        query.processAllAvailable()
    finally:
        query.stop()
        query.awaitTermination()
    exc = query.exception()
    if exc is not None:
        raise exc


def await_progress(
    query: StreamingQuery, min_batch_id: int = 0, timeout_s: float = 120.0
) -> None:
    """Block until the running query has committed a batch with id ≥
    `min_batch_id`. BOUNDED: re-raises the query's own exception the
    moment it dies, and fails after `timeout_s` instead of spinning
    forever — every poll loop in tests must go through this (a dead
    query never produces progress, so a bare `while lastProgress is
    None` loop hangs the whole suite)."""
    import time

    deadline = time.monotonic() + timeout_s
    while True:
        exc = query.exception()
        if exc is not None:
            raise exc
        progress = query.lastProgress
        if progress is not None and progress["batchId"] >= min_batch_id:
            return
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"streaming query made no progress to batch {min_batch_id} "
                f"within {timeout_s}s (lastProgress={progress})"
            )
        time.sleep(0.2)
