"""Streaming incremental exact dedup — the Structured Streaming twin
of queries/training.py::incremental_dedup_delta (SURVEY.md §2.10 X4 +
§2.7 T8: changelog-style state kept in the TARGET, not the stream).

A document stream is deduped against everything that arrived before
it: each micro-batch probes a persisted content-hash index (the same
hash-bucketed parquet layout as streaming/sinks.py — per batch only
the buckets the batch's hashes touch are read and rewritten), every
doc is classified `kept` / `dup_in_batch` / `dup_of_corpus`, and the
batch's new hashes are merged into the index. First-seen wins: the
keep_doc_id for a hash is fixed by the first batch that carries it.

Exactly-once posture (the upsert-sink discipline): all state lives in
the index table, keyed by content hash with the owning doc and batch
recorded, so REPLAYING a batch after a crash reproduces the identical
classification — a replayed doc finds its own id as the keep (→ still
`kept`), and its batch-mates find a keep row stamped with their own
batch id (→ still `dup_in_batch`, not `dup_of_corpus`). The merge is
a no-op on replay (hash already present ⇒ existing row wins). The
per-batch output lands under a batch-id-deterministic dir with
overwrite, so replayed output files are rewritten, never duplicated.
Index writes use the staged-swap discipline (stage merged buckets to
a tmp dir, move files in, then delete old files — scd2.py's
compact_changelog pattern): a crash leaves a bucket untouched or
with identical duplicate rows that every reader folds away, never
with lost hashes.

Scale: per batch the work is O(|batch| + touched buckets), never
O(corpus) — the index stores 16-byte hashes + two longs per UNIQUE
document (~0.03% of corpus bytes for web text), text never shuffles,
and the probe/merge joins hash-partition on the content hash.

SINGLE-WRITER / LOCAL-FS ASSUMPTION (same as scd2.compact_changelog):
the staged-swap uses POSIX rename/unlink semantics and a staging dir
keyed by (index_dir, batch_id), so exactly ONE live writer may own an
index_dir — Structured Streaming's checkpoint lock already guarantees
this for a stream, but two QUERIES must not share an index_dir, and a
manual replay must not race a live run (their staging moves would
interleave). On object stores, swap the rename step for the store's
atomic copy+commit primitive.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_realtime_edu_spark.streaming.sinks import (
    BUCKET_COL,
    check_bucket_layout,
    key_bucket_col,
    read_buckets,
    staged_swap_buckets,
)

INDEX_SCHEMA = "text_md5 string, keep_doc_id bigint, first_seen_batch bigint"


def streaming_exact_dedup(
    index_dir: str,
    out_dir: str,
    n_buckets: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Build the foreachBatch function: classify each micro-batch of
    (id, text) documents against the persisted hash index at
    ``index_dir``, append classifications under ``out_dir``, and fold
    the batch's new hashes into the index."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        check_bucket_layout(index_dir, n_buckets)
        hashed = (
            batch_df.select(
                F.col(id_col).alias("doc_id"),
                # coalesce: a NULL text must still classify (md5(NULL)
                # is NULL, and NULL join keys would silently drop the
                # doc from the output while still polluting the index)
                F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("text_md5"),
            )
            .withColumn(BUCKET_COL, key_bucket_col(["text_md5"], n_buckets))
            .persist()
        )
        try:
            touched = [r[0] for r in hashed.select(BUCKET_COL).distinct().collect()]
            index = read_buckets(spark, index_dir, touched)
            if index is None:
                index = spark.createDataFrame([], INDEX_SCHEMA).withColumn(
                    BUCKET_COL, F.lit(0)
                )
            # Crash-window duplicates (old + staged files both present,
            # see the staged swap below) are byte-identical rows — fold
            # them away on every read.
            index = index.dropDuplicates(
                ["text_md5", "keep_doc_id", "first_seen_batch", BUCKET_COL]
            )
            # Batch-internal canon: smallest doc_id per new hash.
            batch_canon = hashed.groupBy("text_md5", BUCKET_COL).agg(
                F.min("doc_id").alias("batch_keep")
            )
            keep = (
                batch_canon.join(
                    index.select("text_md5", "keep_doc_id", "first_seen_batch"),
                    on="text_md5",
                    how="left",
                )
                .select(
                    "text_md5",
                    BUCKET_COL,
                    F.coalesce("keep_doc_id", "batch_keep").alias("keep_doc_id"),
                    F.coalesce("first_seen_batch", F.lit(batch_id)).alias(
                        "first_seen_batch"
                    ),
                )
            )
            classified = hashed.join(
                keep.select("text_md5", "keep_doc_id", "first_seen_batch"),
                on="text_md5",
            ).select(
                "doc_id",
                "text_md5",
                F.when(F.col("doc_id") == F.col("keep_doc_id"), "kept")
                .when(F.col("first_seen_batch") == batch_id, "dup_in_batch")
                .otherwise("dup_of_corpus")
                .alias("status"),
            )
            # Deterministic per-batch output path → replay overwrites.
            classified.write.mode("overwrite").parquet(
                str(Path(out_dir) / f"batch_id={batch_id}")
            )
            # Merge: existing index rows win (first-seen contract).
            merged = (
                keep.select(
                    "text_md5", "keep_doc_id", "first_seen_batch", BUCKET_COL
                )
                .unionByName(
                    index.select(
                        "text_md5", "keep_doc_id", "first_seen_batch", BUCKET_COL
                    )
                )
                .groupBy("text_md5", BUCKET_COL)
                .agg(
                    F.min_by(
                        F.struct("keep_doc_id", "first_seen_batch"),
                        "first_seen_batch",
                    ).alias("r")
                )
                .select(
                    "text_md5",
                    F.col("r.keep_doc_id").alias("keep_doc_id"),
                    F.col("r.first_seen_batch").alias("first_seen_batch"),
                    BUCKET_COL,
                )
            )
            # CRASH SAFETY (the index is the only record of what was
            # seen — losing a bucket silently re-admits duplicates):
            # the shared staged-swap (sinks.py::staged_swap_buckets).
            staged_swap_buckets(merged, index_dir, touched, batch_id)
        finally:
            hashed.unpersist()

    return write


def read_dedup_output(spark, out_dir: str) -> DataFrame:
    """Read back the per-batch classification output
    (doc_id, text_md5, status, batch_id)."""
    return spark.read.option("basePath", out_dir).parquet(out_dir)


def read_dedup_index(spark, index_dir: str) -> DataFrame:
    """Read the content-hash index (text_md5, keep_doc_id,
    first_seen_batch)."""
    dirs = sorted(
        str(p)
        for p in Path(index_dir).glob(f"{BUCKET_COL}=*")
        if p.is_dir()
    )
    if not dirs:
        return spark.createDataFrame([], INDEX_SCHEMA)
    # Fold crash-window duplicates (old + staged file both present).
    return spark.read.parquet(*dirs).drop(BUCKET_COL).dropDuplicates()
