"""Streaming IVF vector-index maintenance — the X6 ingest sibling of
streaming/dedup.py (hash index) and streaming/semdedup.py (survivor
index): newly-ingested embedding vectors are APPENDED to a persisted
IVF index against a FROZEN coarse quantizer, so a growing vector
corpus pays O(batch) per micro-batch instead of per-batch index
rebuilds — the FAISS `add` discipline as a Structured Streaming
foreachBatch sink.

Shape: the quantizer (the k×dim centroid matrix from
``operators/similarity._ivf_fit_assign``) is fit ONCE on a reference
corpus batch-side and frozen to parquet (the streaming/scoring.py
model-freeze discipline); each micro-batch runs
``operators/similarity.ivf_append`` (one vectorized pandas-UDF
argmin against the broadcast centroids) and folds the assigned rows
into the cluster-bucketed on-disk index via the shared
staged-swap/bucket-layout helpers (streaming/sinks.py), deduped by
vec_id so LAST-BATCH CRASH REPLAY is a pure idempotent overwrite —
assignment depends only on the frozen centroids, never on index
state, so stream ≡ batch holds per-vector by construction.

Search over the read-back index is exactly the batch probe path
(``_ivf_probe_search`` or IVF×PQ over the (nid, cluster, cv)
layout). Refreshing the quantizer is a batch-side concern (refit,
write to a new path, restart the stream — assignments under the OLD
quantizer stay valid for search under the old centroids; a refit
implies an index rebuild, which is why production systems refit
rarely and append often).

Scale: per batch one narrow shuffle (bucket id), touched-bucket-only
index IO, centroid matrix k×dim broadcast; the index stores cluster
id + vector — at 100 TB the vectors would be PQ codes
(operators/quantization.py) with the same layout and this sink
unchanged.

Contract: vec_id is the upsert key and the stream must send a STABLE
(vec_id → embedding) mapping (the exact-dedup sink upstream in the
ingest tier guarantees it). A vec_id re-sent with a DIFFERENT
embedding can land in a different cluster bucket, and touched-only
index IO cannot see the old row to evict it — the same keyed-index
limitation as streaming/dedup.py; ``read_ivf_index`` deduplicates by
nid on read as a guard, not a license.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_realtime_edu_spark.streaming.sinks import (
    BUCKET_COL,
    check_bucket_layout,
    key_bucket_col,
    read_buckets,
    staged_swap_buckets,
)

INDEX_SCHEMA = (
    "nid bigint, cluster int, cv array<float>, first_seen_batch bigint"
)


def write_ivf_quantizer(spark, centers: "np.ndarray", model_dir: str) -> None:
    """Freeze a (k, dim) centroid matrix to parquet (cluster id +
    center array) — tiny by construction, one file."""
    rows = [
        (int(i), [float(x) for x in c]) for i, c in enumerate(centers)
    ]
    spark.createDataFrame(
        rows, "cluster int, center array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(model_dir)


def read_ivf_quantizer(spark, model_dir: str) -> "np.ndarray":
    """Read the frozen quantizer back as the (k, dim) matrix
    ivf_append/_ivf_probe_search expect (cluster id = row index)."""
    rows = spark.read.parquet(model_dir).orderBy("cluster").collect()
    if not rows:
        raise ValueError(f"no quantizer rows under {model_dir}")
    if [r.cluster for r in rows] != list(range(len(rows))):
        raise ValueError("quantizer cluster ids are not dense 0..k-1")
    return np.array([r.center for r in rows], dtype=np.float64)


def streaming_ivf_index(
    quantizer_dir: str,
    index_dir: str,
    n_buckets: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Build the foreachBatch function: assign each micro-batch of
    (id, embedding) vectors to the frozen quantizer's nearest
    centroid (ivf_append) and fold them into the cluster-bucketed
    index (staged swap, vec_id-deduped → replay-idempotent)."""
    from flink_realtime_edu_spark.operators.similarity import ivf_append

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        check_bucket_layout(index_dir, n_buckets)
        centers = read_ivf_quantizer(spark, quantizer_dir)
        assigned = (
            ivf_append(batch_df, centers, id_col=id_col, vec_col=vec_col)
            .select(
                "nid",
                "cluster",
                F.col("cv").cast("array<float>").alias("cv"),
                F.lit(batch_id).cast("long").alias("first_seen_batch"),
            )
            .withColumn(BUCKET_COL, key_bucket_col(["cluster"], n_buckets))
            .persist()
        )
        try:
            touched = [
                r[0] for r in assigned.select(BUCKET_COL).distinct().collect()
            ]
            index = read_buckets(spark, index_dir, touched)
            if index is None:
                index = spark.createDataFrame([], INDEX_SCHEMA).withColumn(
                    BUCKET_COL, F.lit(0)
                )
            # crash-window duplicates are identical rows; a replayed
            # batch re-assigns identically (frozen centroids), so the
            # min_by keeps the FIRST batch's row and replay is a no-op
            merged = (
                index.unionByName(assigned)
                .groupBy("nid")
                .agg(
                    F.min_by(
                        F.struct(
                            "cluster", "cv", "first_seen_batch", BUCKET_COL
                        ),
                        "first_seen_batch",
                    ).alias("m")
                )
                .select(
                    "nid",
                    F.col("m.cluster").alias("cluster"),
                    F.col("m.cv").alias("cv"),
                    F.col("m.first_seen_batch").alias("first_seen_batch"),
                    F.col(f"m.{BUCKET_COL}").alias(BUCKET_COL),
                )
            )
            staged_swap_buckets(merged, index_dir, touched, batch_id)
        finally:
            assigned.unpersist()

    return write


def read_ivf_index(spark, index_dir: str) -> DataFrame:
    """The searchable (nid, cluster, cv) layout — feed it to
    ``operators.similarity._ivf_probe_search`` or
    ``operators.quantization.ivfpq_topk``."""
    dirs = sorted(
        str(p) for p in Path(index_dir).glob(f"{BUCKET_COL}=*") if p.is_dir()
    )
    if not dirs:
        raise FileNotFoundError(f"no index buckets under {index_dir}")
    return (
        spark.read.option("basePath", index_dir)
        .parquet(*dirs)
        .dropDuplicates(["nid"])
        .select("nid", "cluster", "cv")
    )
