"""Streaming DSIR scoring — the X7 quality-gate twin for ingest.

The production shape for data selection at 100 TB: the DSIR model
(the B-row per-feature log-ratio table, queries/training.py::
dsir_fit) is fit ONCE on the reference corpus in batch and frozen to
parquet; newly-crawled documents are scored as they arrive, each
micro-batch through the identical batch scorer (dsir_score) against
the frozen broadcast model. Stateless per batch — no streaming
aggregation state, no watermark: a document's weight depends only on
its own bigrams and the frozen model, so stream ≡ batch holds
per-document by construction and replaying a batch is a pure
overwrite (the deterministic per-batch output path, the
streaming_exact_dedup discipline).

Refreshing the model is a batch-side concern (refit, write to a new
path, restart the stream pointing at it) — exactly how a Flink job
would swap a broadcast-state model snapshot [R — family pattern].
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_dsir_model(wts: DataFrame, model_dir: str) -> None:
    """Freeze a fitted (f, lw) model table to parquet. Tiny by
    construction (≤ B = 4096 rows) — one file, no partitioning."""
    wts.coalesce(1).write.mode("overwrite").parquet(model_dir)


def streaming_dsir_scorer(
    model_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Build the foreachBatch function: score each micro-batch of
    (id, text) documents against the frozen DSIR model at
    ``model_dir`` and write (doc_id, n_feats, log_weight,
    target_like) under a deterministic per-batch path (replay-safe
    overwrite). Docs with < 2 tokens score NULL-free as zero-feature
    rows are simply absent — same contract as the batch query. The
    frozen model covers ALL 4096 buckets (dsir_fit emits the add-k
    smoothed log-ratio for buckets unseen at fit time), so a
    newly-crawled doc whose bigrams never appeared in the reference
    corpus still scores — with the smoothed out-of-vocabulary weight,
    not a silent zero (test-pinned with a planted novel doc)."""
    from flink_realtime_edu_spark.queries.training import (
        dsir_features,
        dsir_score,
    )

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        wts = spark.read.parquet(model_dir)
        docs = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        scored = dsir_score(dsir_features(docs), wts)
        scored.write.mode("overwrite").parquet(
            str(Path(out_dir) / f"batch_id={batch_id}")
        )

    return write


def write_quality_model(spark, w: list[int], model_dir: str) -> None:
    """Freeze fitted classifier weights (micro-units, e.g.
    quality_classifier_fit's final snapshot) to parquet as the
    (f, w) table the streaming scorer broadcasts."""
    spark.createDataFrame(list(enumerate(w)), "f long, w long").coalesce(
        1
    ).write.mode("overwrite").parquet(model_dir)


def streaming_quality_scorer(
    model_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """foreachBatch quality gate — the trained-classifier sibling of
    :func:`streaming_dsir_scorer` (the CCNet deployment shape: fit
    the fastText-style model once in batch, freeze it, gate the
    crawl as it arrives): each micro-batch of (id, text) documents
    is scored by the EXACT batch pipeline
    (queries/training.py::qc_quantized_features + qc_score — integer
    micro-unit quantization, broadcast 4097-row model, one per-doc
    hash aggregate) and written under a deterministic per-batch path
    (replay-safe overwrite). Stateless per batch, so stream ≡ batch
    holds per-document by construction; docs with < 2 tokens carry
    no bigram and are absent, the batch contract."""
    from flink_realtime_edu_spark.queries.training import (
        qc_quantized_features,
        qc_score,
    )

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        wdf = spark.read.parquet(model_dir)
        docs = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        qc_score(qc_quantized_features(docs), wdf).write.mode(
            "overwrite"
        ).parquet(str(Path(out_dir) / f"batch_id={batch_id}"))

    return write


def read_scored_output(spark, out_dir: str) -> DataFrame:
    """Read back the per-batch scores (plus the batch_id partition)."""
    return spark.read.option("basePath", out_dir).parquet(out_dir)
