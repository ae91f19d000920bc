"""Streaming incremental SemDeDup — the X5/X6 embedding sibling of
streaming/dedup.py (incremental EXACT dedup): newly-ingested vectors
are semantically deduped against every survivor that arrived before
them, without ever re-clustering the corpus.

Semantics (and how they relate to the batch operator
``operators/similarity.py::semantic_dedup``): the batch form closes
the full within-block duplicate graph and keeps one vector per
connected component; the incremental form maintains the same KEPT-SET
INVARIANT — no two kept vectors in a block are within `threshold` of
each other (a direct pair ≥ threshold never survives in either form)
— but assigns duplicates by DIRECT edge to an already-kept survivor
(greedy maximal-independent-set order: index survivors first, then
batch vectors in ascending id). Transitive chains that batch
components would merge can therefore keep one extra representative
here; that is the standard price of single-pass ingest dedup, and it
is exactly what makes CRASH-REPLAY IDEMPOTENT: every duplicate has a
direct ≥-threshold edge to a vector that is IN the index, so
replaying the LAST batch (the only replay Structured Streaming
performs — the uncommitted one) re-finds every classification from
the index probe alone (a replayed survivor matches itself; a
replayed duplicate matches its recorded survivor — never a chain
that no longer exists). Byte-identical replay additionally needs the
probe tie-break to prefer PRE-batch survivors over this batch's own
(already-swapped-in) survivors — see the min_by key in
``streaming_semantic_dedup`` — otherwise a dup_of_corpus that is
also near a smaller-id same-batch survivor would be relabeled
dup_in_batch on replay. The guarantee is scoped to last-batch
replay: MANUALLY re-running an OLDER batch after later batches have
grown the index can resolve a duplicate to a smaller-id survivor
added since (min-id tie-break over a larger survivor set) and
rewrite that batch's output differently — the same manual-replay
caveat as streaming/dedup.py's single-writer note, stated here
because the survivor set grows while a hash index only gains
disjoint keys.

State is the survivor index: a block-bucketed parquet table of kept
vectors (the streaming/sinks.py bucket store — per batch only touched
buckets are read and rewritten, staged-swap crash discipline). Per
batch the work is O(|batch| × survivors-in-touched-blocks): blocks
must stay bounded, the same contract as the batch operator (SemDeDup
clusters are ~10k vectors; at that size the probe is a handful of
Arrow-batched matmuls).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
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
    "vec_id bigint, block bigint, embedding array<float>, "
    "first_seen_batch bigint"
)
_OUT_SCHEMA = (
    "vec_id long, block long, embedding array<float>, "
    "survivor_id long, survivor_batch long, status string"
)


def _greedy_block_dedup(threshold: float, batch_id: int):
    """applyInPandas fn: greedy MIS over one block's REMAINDER (the
    vectors with no direct ≥-threshold edge to an index survivor), in
    ascending vec_id order — the deterministic arrival-order stand-in.
    Vectorized: each candidate scores against the kept matrix in one
    einsum contraction (same accumulation as cosine_pair_udf)."""
    from flink_realtime_edu_spark.operators.similarity import _round_half_up

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        norms[norms == 0.0] = 1.0
        kept_rows: list[int] = []
        survivor = np.full(len(pdf), -1, dtype=np.int64)
        for i in range(len(pdf)):
            if kept_rows:
                # einsum with the SAME subscripts/dtype as
                # cosine_pair_udf's scorer, so the rounded value of a
                # pair is identical whichever path scores it (a
                # BLAS matvec here could round a knife-edge pair
                # differently at the 6th decimal and break the
                # kept-set invariant across probe vs greedy)
                kmat = mat[kept_rows]
                bi = np.broadcast_to(mat[i], kmat.shape)
                cos = _round_half_up(
                    np.einsum("ij,ij->i", kmat, bi)
                    / (norms[kept_rows] * norms[i])
                )
                hit = np.nonzero(cos >= threshold)[0]
                if hit.size:
                    # min kept vec_id among hits (kept_rows is id-ordered)
                    survivor[i] = pdf["vec_id"].iloc[kept_rows[hit[0]]]
                    continue
            kept_rows.append(i)
            survivor[i] = pdf["vec_id"].iloc[i]
        out = pdf[["vec_id", "block", "embedding"]].copy()
        out["survivor_id"] = survivor
        out["survivor_batch"] = np.int64(batch_id)
        out["status"] = np.where(
            survivor == pdf["vec_id"].to_numpy(), "kept", "dup_in_batch"
        )
        return out

    return fn


def streaming_semantic_dedup(
    index_dir: str,
    out_dir: str,
    threshold: float,
    n_buckets: int = 8,
    id_col: str = "vec_id",
    block_col: str = "block",
    vec_col: str = "embedding",
):
    """Build the foreachBatch function: classify each micro-batch of
    (id, block, embedding) vectors against the survivor index —
    `kept` / `dup_in_batch` / `dup_of_corpus`, with the survivor id
    recorded — append the batch's new survivors to the index
    (staged-swap), and write the classification under a deterministic
    per-batch path (replay overwrites)."""
    from flink_realtime_edu_spark.operators.similarity import cosine_pair_udf

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        check_bucket_layout(index_dir, n_buckets)
        vecs = (
            batch_df.select(
                F.col(id_col).cast("long").alias("vec_id"),
                F.col(block_col).cast("long").alias("block"),
                F.col(vec_col).cast("array<float>").alias("embedding"),
            )
            .withColumn(BUCKET_COL, key_bucket_col(["block"], n_buckets))
            .persist()
        )
        try:
            touched = [r[0] for r in vecs.select(BUCKET_COL).distinct().collect()]
            index = read_buckets(spark, index_dir, touched)
            if index is None:
                index = spark.createDataFrame([], INDEX_SCHEMA).withColumn(
                    BUCKET_COL, F.lit(0)
                )
            # crash-window duplicates are identical rows — fold away
            index = index.dropDuplicates(["vec_id", "block"])

            # 1) direct probe against index survivors (block-local)
            surv = index.select(
                F.col("vec_id").alias("s_id"),
                "block",
                F.col("embedding").alias("s_emb"),
                F.col("first_seen_batch").alias("s_batch"),
            )
            # .asNondeterministic(): optimizer fence only (the kernel
            # is deterministic) — stops the threshold filter from
            # being pushed below the projection, which re-evaluated
            # the scorer for every surviving row (guide §4.4; same
            # fix as embedding_near_duplicates, r13).
            scored = (
                vecs.join(surv, on="block")
                .withColumn(
                    "cos",
                    cosine_pair_udf().asNondeterministic()(
                        F.col("embedding"), F.col("s_emb")
                    ),
                )
                .filter(F.col("cos") >= F.lit(threshold))
            )
            # Tie-break prefers PRE-batch survivors (then min s_id):
            # on last-batch replay the index already holds this
            # batch's survivors, and a plain min-s_id could re-route
            # a dup_of_corpus onto a smaller-id SAME-batch survivor,
            # flipping its status to dup_in_batch — replay would not
            # be byte-identical (ADVICE r10). Pre-batch-first makes a
            # replayed dup_of_corpus re-find its original corpus
            # survivor; among same-batch survivors plain min s_id is
            # exactly the greedy pass's first-hit choice. On a first
            # (non-replay) run no same-batch survivor is in the index
            # yet, so the key reduces to min s_id — unchanged.
            hits = scored.groupBy("vec_id").agg(
                F.min_by(
                    F.struct("s_id", "s_batch"),
                    F.struct(
                        (F.col("s_batch") == F.lit(batch_id)).cast("int"),
                        F.col("s_id"),
                    ),
                ).alias("m")
            ).select(
                "vec_id",
                F.col("m.s_id").alias("survivor_id"),
                F.col("m.s_batch").alias("survivor_batch"),
            )
            matched = vecs.join(hits, "vec_id").select(
                "vec_id", "block", "embedding", "survivor_id",
                "survivor_batch",
                F.when(F.col("survivor_id") == F.col("vec_id"), "kept")
                .when(F.col("survivor_batch") == batch_id, "dup_in_batch")
                .otherwise("dup_of_corpus")
                .alias("status"),
            )

            # 2) greedy MIS over the remainder, per block
            remainder = vecs.join(hits, "vec_id", "left_anti")
            rem_out = remainder.select(
                "vec_id", "block", "embedding"
            ).groupBy("block").applyInPandas(
                _greedy_block_dedup(threshold, batch_id), schema=_OUT_SCHEMA
            )

            out = matched.unionByName(rem_out).select(
                "vec_id", "block", "survivor_id", "survivor_batch", "status"
            )
            out.write.mode("overwrite").parquet(
                str(Path(out_dir) / f"batch_id={batch_id}")
            )

            # 3) append the batch's NEW survivors (greedy kept only —
            # an index-probe 'kept' is a replayed row already present)
            new_keep = (
                rem_out.filter(F.col("status") == "kept")
                .select(
                    "vec_id", "block", "embedding",
                    F.lit(batch_id).cast("long").alias("first_seen_batch"),
                )
                .withColumn(BUCKET_COL, key_bucket_col(["block"], n_buckets))
            )
            merged = (
                index.unionByName(new_keep)
                .dropDuplicates(["vec_id", "block"])
            )
            staged_swap_buckets(merged, index_dir, touched, batch_id)
        finally:
            vecs.unpersist()

    return write


def read_semdedup_output(spark, out_dir: str) -> DataFrame:
    """Per-batch classifications (vec_id, block, survivor_id,
    survivor_batch, status, batch_id)."""
    return spark.read.option("basePath", out_dir).parquet(out_dir)


def read_semdedup_index(spark, index_dir: str) -> DataFrame:
    """The survivor index (vec_id, block, embedding,
    first_seen_batch)."""
    dirs = sorted(
        str(p) for p in Path(index_dir).glob(f"{BUCKET_COL}=*") if p.is_dir()
    )
    if not dirs:
        raise FileNotFoundError(f"no index buckets under {index_dir}")
    return (
        spark.read.option("basePath", index_dir)
        .parquet(*dirs)
        .dropDuplicates(["vec_id", "block"])
    )
