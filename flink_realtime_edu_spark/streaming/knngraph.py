"""Streaming k-NN GRAPH maintenance — the incremental sibling of
``operators/similarity.knn_graph_lsh`` and the sixth ingest-tier sink
next to exact dedup, semantic dedup, DSIR scoring, quality gating,
and the IVF vector index (SURVEY.md §2.10 X6): newly-ingested
vectors are folded into a persisted top-k neighbor graph so a
growing corpus pays O(batch × bucket-mates) per micro-batch instead
of whole-graph rebuilds.

Shape: the LSH geometry (planes/tables/seed) is FROZEN at sink-build
time (the quantizer-freeze discipline of streaming/annindex.py —
re-tuning geometry for a grown corpus is the batch-side rebuild's
job). Two hash-bucketed stores under the staged-swap layout
(streaming/sinks.py):

- a TAG store keyed by LSH bucket id — (bkt, nid, vector), the
  bucket-mate candidate index;
- an EDGE store keyed by src — the current (src, dst, cos) top-k.

Per micro-batch: tag the new vectors (frozen hyperplanes), read ONLY
the touched tag buckets, score every directed (new → mate) pair once
with the exact ``cosine_pair_udf`` kernel and mirror the (mate → new)
direction for free (cosine is symmetric and the kernel's einsum is
bit-symmetric in its arguments), then merge the candidate edges into
the touched srcs' stored top-k under the shared
(cos desc, dst) comparator. Because every pair of bucket-mates is
scored exactly once — when the later of the two arrives — the FINAL
streamed state equals the batch ``knn_graph_lsh`` over the union
corpus BIT-EXACTLY (same kernel, same comparator; the stream ≡ batch
test pins it), for corpora below the batch path's occupancy cap.

Crash/replay contract (first-seen-wins discipline): edges swap
BEFORE tags. A replayed batch anti-joins the tag store and scores
nothing once its tags landed; in the one-sided crash window (edges
swapped, tags not) the replay re-scores and re-merges IDENTICAL
edges — dropDuplicates + the top-k window make that a no-op. A
staged-swap crash can leave a bucket with old+new files whose rows
are NOT identical (a displaced edge survives in the old file); that
is safe by the comparator: a displaced edge ranks strictly below
whatever displaced it, so the read-side top-k re-rank
(:func:`read_knn_graph`, also applied before every merge) always
re-selects the merged winners.

Mega-cluster note: the streaming path maintains the UNCAPPED
bucket-mate top-k — per-batch cost degrades if the corpus grows a
bucket past what the frozen geometry assumed, and the answer is the
same as for the IVF sink: rebuild batch-side with re-tuned geometry
(knn_graph_lsh's adaptive planes + occupancy cap) and restart the
stream against fresh stores.

SINGLE-WRITER / LOCAL-FS assumption as documented in
streaming/dedup.py (POSIX rename staged swaps, one live writer per
store root).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_realtime_edu_spark.streaming.sinks import (
    BUCKET_COL,
    check_bucket_layout,
    key_bucket_col,
    read_buckets,
    staged_swap_buckets,
)

TAGS_SCHEMA = "bkt bigint, nid bigint, v array<float>, first_seen_batch bigint"
EDGES_SCHEMA = "src bigint, dst bigint, cos double"


def _fold_edges(edges: DataFrame, k: int) -> DataFrame:
    """Crash-window fold + rank: collapse duplicate (src, dst) rows
    (identical cos by determinism) and keep the top-k per src under
    the shared comparator — stale displaced edges rank below their
    displacers, so this always re-selects the merged winners."""
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst"))
    return (
        edges.dropDuplicates(["src", "dst"])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def read_knn_graph(spark, edges_dir: str, k: int = 5) -> DataFrame:
    """The queryable (src, dst, cos) top-k graph — crash-window
    folded exactly like every merge reads it."""
    from pathlib import Path

    dirs = sorted(
        str(p) for p in Path(edges_dir).glob(f"{BUCKET_COL}=*") if p.is_dir()
    )
    if not dirs:
        raise FileNotFoundError(f"no edge buckets under {edges_dir}")
    df = spark.read.option("basePath", edges_dir).parquet(*dirs)
    return _fold_edges(df.select("src", "dst", "cos"), k)


def streaming_knn_graph(
    tags_dir: str,
    edges_dir: str,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    n_buckets: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Build the foreachBatch function (module docstring has the
    contract). ``n_planes`` is explicit, not adaptive: the geometry
    is frozen for the stream's lifetime and re-tuned only by a
    batch-side rebuild."""
    from flink_realtime_edu_spark.operators.similarity import (
        cosine_pair_udf,
        hyperplane_buckets,
    )

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        check_bucket_layout(tags_dir, n_buckets)
        check_bucket_layout(edges_dir, n_buckets)
        dim_row = batch_df.select(vec_col).first()
        if dim_row is None:
            return  # empty batch
        bkts = hyperplane_buckets(n_planes, len(dim_row[0]), n_tables, seed)
        tagged = (
            batch_df.select(
                F.col(id_col).alias("nid"),
                F.col(vec_col).cast("array<float>").alias("v"),
            )
            .select("nid", "v", F.explode(bkts(F.col("v"))).alias("bkt"))
            .withColumn(BUCKET_COL, key_bucket_col(["bkt"], n_buckets))
            .persist()
        )
        pinned = [tagged]
        try:
            touched_tags = [
                r[0] for r in tagged.select(BUCKET_COL).distinct().collect()
            ]
            tags = read_buckets(spark, tags_dir, touched_tags)
            if tags is None:
                tags = spark.createDataFrame([], TAGS_SCHEMA).withColumn(
                    BUCKET_COL, F.lit(0)
                )
            tags = tags.dropDuplicates(["nid", "bkt"])
            # replay discipline: a vector whose tags already landed
            # scores nothing (its edges landed first — see ordering)
            new_tags = tagged.join(
                tags.select("nid").distinct(), on="nid", how="left_anti"
            ).persist()
            pinned.append(new_tags)
            # candidates: new × (stored-mates ∪ batch-mates), scored
            # once per directed pair; a pair matching in several
            # tables dedupes before the kernel runs
            mates = tags.select("bkt", "nid", "v").unionByName(
                new_tags.select("bkt", "nid", "v")
            )
            pairs = (
                new_tags.select(
                    "bkt", F.col("nid").alias("src"), F.col("v").alias("sv")
                )
                .join(
                    mates.select(
                        "bkt", F.col("nid").alias("dst"), F.col("v").alias("dv")
                    ),
                    on="bkt",
                )
                .filter(F.col("src") != F.col("dst"))
                .dropDuplicates(["src", "dst"])
            )
            scored = pairs.select(
                "src",
                "dst",
                cosine_pair_udf()(F.col("sv"), F.col("dv")).alias("cos"),
            ).persist()
            pinned.append(scored)
            # mirror the (old-mate ← new) direction — every scored row
            # has a NEW src; new↔new pairs appear in both directions
            # already (both ends are srcs), so only rows whose dst is
            # an OLD mate need the swap (same cos — the kernel is
            # bit-symmetric in its arguments)
            new_ids = new_tags.select("nid").distinct()
            candidates = scored.unionByName(
                scored.join(
                    new_ids.withColumnRenamed("nid", "dst"),
                    on="dst",
                    how="left_anti",  # dst is OLD ⇒ it needs the mirror
                ).select(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                    "cos",
                )
            ).withColumn(BUCKET_COL, key_bucket_col(["src"], n_buckets))
            touched_edges = [
                r[0]
                for r in candidates.select(BUCKET_COL).distinct().collect()
            ]
            existing = read_buckets(spark, edges_dir, touched_edges)
            if existing is None:
                existing = spark.createDataFrame([], EDGES_SCHEMA).withColumn(
                    BUCKET_COL, F.lit(0)
                )
            merged = _fold_edges(
                existing.select("src", "dst", "cos").unionByName(
                    candidates.select("src", "dst", "cos")
                ),
                k,
            ).withColumn(BUCKET_COL, key_bucket_col(["src"], n_buckets))
            # EDGES FIRST, tags second: the replay no-op hinges on a
            # replayed batch either finding its tags absent (re-merge
            # of identical edges — idempotent) or present (nothing to
            # score); tags landing before edges would lose the
            # crash-window batch's edges forever.
            if touched_edges:
                staged_swap_buckets(merged, edges_dir, touched_edges, batch_id)
            merged_tags = (
                tags.select("bkt", "nid", "v", "first_seen_batch")
                .unionByName(
                    new_tags.select(
                        "bkt",
                        "nid",
                        "v",
                        F.lit(batch_id).cast("long").alias("first_seen_batch"),
                    )
                )
                .dropDuplicates(["nid", "bkt"])
                .withColumn(BUCKET_COL, key_bucket_col(["bkt"], n_buckets))
            )
            if touched_tags:
                staged_swap_buckets(merged_tags, tags_dir, touched_tags, batch_id)
        finally:
            for df in pinned:
                df.unpersist()

    return write
