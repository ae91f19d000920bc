"""Training-set assembly operators — epoch shuffling, stratified
splits, and incremental (delta-vs-corpus) dedup (SURVEY.md §2.10
X4/X7 extensions).

The three jobs that sit between a curated corpus and a training run:

- ``training_shuffle_manifest``: a deterministic global epoch shuffle
  expressed as (shard, position) — the layout a sharded dataset
  writer materializes so every epoch reads the same pseudo-random
  order with NO global sort.
- ``stratified_split_by_source``: reproducible train/val/test
  assignment stratified per source, by content-independent hash
  thresholds (no RNG state; rerunning on the grown corpus keeps
  every old doc's assignment stable — the property that prevents
  silent eval-set contamination over time).
- ``incremental_dedup_delta``: dedup a NEW ingest batch against the
  existing corpus without re-deduping the world — the only form of
  exact dedup that stays affordable once the corpus is 100 TB and
  the daily delta is 0.1% of it.

All hashes here are the dual-engine md5-60bit twin
(operators/dedup.py::md5_hash60), so every query is exactly
DuckDB-oracle-checked — same buckets, same order, same assignments.

Scale posture: no query here sorts globally. The epoch shuffle
ranks WITHIN hash shards (parallelism = n_shards; shard sizes are
balanced by the hash, so no skew); the split and the delta dedup
shuffle only (hash, id) pairs, never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_realtime_edu_spark.operators.dedup import md5_hash60
from flink_realtime_edu_spark.queries import register
from flink_realtime_edu_spark.sources import load

_EPOCH_SEED = "ep1"
_N_SHARDS = 16

# DuckDB twin of operators/dedup.py::md5_hash60 (60-bit positive int
# from the first 15 md5 hex chars — identical in both engines).
_H60 = "CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


@register(
    "training_shuffle_manifest",
    survey_rows=("X7", "F8", "W1"),
    oracle=f"""
WITH keyed AS (
  SELECT doc_id,
         greatest(len(string_split(text, ' ')), 1) AS n_toks,
         {_H60.format(expr=f"concat('{_EPOCH_SEED}:', doc_id)")} AS shuffle_key
  FROM documents
)
SELECT CAST(shuffle_key % {_N_SHARDS} AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shuffle_key % {_N_SHARDS}
                               ORDER BY shuffle_key) AS BIGINT) AS position,
       doc_id, n_toks
FROM keyed
""",
)
def training_shuffle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle as a (shard, position) manifest:
    shuffle_key = md5(seed:doc_id) gives every doc a pseudo-random
    but reproducible rank; shard = key mod 16 buckets the order so
    ranking runs per-shard (one window per hash bucket — parallelism
    = n_shards, balanced by construction), and a training reader
    that walks shards round-robin by position sees a uniform
    permutation. Changing the seed string re-shuffles every epoch;
    no RNG state, no global sort, no collect. At 100 TB this is the
    dataset-writer layout: n_shards scales to the writer parallelism
    and each shard's rank is an independent task."""
    d = load(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        # cast: size() is INT but the oracle's len() is BIGINT — the
        # driver's value hash is type-sensitive.
        F.greatest(F.size(F.split("text", " ")), F.lit(1))
        .cast("bigint")
        .alias("n_toks"),
        md5_hash60(F.concat(F.lit(f"{_EPOCH_SEED}:"), F.col("doc_id"))).alias(
            "shuffle_key"
        ),
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key")
    return (
        keyed.withColumn("shard", (F.col("shuffle_key") % _N_SHARDS).cast("bigint"))
        .withColumn("position", F.row_number().over(w).cast("bigint"))
        .select("shard", "position", "doc_id", "n_toks")
    )


@register(
    "stratified_split_by_source",
    survey_rows=("X7", "F8", "A1", "F4"),
    oracle=f"""
WITH assigned AS (
  SELECT source,
         greatest(len(string_split(text, ' ')), 1) AS n_toks,
         CASE WHEN {_H60.format(expr="concat('split:', doc_id)")} % 100 < 90
                THEN 'train'
              WHEN {_H60.format(expr="concat('split:', doc_id)")} % 100 < 95
                THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT source, split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       ROUND(COUNT(*) * 1.0 /
             SUM(COUNT(*)) OVER (PARTITION BY source), 6) AS doc_share
FROM assigned GROUP BY source, split
""",
)
def stratified_split_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test split (90/5/5) stratified by
    source: assignment = md5('split:'doc_id) mod 100 thresholds —
    content-independent, so text edits never move a doc across
    splits, and hash-stable, so regenerating on a grown corpus
    keeps every existing assignment (the property that keeps eval
    sets uncontaminated across corpus versions). Output is the
    per-(source, split) manifest: doc/token counts and the realized
    doc share (which converges on 0.90/0.05/0.05 as n grows — the
    small-sf deviation is the expected binomial noise, not a bug).
    Pure hash + aggregate: one shuffle on (source, split), text
    never shuffles."""
    d = load(spark, sf_dir, "documents")
    h = md5_hash60(F.concat(F.lit("split:"), F.col("doc_id"))) % 100
    assigned = d.select(
        "source",
        F.greatest(F.size(F.split("text", " ")), F.lit(1)).alias("n_toks"),
        F.when(h < 90, "train").when(h < 95, "val").otherwise("test").alias(
            "split"
        ),
    )
    counts = assigned.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
    )
    w_src = Window.partitionBy("source")
    return counts.select(
        "source",
        "split",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w_src), 6).alias(
            "doc_share"
        ),
    )


@register(
    "incremental_dedup_delta",
    survey_rows=("X4", "F8", "J6", "A9"),
    oracle="""
WITH delta AS (
  SELECT doc_id, md5(text) AS text_md5 FROM documents WHERE doc_id % 10 = 7
), corpus AS (
  SELECT DISTINCT md5(text) AS text_md5 FROM documents WHERE doc_id % 10 <> 7
), canon AS (
  SELECT text_md5, MIN(doc_id) AS keep_id FROM delta GROUP BY 1
)
SELECT d.doc_id, d.text_md5,
       CASE WHEN c.text_md5 IS NOT NULL THEN 'dup_of_corpus'
            WHEN d.doc_id <> k.keep_id THEN 'dup_in_delta'
            ELSE 'kept' END AS status
FROM delta d
LEFT JOIN corpus c ON c.text_md5 = d.text_md5
JOIN canon k ON k.text_md5 = d.text_md5
""",
)
def incremental_dedup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup: treat doc_id % 10 = 7 as today's
    ingest batch (the delta) and the rest as the existing corpus's
    content-hash index. Each delta doc is classified: duplicate of a
    corpus doc (hash present in the index), duplicate within the
    delta (a smaller delta doc_id owns the hash), or kept. This is
    the O(|delta|) dedup shape that replaces whole-corpus re-dedup
    once the corpus dwarfs the daily ingest: the corpus side is the
    persisted DISTINCT-hash index (hashes only — at 100 TB of text
    that index is ~0.03% of corpus bytes), the join keys are hashes,
    and the delta-internal canonicalization is a groupBy on the same
    hash. Text bytes never shuffle; both joins hash-partition on
    text_md5, and at real scale the delta side is the small build
    side of the probe into the bucketed index."""
    d = load(spark, sf_dir, "documents")
    delta = d.filter(F.col("doc_id") % 10 == 7).select(
        "doc_id", F.md5("text").alias("text_md5")
    )
    corpus_idx = (
        d.filter(F.col("doc_id") % 10 != 7)
        .select(F.md5("text").alias("text_md5"))
        .distinct()
        .withColumn("in_corpus", F.lit(True))
    )
    canon = delta.groupBy("text_md5").agg(F.min("doc_id").alias("keep_id"))
    return (
        delta.join(corpus_idx, on="text_md5", how="left")
        .join(canon, on="text_md5")
        .select(
            "doc_id",
            "text_md5",
            F.when(F.col("in_corpus"), "dup_of_corpus")
            .when(F.col("doc_id") != F.col("keep_id"), "dup_in_delta")
            .otherwise("kept")
            .alias("status"),
        )
    )
