"""Sequence packing + token-budget sampling — LLM pretraining batch
construction over the documents table (SURVEY.md §2.10 X7 extensions).

Two batch-construction primitives every large-scale training-data
pipeline needs downstream of cleaning/dedup:

- ``sequence_packing_chunks``: concatenate-and-chunk packing — the
  standard pretraining scheme where the per-source token stream is
  cut into fixed-size context windows and documents flow across
  chunk boundaries. The mapping (which chunk a doc starts in, at
  what offset, how many chunks it spans) is exactly what a packed-
  dataset writer needs to emit examples.
- ``token_budget_sample``: deterministic subsampling to a per-source
  token budget — order docs by a content-independent md5 shuffle,
  keep the prefix whose running token sum fits the budget. The
  hash-ordered prefix makes the sample reproducible across runs and
  engines (no RNG state), the property that matters for auditable
  data recipes.

Scale posture: running sums are computed TWO-LEVEL so parallelism
is #(source × shard), not #sources — a naive per-source window is a
single reducer per source, which dies when one source holds most of
100 TB. Shards are ranges of the ordering key itself (doc_id ranges
for packing, shuffle-key prefixes for sampling), so
(shard, key) order ≡ key order and the sharded prefix sum is
EXACTLY the per-source prefix sum: local window inside each
(source, shard) + a broadcast join against the shard-offset frame
(one tiny window over per-shard totals). No global ordering, no
collect; token counts ride the scan that computes them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_realtime_edu_spark.queries import register
from flink_realtime_edu_spark.sources import load

_CTX = 2048  # context window (tokens) for packing
_BUDGET = 20_000  # per-source token budget for sampling
_SHARD_SPAN = 64  # doc_ids per packing shard (at scale: ~1e6 per shard)

_NTOK = "greatest(len(string_split(text, ' ')), 1)"


def _sharded_cum_before(t: DataFrame, shard_col, order_cols: list[str]) -> DataFrame:
    """Exclusive per-source running token sum, computed two-level:
    `shard_col` must be a RANGE of the ordering key (so that
    (shard, order) sorts identically to (order) alone — the
    equivalence that makes this exact, not approximate). Local
    exclusive sums run inside each (source, shard); shard offsets
    come from one window over the per-shard totals frame (rows =
    #shards — broadcast back). Adds `cum_before`."""
    t = t.withColumn("__shard", shard_col)
    w_local = (
        Window.partitionBy("source", "__shard")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = t.withColumn(
        "local_before", F.coalesce(F.sum("n_toks").over(w_local), F.lit(0))
    )
    w_off = (
        Window.partitionBy("source")
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        t.groupBy("source", "__shard")
        .agg(F.sum("n_toks").alias("shard_toks"))
        .withColumn("offset", F.coalesce(F.sum("shard_toks").over(w_off), F.lit(0)))
        .select("source", "__shard", "offset")
    )
    return (
        local.join(F.broadcast(offsets), on=["source", "__shard"])
        .withColumn("cum_before", F.col("offset") + F.col("local_before"))
        .drop("__shard", "local_before", "offset")
    )


@register(
    "sequence_packing_chunks",
    survey_rows=("X7", "W4", "F2"),
    oracle=f"""
WITH t AS (
  SELECT source, doc_id, {_NTOK} AS n_toks FROM documents
), c AS (
  SELECT source, doc_id, n_toks,
         COALESCE(SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
)
SELECT source, doc_id, n_toks,
       CAST(cum_before // {_CTX} AS BIGINT) AS start_chunk,
       CAST(cum_before % {_CTX} AS BIGINT) AS start_offset,
       CAST((cum_before + n_toks - 1) // {_CTX} - cum_before // {_CTX} + 1 AS BIGINT)
         AS n_chunks_spanned
FROM c
""",
)
def sequence_packing_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk sequence packing (context = 2048 tokens):
    per source, documents are laid head-to-tail in doc_id order and
    the token stream is cut every 2048 tokens; each doc reports its
    starting chunk, offset within it, and how many chunks it spans.
    The doc_id order makes the layout deterministic and
    restart-stable (a salted or arrival order would re-pack
    differently every run); the running sum is the two-level sharded
    form (_sharded_cum_before, shards = doc_id ranges) so one huge
    source never serializes onto one reducer."""
    d = load(spark, sf_dir, "documents")
    # cast: size() is INT but the oracle's len(string_split()) is
    # BIGINT — the driver's value hash is type-sensitive.
    n_toks = F.greatest(F.size(F.split("text", " ")), F.lit(1)).cast("bigint")
    t = d.select("source", "doc_id", n_toks.alias("n_toks"))
    # `div`, not `/`: float division loses low bits past 2^53 — a
    # per-source token stream a 100 TB corpus can actually reach —
    # and would disagree with both the exact `%` next to it and the
    # oracle's integer `//`.
    c = _sharded_cum_before(t, F.expr(f"doc_id div {_SHARD_SPAN}"), ["doc_id"])
    return c.select(
        "source",
        "doc_id",
        "n_toks",
        F.expr(f"cum_before div {_CTX}").alias("start_chunk"),
        (F.col("cum_before") % _CTX).cast("bigint").alias("start_offset"),
        F.expr(f"(cum_before + n_toks - 1) div {_CTX}").alias("end_chunk"),
    ).select(
        "source",
        "doc_id",
        "n_toks",
        "start_chunk",
        "start_offset",
        (F.col("end_chunk") - F.col("start_chunk") + 1).alias("n_chunks_spanned"),
    )


_CHUNK = 256  # tokens per chunk
_STRIDE = 192  # chunk start stride (64-token overlap)


@register(
    "doc_chunking_windows",
    survey_rows=("X7", "X1", "F5", "F8"),
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w, {_NTOK} AS n_toks FROM documents
), c AS (
  SELECT doc_id, w, n_toks,
         CASE WHEN n_toks <= {_CHUNK} THEN 1
              ELSE 1 + CAST(ceil((n_toks - {_CHUNK}) / {_STRIDE}.0) AS BIGINT)
         END AS n_chunks
  FROM t
)
SELECT doc_id, CAST(i - 1 AS BIGINT) AS chunk_id,
       CAST(least(n_toks - (i - 1) * {_STRIDE}, {_CHUNK}) AS BIGINT)
         AS n_chunk_toks,
       md5(array_to_string(
             list_slice(w, (i - 1) * {_STRIDE} + 1,
                        least((i - 1) * {_STRIDE} + {_CHUNK}, n_toks)), ' '))
         AS chunk_md5
FROM c, unnest(generate_series(1, n_chunks)) g(i)
""",
)
def doc_chunking_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (256-token chunks, stride 192
    → 64-token overlap): the long-document complement of sequence
    packing — embedding pipelines and context-window training both
    split oversized docs this way. Emits one row per (doc, chunk)
    with the chunk's token count and the md5 of its text (the oracle
    verifies CONTENT, not just arithmetic: DuckDB re-slices the same
    token windows and must reproduce every hash).

    All higher-order functions: sequence → transform(slice) builds
    the chunk array per row, one explode — no UDF, no shuffle before
    the explode, and the final row count is Σ n_chunks, never
    tokens × chunks."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.greatest(F.size(toks), F.lit(1))
    n_chunks = F.when(n <= _CHUNK, F.lit(1)).otherwise(
        1 + F.ceil((n - _CHUNK) / F.lit(float(_STRIDE))).cast("bigint")
    )
    chunk = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.struct(
            (i - 1).cast("bigint").alias("chunk_id"),
            F.least(n - (i - 1) * _STRIDE, F.lit(_CHUNK))
            .cast("bigint")
            .alias("n_chunk_toks"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice(
                        toks,
                        (i - 1) * _STRIDE + 1,
                        F.least(F.lit(_CHUNK), n - (i - 1) * _STRIDE),
                    ),
                )
            ).alias("chunk_md5"),
        ),
    )
    return d.select("doc_id", F.explode(chunk).alias("c")).select(
        "doc_id", "c.chunk_id", "c.n_chunk_toks", "c.chunk_md5"
    )


@register(
    "curated_packing_manifest",
    survey_rows=("X4", "X7", "A1", "F3"),
    oracle=f"""
WITH scored AS (
  SELECT doc_id, source, text, string_split(text, ' ') AS toks
  FROM documents
), good AS (
  SELECT * FROM scored
  WHERE len(toks) BETWEEN 20 AND 80
    AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) > 0.5
), canon AS (
  SELECT MIN(doc_id) AS doc_id FROM good GROUP BY md5(text)
), uniq AS (
  SELECT * FROM good WHERE doc_id IN (SELECT doc_id FROM canon)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
       CAST(ceil(SUM(len(toks)) / {_CTX}.0) AS BIGINT) AS n_chunks,
       ROUND(SUM(len(toks)) / (ceil(SUM(len(toks)) / {_CTX}.0) * {_CTX}.0), 6)
         AS fill_ratio
FROM uniq GROUP BY source
""",
)
def curated_packing_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition demo: the curation front half (quality filter +
    exact dedup, the corpus_curation_pipeline rules) feeding the
    packing back half — per source, the surviving doc/token counts,
    how many 2048-token context windows the survivors pack into, and
    the fill ratio (packing efficiency the last short chunk costs).
    One composed Catalyst plan: filter prunes before any shuffle,
    dedup shuffles (hash, id) pairs, the manifest is a plain
    aggregate — the per-doc chunk mapping stays
    ``sequence_packing_chunks``'s job."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    good = d.filter(n.between(20, 80) & (ttr > 0.5))
    canon = good.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    uniq = good.join(canon.select("doc_id"), on="doc_id", how="left_semi")
    total = F.sum(n.cast("bigint"))
    n_chunks = F.ceil(total / F.lit(float(_CTX)))
    return uniq.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        total.alias("total_tokens"),
        n_chunks.cast("bigint").alias("n_chunks"),
        F.round(total / (n_chunks * F.lit(float(_CTX))), 6).alias("fill_ratio"),
    )


@register(
    "token_budget_sample",
    survey_rows=("X7", "F8", "A2"),
    oracle=f"""
WITH t AS (
  SELECT source, doc_id, {_NTOK} AS n_toks,
         md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
  FROM documents
), c AS (
  SELECT source, n_toks,
         SUM(n_toks) OVER (PARTITION BY source ORDER BY shuffle_key, doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT source,
       CAST(COUNT(*) FILTER (WHERE cum <= {_BUDGET}) AS BIGINT) AS n_docs_kept,
       CAST(COALESCE(SUM(n_toks) FILTER (WHERE cum <= {_BUDGET}), 0) AS BIGINT)
         AS tokens_kept,
       CAST(COUNT(*) AS BIGINT) AS n_docs_total
FROM c GROUP BY source
""",
)
def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-budget subsample: per source, order docs
    by md5(doc_id) (a reproducible shuffle — no RNG state, identical
    across engines and runs) and keep the prefix whose running token
    sum stays within a 20k-token budget. Emits per-source kept/total
    accounting — the recipe audit a mixture-weighted corpus build
    records. Bernoulli-style md5-threshold sampling (rate-based, not
    budget-based) is the sibling ``mixture_sample_by_source``.

    The running sum is two-level sharded on the first hex char of
    the shuffle key (a PREFIX of the ordering key, so shard order ≡
    key order and the result is exact — 16-way parallel per source;
    widen the prefix for more)."""
    d = load(spark, sf_dir, "documents")
    n_toks = F.greatest(F.size(F.split("text", " ")), F.lit(1))
    t = d.select(
        "source",
        "doc_id",
        n_toks.alias("n_toks"),
        F.md5(F.col("doc_id").cast("string")).alias("shuffle_key"),
    )
    c = _sharded_cum_before(
        t, F.substring("shuffle_key", 1, 1), ["shuffle_key", "doc_id"]
    ).withColumn("cum", F.col("cum_before") + F.col("n_toks"))
    kept = F.col("cum") <= _BUDGET
    return c.groupBy("source").agg(
        F.sum(kept.cast("bigint")).alias("n_docs_kept"),
        F.coalesce(
            F.sum(F.when(kept, F.col("n_toks"))), F.lit(0)
        ).cast("bigint").alias("tokens_kept"),
        F.count(F.lit(1)).alias("n_docs_total"),
    )
