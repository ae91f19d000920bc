"""Embedding similarity search — SURVEY.md §2.10 X6.

North-star operator (BASELINE.json): top-k cosine neighbors over an
`array<float>` embedding column.

Two paths, as the north star prescribes:

- ``cosine_topk`` — brute force, the correctness baseline. Queries
  are broadcast against the corpus; the corpus is scanned ONCE, the
  per-pair cosine stays in whole-stage codegen (higher-order
  functions, no UDF), and ranking happens per query id. Cost is
  O(|Q|·|corpus|): fine for |Q| ≪ corpus, which is the batch-scoring
  shape; NOT for all-pairs.
- ``lsh_cosine_topk`` — the scale path: random-hyperplane LSH
  buckets (sign bits of h·x), candidates only form inside buckets,
  then exact cosine re-ranks candidates. Recall < 1 by construction;
  tests measure it against brute force. Hyperplanes are generated
  from a fixed seed so results are deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from flink_realtime_edu_spark.functions import cosine, dot, l2_norm


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """Exact top-k neighbors: (qid, nid, cos), k rows per query.

    Scores are rounded to 6dp BEFORE ranking with an id tie-break, so
    the selected set is deterministic and oracle-comparable.
    """
    # Norms are computed ONCE per vector (not per pair): O(n+|Q|)
    # norm work + O(n·|Q|) dot products, all JVM-side.
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("qv"),
        l2_norm(vec_col).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("cv"),
        l2_norm(vec_col).alias("cn"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("nid") != F.col(query_id_col))
    scored = pairs.select(
        query_id_col,
        "nid",
        F.round(dot("qv", "cv") / (F.col("qn") * F.col("cn")), 6).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def hyperplane_buckets(
    n_planes: int = 4, dim: int = 64, n_tables: int = 8, seed: int = 42
):
    """Deterministic multi-table random-hyperplane LSH → a pandas UDF
    mapping an embedding to its `n_tables` bucket ids (table tag is
    folded into the id so buckets never collide across tables).
    Vectorized: one (dim × n_tables·n_planes) matmul per Arrow batch.

    Multi-table is the recall lever: a pair is a candidate if it
    agrees in ANY table. Per-table match prob is p^n_planes with
    p = 1 - θ/π, so overall recall ≈ 1-(1-p^n_planes)^n_tables —
    more tables buy recall, fewer planes per table buy candidate
    volume. (Single-table recall on weakly-similar neighbors is near
    zero — measured 0.04 on the testdata embeddings.)"""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_tables * n_planes))
    powers = (1 << np.arange(n_planes)).astype(np.int64)
    table_tags = (np.arange(n_tables).astype(np.int64) + 1) << n_planes

    @pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        signs = (mat @ planes) > 0  # (batch, tables*planes)
        signs = signs.reshape(len(mat), n_tables, n_planes)
        ids = signs @ powers + table_tags  # (batch, tables)
        return pd.Series(list(ids))

    return buckets


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share ANY of the query's LSH
    bucket ids; exact cosine re-ranks the (deduplicated) candidates.
    All-pairs work never happens — the only join key is the bucket
    id, so per-query candidate volume is ~ n_tables·corpus/2^n_planes."""
    dim = len(corpus.select(vec_col).first()[0])
    buckets = hyperplane_buckets(n_planes, dim, n_tables, seed)
    c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("cv"),
        F.explode(buckets(F.col(vec_col))).alias("bkt"),
    )
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        F.explode(buckets(F.col(vec_col))).alias("bkt"),
    )
    pairs = (
        c.join(F.broadcast(q), on="bkt")
        .filter(F.col("nid") != F.col("qid"))
        .select("qid", "qv", "nid", "cv")
        .dropDuplicates(["qid", "nid"])  # a pair may match in several tables
    )
    scored = pairs.select("qid", "nid", cosine("qv", "cv").alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: a k-means coarse quantizer partitions
    the corpus into cluster lists; each query probes only its
    `n_probe` nearest centroids, and exact cosine re-ranks inside the
    probed lists. Expected work per query ≈ n_probe/n_clusters of the
    corpus — the classic FAISS-style IVF-Flat layout, here as plain
    DataFrame ops: the cluster id is just a join key (at 100 TB the
    corpus would additionally be WRITTEN partitioned by cluster id so
    probes prune files, not merely shuffle less).

    Uses pyspark.ml KMeans (seeded, deterministic) for training; the
    query→probe assignment is a vectorized pandas UDF over the
    broadcast centroid matrix."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        F.col(id_col), array_to_vector(F.col(vec_col)).alias("features")
    )
    model = KMeans(k=n_clusters, seed=seed, maxIter=10).fit(train)
    centers = np.stack([np.asarray(c) for c in model.clusterCenters()])  # (C, dim)

    assigned = (
        model.transform(train)
        .select(F.col(id_col).alias("nid"), F.col("prediction").alias("cluster"))
        .join(
            corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("cv")),
            on="nid",
        )
    )

    @pandas_udf("array<int>")
    def probe_clusters(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        d2 = ((mat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)  # (batch, C)
        nearest = np.argsort(d2, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(nearest))

    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        F.explode(probe_clusters(F.col(vec_col))).alias("cluster"),
    )
    pairs = assigned.join(F.broadcast(q), on="cluster").filter(
        F.col("nid") != F.col("qid")
    )
    scored = pairs.select("qid", "nid", cosine("qv", "cv").alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def embedding_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (the 5th dedup method of the
    north star): multi-table LSH buckets the corpus against ITSELF,
    candidate (id_a < id_b) pairs form only inside buckets, exact
    cosine filters at `threshold`. Near-identical vectors agree on
    all sign bits with high probability, so recall at high thresholds
    is excellent with few planes — and all-pairs never materializes."""
    dim = len(corpus.select(vec_col).first()[0])
    buckets = hyperplane_buckets(n_planes, dim, n_tables, seed)
    tagged = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("v"),
        F.explode(buckets(F.col(vec_col))).alias("bkt"),
    ).repartition("bkt")  # identical exchange on both join sides → reused
    a = tagged.select(
        F.col(id_col).alias("id_a"), F.col("v").alias("va"), "bkt"
    )
    b = tagged.select(
        F.col(id_col).alias("id_b"), F.col("v").alias("vb"), "bkt"
    )
    pairs = (
        a.join(b, on="bkt")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs.select(
        "id_a", "id_b", cosine("va", "vb").alias("cos")
    ).filter(F.col("cos") >= threshold)


__all__ = [
    "cosine_topk",
    "lsh_cosine_topk",
    "hyperplane_buckets",
    "embedding_near_duplicates",
    "dot",
    "l2_norm",
]
