"""Partition-invariance of the registry: the driver's value-hash gate
is only sound if every query returns IDENTICAL values whatever the
physical execution shape. This sweeps a representative query per
operator family (hash agg, window, joins, pandas-UDF scorer, LSH
dedup, sharded prefix sums, connected components, hash sketches,
grouped-map UDF, epoch shuffle) under three execution shapes —
default, shuffle.partitions=5, shuffle.partitions=17 + AQE coalescing
off — and requires bit-identical sorted results.

This is the test-side twin of the repo's determinism discipline
(exact-decimal sums, rounded-before-rank scores, id tie-breaks,
sequential-fold dot products): a query that silently depended on
partition count or AQE decisions would pass the single-shape oracle
compare some days and hash-mismatch others.
"""

from __future__ import annotations

import pytest

from flink_realtime_edu_spark.queries import load_registry

REPRESENTATIVES = [
    "pricing_summary",            # partial+final hash agg, decimal sums
    "top_parts_per_nation",       # broadcast joins + ranking window
    "running_customer_spend",     # frame aggregate window
    "near_dup_minhash",           # pandas-UDF signatures + LSH self-join
    "cosine_topk_bruteforce",     # mapInPandas local top-k + global rank
    "sequence_packing_chunks",    # two-level sharded prefix sums
    "near_dup_clusters",          # iterative connected components
    "cms_token_frequencies",      # hash-sketch algebra
    "grouped_zscore_chars",       # applyInPandas grouped-map
    "training_shuffle_manifest",  # md5 epoch shuffle + per-shard rank
    "value_percentiles",          # exact percentiles
    "customer_balance_quartiles", # two-phase distributed rank
    "bpe_merge_learning",         # driver-looped iterative merges
    "text_normalization_checksum",  # pandas-UDF + exact decimal sum
    "bpe_encode_stats",           # learned-merge encode + vocab join (r5)
    "late_corrected_windows",     # sharded running-max watermark (r5)
    "cep_funnel_first_match",     # k-step min-after join chain (r5)
    "png_decode_stats",           # mapInPandas codec round-trip (r5)
    "webp_decode_stats",          # VP8L codec round-trip (r13)
    "knn_graph_refined_recall",   # bucket-grouped graph + NN-descent (r13)
]


def _run(spark, name, sf_dir):
    df = load_registry()[name].build(spark, sf_dir)
    return sorted(map(repr, (tuple(r) for r in df.collect())))


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_result_is_partition_invariant(spark, sf_dir, name):
    base = _run(spark, name, sf_dir)
    assert base, f"{name} returned no rows at {sf_dir}"
    saved_parts = spark.conf.get("spark.sql.shuffle.partitions")
    saved_coalesce = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled"
    )
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        assert _run(spark, name, sf_dir) == base, f"{name}: differs at 5 parts"
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        assert _run(spark, name, sf_dir) == base, (
            f"{name}: differs at 17 parts / no AQE coalesce"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved_parts)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", saved_coalesce
        )
