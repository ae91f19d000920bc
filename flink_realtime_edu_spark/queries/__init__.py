"""Query registry backing ``__spark_entry__.queries()`` / ``oracle_sql()``.

Each registered query is one row of SURVEY.md §2's operator
inventory: a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
plus (when ANSI-SQL-expressible) the DuckDB oracle string the driver
runs side-by-side. Queries without an oracle get the driver's weaker
rows-only check (B* rows in the inventory).

Conventions enforced here (SURVEY.md §5.2):
- every computed column is aliased identically in Spark and SQL;
- floating aggregates use the DECIMAL(30,8) trick from
  ``flink_realtime_edu_spark.functions`` on BOTH sides;
- results are deterministic (unique tie-breakers under limits,
  arrays sorted/joined to strings).
"""

from __future__ import annotations

import functools
import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Builder
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    survey_rows: tuple[str, ...] = ()  # SURVEY.md §2 inventory ids covered
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default=())


QUERIES: dict[str, QuerySpec] = {}

# Modules that register queries on import (one per §2 area).
_QUERY_MODULES = (
    "pricing",
    "joins",
    "aggregates",
    "windows",
    "setops",
    "scalars",
    "json_events",
    "time_semantics",
    "llm_text",
    "packing",
    "media",
    "dedup",
    "similarity",
    "udfs",
    "redaction",
    "ads",
    "subqueries",
    "tpch",
    "temporal",
    "statistics",
    "training",
    "bpe",
    "late",
    "cep",
)


def register(
    name: str,
    oracle: str | None = None,
    survey_rows: tuple[str, ...] = (),
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        # Registered builds run under the batch-analytics conf profile
        # (session.BATCH_CONFS — currently the AQE coalescing floor):
        # applied HERE, not in the shared configure(), so the
        # streaming jobs' micro-batch pipelines keep Spark's default
        # floor (the 64k batch floor measured 15-30 % slower on the
        # ingest sinks — see OPTIMIZATION_r13.md). The module-level
        # function stays unwrapped for direct callers/tests.
        @functools.wraps(fn)
        def build(spark: SparkSession, sf_dir: str) -> DataFrame:
            from flink_realtime_edu_spark.session import configure_batch

            configure_batch(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = QuerySpec(
            name=name,
            build=build,
            oracle=oracle,
            survey_rows=tuple(survey_rows),
            doc=doc or (fn.__doc__ or "").strip(),
            bench=bench,
            tags=tuple(tags),
        )
        return fn

    return deco


# Registry ordering contract: the driver's correctness gate checks the
# FIRST 50 keys of queries(), so the prefix below is curated to cover
# EVERY batch-expressible SURVEY.md §2 row with at least one
# representative (tests/test_registry_order.py pins this), and it
# ROTATES each round (VERDICT r3 item 3).
#
# r13 rotation (VERDICT r12 item 1): the 29 queries last officially
# sampled r9 — COVERAGE.md's recorded "r13 rotation obligation" — go
# FIRST; they hit the K=4 staleness budget
# (tests/test_registry_order.py::test_staleness_budget_within_window)
# the moment CORRECTNESS_r13.json lands. New r13 queries follow (the
# never-sampled pin forces them in at add time). The remaining slots
# start the 48-query r10 cohort (binds r14): spark_native_hashes is
# picked out of alphabetical order because it is one of the two
# rows-only-by-design queries the driver otherwise never re-samples
# (VERDICT r12 "What's wrong" #2), then the alphabetical head. The
# spilled r10 queries MUST rotate first in r14; the definitive spill
# list is recomputed by scripts/coverage_report.py from the
# CORRECTNESS ledger, not this comment.
DRIVER_CHECK_WINDOW = 50
_PRIORITY_PREFIX: tuple[str, ...] = (
    "pricing_summary",            # S3 P1 P2 P5 A1 A2 A5 O1 -- entry()
    # --- never officially sampled (NEW r13) ---
    "ivfpq_persisted_ann_topk",   # X6 -- persisted codes-at-rest search
    "webp_decode_stats",          # X8 -- VP8L lossless codec
    "knn_graph_refined_recall",   # X6 -- NN-descent round over the graph
    # --- last officially sampled r9 (the K=4 obligation, all 29) ---
    "daily_unique_visitors",
    "datetime_funcs_orders",
    "distinct_users_by_type",
    "doc_fingerprint_stats",
    "event_gaps",
    "exact_dedup_docs",
    "hash_funcs_documents",
    "interval_join_click_purchase",
    "jpeg_decode_stats",
    "json_props_stats",
    "kmeans_cluster_profile",     # rows-only by design; official weak sample
    "kmeans_quality_summary",
    "label_centroids",
    "label_homophily_check",
    "late_priority_mix",
    "leakage_safe_split",
    "left_join_recent_spend",
    "math_conditional_orders",
    "media_dup_canonicals",
    "minhash_signatures_sample",
    "nations_with_customers_and_suppliers",
    "near_dup_clusters",
    "near_dup_embeddings",
    "near_dup_jaccard",
    "near_dup_minhash",
    "new_vs_returning_daily",
    "pandas_udf_token_stats",
    "pii_redaction_stats",
    "video_frame_sample_plan",
    # --- last officially sampled r10 (staleness refresh, 20/48) ---
    "spark_native_hashes",        # rows-only by design; official weak sample
    "approx_value_percentiles",
    "bpe_token_counts",
    "cep_greedy_views",
    "cep_group_times_funnel",
    "cep_one_or_more_until",
    "cep_times_quantifier",
    "cohort_retention",
    "collect_event_types",
    "cross_join_region_status",
    "cube_customer_segments",
    "curated_packing_manifest",
    "customer_balance_quartiles",
    "dirty_data_split",
    "distinct_segments_per_nation",
    "doc_bigram_perplexity",
    "doc_chunking_windows",
)


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the registry,
    ordered: the curated driver-window prefix first, then every other
    query in registration order."""
    for mod in _QUERY_MODULES:
        importlib.import_module(f"flink_realtime_edu_spark.queries.{mod}")
    missing = [n for n in _PRIORITY_PREFIX if n not in QUERIES]
    if missing:
        raise KeyError(f"priority prefix names unknown queries: {missing}")
    ordered = {name: QUERIES[name] for name in _PRIORITY_PREFIX}
    ordered.update((n, s) for n, s in QUERIES.items() if n not in ordered)
    return ordered
