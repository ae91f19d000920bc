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
        QUERIES[name] = QuerySpec(
            name=name,
            build=fn,
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
# r9 rotation (VERDICT r8 items 2–4): first the PINS — the two NEW
# r9 queries (cep_iterative_condition, media_dup_canonicals — the
# only registered queries with no official CORRECTNESS row, which
# tests/test_registry_order.py forces into the window), then the 10
# r5-stale queries the r8 rotation spilled with an explicit r9 pin
# obligation (the ANN/clustering tolerance-oracle family plus the
# untouched winnowing/md5-twin kernels — the r8 verdict re-verified
# all 10 green out-of-band and item 2 says make it official), then
# re-pins of every query whose SOURCE changed this round (the shared
# all-matches enumeration gained iterative-condition value threading,
# so all five skip-strategy queries re-sample on the changed code;
# their plans diff only in lambda ids, but the official record should
# come from the new tree) — then STALENESS-FIRST refresh: 32 of the
# 47 queries last officially sampled r6. The 15 spilled r6 queries
# (rollup_revenue, running_customer_spend, semi_join_recent_customers,
# sequence_packing_chunks, session_window_stats, spark_native_hashes,
# star_join_revenue, string_funcs_part, temporal_join_purchase_state,
# tfidf_top_terms, top_parts_per_nation, training_shuffle_manifest,
# union_activity_feed, user_state_intervals, value_percentiles)
# rotate FIRST in r10 — at r10 they hit the K=4 staleness budget that
# tests/test_registry_order.py::test_staleness_budget_within_window
# now pins structurally, so forgetting them fails the suite. (The
# late-r9 cep_consecutive_clicks addition took the 32nd r6 slot, so
# pivot_daily_activity joins that r10 spill list too.)
DRIVER_CHECK_WINDOW = 50
_PRIORITY_PREFIX: tuple[str, ...] = (
    "pricing_summary",            # S3 P1 P2 P5 A1 A2 A5 O1 — entry()
    # --- never officially sampled (NEW r9) ---
    "cep_iterative_condition",    # T7 J4 W1 F5 — NEW r9
    "media_dup_canonicals",       # X8 X5 X4 W1 — NEW r9
    "cep_consecutive_clicks",     # T7 J4 W1 W3 — NEW r9
    # --- last officially sampled r5 (the r8-pinned spill, 10/10) ---
    "ann_lsh_topk",               # X6
    "ivf_ann_topk",               # X6
    "ivf_ann_incremental_topk",   # X6
    "pq_ann_topk",                # X6
    "kmeans_quality_summary",     # X6
    "kmeans_cluster_profile",     # X6 — rows-only BY DESIGN
    "label_homophily_check",      # X6 J1
    "minhash_signatures_sample",  # X5
    "doc_fingerprint_stats",      # X4 X7 F8
    "video_frame_sample_plan",    # X8 F5 P1
    # --- source changed this round (re-pins: shared enumeration) ---
    "cep_all_matches_ranges",     # T7 J4 W1 F5
    "cep_skip_to_next",           # T7 J4 W1
    "cep_skip_past_last",         # T7 J4 W1 X3
    "cep_skip_to_first",          # T7 J4 W1 X3
    "cep_skip_to_last",           # T7 J4 W1 X3
    # --- last officially sampled r6 (staleness refresh, 32/47) ---
    "abandoned_clicks_daily",     # T7 J6 J4
    "anti_join_no_big_order",     # J6
    "approx_unique_visitors",     # A4
    "array_funcs_documents",      # F5 X1
    "asof_join_purchase_last_click",  # J8 W3
    "benchmark_contamination",    # X4 X7 J5 F5
    "cdc_scd2_intervals",         # S2 P3 F7 W3
    "corpus_curation_pipeline",   # X4 X5 X7 J5 J6
    "cosine_topk_bruteforce",     # X6 J7 W1
    "daily_unique_visitors",      # T5 U3
    "datetime_funcs_orders",      # F2 P5
    "distinct_users_by_type",     # A3 A1 A2
    "event_gaps",                 # W3 F2
    "exact_dedup_docs",           # X4 A9 F8
    "hash_funcs_documents",       # F8
    "interval_join_click_purchase",  # J4
    "jpeg_decode_stats",          # X8 X2 F3 A2
    "json_props_stats",           # P3 F7 A1
    "label_centroids",            # X6 F5 A1
    "late_priority_mix",          # J1 F4 A2
    "leakage_safe_split",         # X4 X5 X7 J2 F8 A3
    "left_join_recent_spend",     # J2 P4 A1
    "math_conditional_orders",    # F3 F4
    "nations_with_customers_and_suppliers",  # U2
    "near_dup_clusters",          # X4 X5
    "near_dup_embeddings",        # X5 X6
    "near_dup_jaccard",           # X4 X5 F5
    "near_dup_minhash",           # X5
    "new_vs_returning_daily",     # T6 A3
    "pandas_udf_token_stats",     # X2 X7
    "pii_redaction_stats",        # X7 F1
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
