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
# r10 rotation (VERDICT r9 item 1): the 16 r6-stale queries the r9
# rotation spilled with an explicit r10 pin obligation go FIRST --
# they are exactly the set the K=4 staleness budget
# (tests/test_registry_order.py::test_staleness_budget_within_window)
# holds overdue once CORRECTNESS_r09.json is on disk -- then
# STALENESS-FIRST refresh: 22 of the 46 queries last officially
# sampled r7. The 24 spilled r7 queries (jpeg_color_decode_stats,
# lang_guess_confusion,
# latest_event_per_user, map_funcs_props,
# mixture_sample_by_source, multimodal_feature_stats,
# nation_profit_trend, nations_without_suppliers,
# returned_item_top_customers,
# revenue_trend_daily, skewed_event_type_stats,
# sliding_window_traffic, text_stats_by_source, theta_join_acctbal,
# token_topk, top_revenue_supplier, topk_orders,
# trailing_24h_user_value, tumbling_hourly_stats,
# unpivot_daily_activity, video_decode_stats, vocab_coverage_topk,
# waiting_supplier_counts, weighted_avg_udaf) rotate FIRST in r11 --
# at r11 they hit the K=4 budget, so forgetting them fails the
# suite. The eleven NEW r10 queries (cep_one_or_more_until,
# cep_greedy_views, doc_bigram_perplexity, cep_group_times_funnel,
# semdedup_label_blocks, dsir_importance_weights, dsir_gumbel_topk,
# semdedup_kmeans_summary, domain_temperature_mixture,
# doremi_domain_weights, doc_trigram_perplexity) displaced the tail
# of the r7 block into that spill list (the never-sampled pin forces
# them into the window at add time). NOTE for r11: once
# CORRECTNESS_r10 lands, the 22 in-window r7 queries carry r10
# samples — only the 24 SPILLED r7 queries above hit the K=4 budget
# at r11, so the forced r11 set is pricing_summary + those 24 = 25
# slots, leaving 25 for the r8 cohort (44 queries, which binds at
# r12 — start it early).
DRIVER_CHECK_WINDOW = 50
_PRIORITY_PREFIX: tuple[str, ...] = (
    "pricing_summary",            # S3 P1 P2 P5 A1 A2 A5 O1 -- entry()
    # --- never officially sampled (NEW r10) ---
    "cep_one_or_more_until",      # T7 J4 W1 F5 -- NEW r10
    "cep_greedy_views",           # T7 J4 W1 W3 -- NEW r10
    "doc_bigram_perplexity",      # X7 X1 A1 F3 -- NEW r10
    "cep_group_times_funnel",     # T7 J4 W1 U1 -- NEW r10
    "semdedup_label_blocks",      # X5 X6 J7 -- NEW r10
    "dsir_importance_weights",    # X7 X1 A1 F3 F8 -- NEW r10
    "dsir_gumbel_topk",           # X7 F3 F8 O2 -- NEW r10
    "semdedup_kmeans_summary",    # X5 X6 -- NEW r10
    "domain_temperature_mixture", # X7 A1 F3 A5 -- NEW r10
    "doremi_domain_weights",      # X7 A1 F3 J1 -- NEW r10
    "doc_trigram_perplexity",     # X7 X1 A1 F3 -- NEW r10
    # --- last officially sampled r6 (the r9-pinned spill, 16/16) ---
    "pivot_daily_activity",
    "rollup_revenue",
    "running_customer_spend",
    "semi_join_recent_customers",
    "sequence_packing_chunks",
    "session_window_stats",
    "spark_native_hashes",
    "star_join_revenue",
    "string_funcs_part",
    "temporal_join_purchase_state",
    "tfidf_top_terms",
    "top_parts_per_nation",
    "training_shuffle_manifest",
    "union_activity_feed",
    "user_state_intervals",
    "value_percentiles",
    # --- last officially sampled r7 (staleness refresh, 23/46) ---
    "approx_value_percentiles",
    "bpe_token_counts",
    "cep_times_quantifier",
    "cms_token_frequencies",
    "cohort_retention",
    "collect_event_types",
    "cross_join_region_status",
    "cube_customer_segments",
    "curated_packing_manifest",
    "customer_balance_quartiles",
    "dirty_data_split",
    "distinct_segments_per_nation",
    "doc_chunking_windows",
    "doc_quality_scores",
    "doc_repetition_stats",
    "doc_unigram_surprisal",
    "embedding_quantization_snr",
    "error_burst_stats",
    "fingerprint_overlap_docs",
    "full_join_nation_counts",
    "funnel_click_view_purchase",
    "grouped_zscore_chars",
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
