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
# r11 rotation (VERDICT r10 item 1): the 24 queries last officially
# sampled r7 — the set the r10 rotation spilled with an explicit r11
# pin obligation — go FIRST; they hit the K=4 staleness budget
# (tests/test_registry_order.py::test_staleness_budget_within_window)
# the moment CORRECTNESS_r11.json lands. New r11 queries follow
# (never-sampled pin forces them into the window at add time). The
# remaining slots start the 44-query r8 cohort early (alphabetical
# first 20 — late_corrected_windows was displaced mid-round by the
# fifth new query, quality_classifier_heldout_eval), which binds at
# r12: the 24 spilled r8 queries
# (late_corrected_windows,
# late_ship_priority_counts, local_supplier_volume,
# market_share_by_year, min_cost_supplier_per_part,
# nation_revenue_share, near_dup_incremental, near_dup_simhash,
# part_supplier_diversity, phash_dup_stats, png_decode_stats,
# price_moments_by_flag, promo_revenue_share,
# right_join_supplier_nations, small_qty_parts_revenue,
# span_clip_checksums, state_transition_matrix,
# stratified_split_by_source, text_normalization_checksum,
# token_budget_sample, unshipped_order_revenue,
# volume_shipping_pairs, wav_decode_stats,
# wealthy_inactive_customers) MUST rotate first in r12, leaving
# ~25 slots to start the 49-query r9 cohort (binds r13).
DRIVER_CHECK_WINDOW = 50
_PRIORITY_PREFIX: tuple[str, ...] = (
    "pricing_summary",            # S3 P1 P2 P5 A1 A2 A5 O1 -- entry()
    # --- never officially sampled (NEW r11; uncommented as each lands) ---
    "quality_classifier_scores",  # X7 X1 A1 F3 F8 -- NEW r11
    "ivfpq_ann_topk",             # X6 -- NEW r11
    "audio_metadata_stats",       # X8 X2 F3 -- NEW r11
    "video_container_stats",      # X8 X2 F3 -- NEW r11
    "quality_classifier_heldout_eval",  # X7 F4 A1 F8 -- NEW r11
    # --- last officially sampled r7 (the r10-spilled 24, all pinned) ---
    "jpeg_color_decode_stats",
    "lang_guess_confusion",
    "latest_event_per_user",
    "map_funcs_props",
    "mixture_sample_by_source",
    "multimodal_feature_stats",
    "nation_profit_trend",
    "nations_without_suppliers",
    "returned_item_top_customers",
    "revenue_trend_daily",
    "skewed_event_type_stats",
    "sliding_window_traffic",
    "text_stats_by_source",
    "theta_join_acctbal",
    "token_topk",
    "top_revenue_supplier",
    "topk_orders",
    "trailing_24h_user_value",
    "tumbling_hourly_stats",
    "unpivot_daily_activity",
    "video_decode_stats",
    "vocab_coverage_topk",
    "waiting_supplier_counts",
    "weighted_avg_udaf",
    # --- last officially sampled r8 (staleness refresh, 21/44) ---
    "audio_fingerprint_dups",
    "big_volume_customers",
    "bpe_encode_stats",
    "bpe_merge_learning",
    "bpe_sequence_packing",
    "bpe_token_budget_sample",
    "cep_funnel_first_match",
    "cep_funnel_timeouts",
    "cep_no_error_funnel",
    "cep_not_next_error_pair",
    "cep_quiet_after_purchase",
    "cep_strict_error_runs",
    "customer_order_distribution",
    "disjunctive_predicate_revenue",
    "dup_cluster_canonicals",
    "dup_span_stats",
    "excess_share_suppliers",
    "forecast_revenue_change",
    "grouping_sets_traffic",
    "incremental_dedup_delta",
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
