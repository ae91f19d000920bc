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
# r12 rotation (VERDICT r11 item 1): the 24 queries last officially
# sampled r8 — the set the r11 rotation spilled with an explicit r12
# pin obligation — go FIRST; they hit the K=4 staleness budget
# (tests/test_registry_order.py::test_staleness_budget_within_window)
# the moment CORRECTNESS_r12.json lands. cms_token_frequencies joins
# them: its r11 TakeOrderedAndProject rewrite landed after its last
# official sample (r10), so the rewrite gets an official verdict
# (VERDICT r11 "What's wrong" #3). ivfpq_ann_topk re-enters because
# its scoring path is rewritten this round (PQ codes at rest, VERDICT
# r11 item 2). New r12 queries follow (never-sampled pin forces them
# in at add time, displacing the alphabetical r9 tail). The remaining
# slots start the 49-query r9 cohort (binds r13): the three ANN
# queries most likely touched by this round's quantization work
# (ivf_ann_topk, ivf_ann_incremental_topk, pq_ann_topk) plus the
# alphabetical head. The spilled r9 queries — everything from
# doc_fingerprint_stats onward alphabetically, minus the three ANN
# picks — MUST rotate first in r13; the definitive spill list is
# recomputed by scripts/coverage_report.py from the CORRECTNESS
# ledger, not this comment.
DRIVER_CHECK_WINDOW = 50
_PRIORITY_PREFIX: tuple[str, ...] = (
    "pricing_summary",            # S3 P1 P2 P5 A1 A2 A5 O1 -- entry()
    # --- never officially sampled (NEW r12; uncommented as each lands) ---
    "ivfpq_residual_ann_topk",    # X6 -- NEW r12 (residual-PQ, flag-gated)
    "quality_classifier_planted_eval",  # X7 F4 A1 F8 O2 -- NEW r12
    "knn_graph_sampled_recall",   # X6 A1 W1 -- NEW r12 (distributed k-NN graph)
    # --- changed since their last official sample (re-pin) ---
    "cms_token_frequencies",      # A4 O2 -- r11 prefilter rewrite, unsampled
    "ivfpq_ann_topk",             # X6 -- r12 codes-at-rest rewrite
    # --- last officially sampled r8 (the r11-spilled 24, all pinned) ---
    "late_corrected_windows",
    "late_ship_priority_counts",
    "local_supplier_volume",
    "market_share_by_year",
    "min_cost_supplier_per_part",
    "nation_revenue_share",
    "near_dup_incremental",
    "near_dup_simhash",
    "part_supplier_diversity",
    "phash_dup_stats",
    "png_decode_stats",
    "price_moments_by_flag",
    "promo_revenue_share",
    "right_join_supplier_nations",
    "small_qty_parts_revenue",
    "span_clip_checksums",
    "state_transition_matrix",
    "stratified_split_by_source",
    "text_normalization_checksum",
    "token_budget_sample",
    "unshipped_order_revenue",
    "volume_shipping_pairs",
    "wav_decode_stats",
    "wealthy_inactive_customers",
    # --- last officially sampled r9 (staleness refresh, 20/49) ---
    "ivf_ann_topk",               # quantization-adjacent: sample post-r12 work
    "ivf_ann_incremental_topk",   # quantization-adjacent
    "pq_ann_topk",                # quantization-adjacent
    "abandoned_clicks_daily",
    "ann_lsh_topk",
    "anti_join_no_big_order",
    "approx_unique_visitors",
    "array_funcs_documents",
    "asof_join_purchase_last_click",
    "benchmark_contamination",
    "cdc_scd2_intervals",
    "cep_all_matches_ranges",
    "cep_consecutive_clicks",
    "cep_iterative_condition",
    "cep_skip_past_last",
    "cep_skip_to_first",
    "cep_skip_to_last",
    "cep_skip_to_next",
    "corpus_curation_pipeline",
    "cosine_topk_bruteforce",
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
