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
# ROTATES each round (VERDICT r3 item 3): r4 keeps a minimal covering
# core and fills the remaining slots with 36 queries the driver had
# never oracled (r01-r03 windows were the same 50 names), converting
# self-reported driver-sim results into hard driver verdicts.
# pricing_summary stays first (entry() runs it). Queries rotated out
# remain verified by scripts/driver_sim.py --all + pytest.
DRIVER_CHECK_WINDOW = 50
_PRIORITY_PREFIX: tuple[str, ...] = (
    "pricing_summary",            # S3 P1 P2 P5 A1 A2 A5 O1 — entry()
    "cdc_scd2_intervals",         # S2 P3 F7 W3 (new to the window in r4)
    "cohort_retention",           # T6 J2 A3 F2 (new to the window in r4)
    "doc_chunking_windows",       # X7 X1 F5 F8 (new to the window in r4)
    "nation_profit_trend",        # J1 J3 A1 F1 F3 (new to the window in r4)
    "approx_value_percentiles",   # A8 A4 (new to the window in r4)
    "cross_join_region_status",   # J7 U3 (new to the window in r4)
    "fingerprint_overlap_docs",   # X4 X5 (new to the window in r4)
    "waiting_supplier_counts",    # J5 J6 J1 A1 F2 (new to the window in r4)
    "cube_customer_segments",     # A6 (new to the window in r4)
    "doc_quality_scores",         # X7 F4 F5 (new to the window in r4)
    "doc_repetition_stats",       # X7 X1 A1 W1 F5 (new to the window in r4)
    "embedding_quantization_snr", # X6 F3 F5 A1 (new to the window in r4)
    "error_burst_stats",          # T7 W3 A1 (new to the window in r4)
    "funnel_click_view_purchase", # J4 W3 A3 (new to the window in r4)
    "nations_without_suppliers",  # U2 (new to the window in r4)
    "returned_item_top_customers",  # J1 J3 A1 O1 O2 (new to the window in r4)
    "revenue_trend_daily",        # W3 W4 A1 F2 (new to the window in r4)
    "top_revenue_supplier",       # J1 A5 A9 (new to the window in r4)
    "dirty_data_split",           # S7 P4 U1
    "multimodal_feature_stats",   # X8 X2 A2
    "asof_join_purchase_last_click",  # J8 W3
    "collect_event_types",        # A7 F1
    "customer_balance_quartiles",  # W2
    "daily_unique_visitors",      # T5 U3
    "grouped_zscore_chars",       # X3
    "latest_event_per_user",      # A9 W1 T8
    "map_funcs_props",            # F6 F7 P3
    "session_window_stats",       # T3
    "sliding_window_traffic",     # T2
    "tumbling_hourly_stats",      # T1 A1 A2
    "weighted_avg_udaf",          # A10 X2 P3
    "full_join_nation_counts",    # J2 A1 (new to the window in r4)
    "theta_join_acctbal",         # J7 (new to the window in r4)
    "pivot_daily_activity",       # A1 F2 (new to the window in r4)
    "skewed_event_type_stats",    # A1 A2 A3 (new to the window in r4)
    "unpivot_daily_activity",     # A1 F2 (new to the window in r4)
    "topk_orders",                # O1 O2 (new to the window in r4)
    "trailing_24h_user_value",    # W4 F2 (new to the window in r4)
    "distinct_segments_per_nation",  # U3 (new to the window in r4)
    "token_topk",                 # X1 A1 O2 (new to the window in r4)
    "vocab_coverage_topk",        # X7 X1 W4 A5 (new to the window in r4)
    "text_stats_by_source",       # X7 F5 A2 (new to the window in r4)
    "lang_guess_confusion",       # X7 F4 (new to the window in r4)
    "bpe_token_counts",           # X7 X1 F1 (new to the window in r4)
    "cms_token_frequencies",      # A4 X7 (new to the window in r4)
    "mixture_sample_by_source",   # X7 F8 A1 (new to the window in r4)
    "doc_unigram_surprisal",      # X7 X1 A1 F3 (new to the window in r4)
    "sequence_packing_chunks",    # X7 W4 F2 (new to the window in r4)
    "curated_packing_manifest",   # X4 X7 A1 F3 (new to the window in r4)
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
