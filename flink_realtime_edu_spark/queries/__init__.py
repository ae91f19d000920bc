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
    "ads",
    "subqueries",
    "tpch",
    "temporal",
    "statistics",
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
# FIRST 50 keys of queries() (CORRECTNESS_r01/r02 are exactly that
# prefix), so the prefix below is curated to cover EVERY batch-
# expressible SURVEY.md §2 row with at least one representative —
# LLM-pipeline operators (X3–X6, S2) first, since insertion order is
# the only way they get a driver verdict. pricing_summary stays first
# (entry() runs it). tests/test_registry_order.py pins the invariant:
# first WINDOW names cover the union of all registered survey_rows.
DRIVER_CHECK_WINDOW = 50
_PRIORITY_PREFIX: tuple[str, ...] = (
    "pricing_summary",            # S3 P1 P2 P5 A1 A2 A5 O1 — entry()
    "exact_dedup_docs",           # X4 F8 A9
    "near_dup_minhash",           # X5
    "near_dup_embeddings",        # X5 X6
    "cosine_topk_bruteforce",     # X6 W1 J7
    "grouped_zscore_chars",       # X3
    "label_centroids",            # X6 A1 F5
    "tfidf_top_terms",            # X7 X1 A1 W1
    "leakage_safe_split",         # X4 X5 X7 F8 J2 A3
    "near_dup_clusters",          # X4 X5
    "user_state_intervals",       # S2 W3 A1
    "temporal_join_purchase_state",  # J8 S2 A1
    "corpus_curation_pipeline",   # X4 X5 X7 J5 J6 A1
    "benchmark_contamination",    # X7 X4 J5 F5
    "near_dup_jaccard",           # X5 X4 F5
    "pandas_udf_token_stats",     # X2 X7
    "weighted_avg_udaf",          # A10 X2 P3
    "star_join_revenue",          # J1 J3 A1 A2
    "left_join_recent_spend",     # J2 P4
    "semi_join_recent_customers",  # J5
    "anti_join_no_big_order",     # J6
    "multimodal_feature_stats",   # X8 X2 A2 (J7 via cosine_topk; U3 via daily_unique_visitors)
    "interval_join_click_purchase",  # J4
    "asof_join_purchase_last_click",  # J8 W3
    "distinct_users_by_type",     # A1 A2 A3
    "approx_unique_visitors",     # A4 (tolerance oracle since r4)
    "rollup_revenue",             # A6 J1 J3
    "collect_event_types",        # A7 F1
    "latest_event_per_user",      # A9 W1 T8
    "value_percentiles",          # A8
    "top_parts_per_nation",       # W1 O2 J1 J3
    "customer_balance_quartiles",  # W2
    "event_gaps",                 # W3 F2
    "running_customer_spend",     # W4
    "union_activity_feed",        # U1 P1 P5
    "nations_with_customers_and_suppliers",  # U2
    "string_funcs_part",          # F1
    "datetime_funcs_orders",      # F2 P5
    "math_conditional_orders",    # F3 F4
    "array_funcs_documents",      # F5 X1
    "hash_funcs_documents",       # F8
    "json_props_stats",           # P3 F7 A1
    "map_funcs_props",            # F6 F7 P3
    "dirty_data_split",           # S7 P4 U1
    "tumbling_hourly_stats",      # T1 A1 A2
    "sliding_window_traffic",     # T2
    "session_window_stats",       # T3
    "daily_unique_visitors",      # T5 U3
    "new_vs_returning_daily",     # T6 A3
    "abandoned_clicks_daily",     # T7 J6 J4
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
