"""Structured Streaming layer — SURVEY.md §2.9 / §2.1 S4-S5.

The reference is a streaming warehouse: Kafka in, keyed/windowed
transforms, Kafka/ClickHouse out [R]. Here the SAME DataFrame code
from the batch queries runs on `readStream`; the micro-batch engine
incrementalizes it (PAPERS.md: Structured Streaming, SIGMOD 2018).
Prefix consistency means end-of-stream output ≡ the batch query on
the same data — exactly what tests/test_streaming.py asserts.

Modules:
- ``jobs``     — streaming forms of T1/T2/T3/T5 + the J9 stream-stream
                 interval join.
- ``sinks``    — foreachBatch idempotent upsert (the ClickHouse
                 ReplacingMergeTree stand-in, T8) and memory/parquet
                 helpers.
- ``stateful`` — transformWithStateInPandas custom keyed state (T6
                 first-visit repair; the reference's ValueState [R]).
- ``cep``      — the five CEP automata (relaxed first-match, timeout
                 side output on event-time timers, strict next,
                 notFollowedBy with deferred tail emission, and the
                 all-matches NFA with the after-match skip enum).
- ``rules``    — broadcast-state dynamic rules: per-batch rule
                 refresh + exactly-once alerts via the txn sink.
- ``dedup``/``scd2``/``late``/``quality`` — incremental dedup index,
                 CDC→SCD2 maintenance, allowed-lateness repair,
                 observe() DQ counters.
"""

from flink_realtime_edu_spark.streaming.jobs import (
    ads_top_segments,
    dedup_users_stream,
    enrich_events_stream,
    interval_join_outer_stream,
    interval_join_stream,
    layered_warehouse_stream,
    load_events_stream,
    session_stats_stream,
    temporal_join_stream,
    tumbling_stats_stream,
)
from flink_realtime_edu_spark.streaming.dedup import (
    read_dedup_index,
    read_dedup_output,
    streaming_exact_dedup,
)
from flink_realtime_edu_spark.streaming.quality import (
    dq_totals_from_progress,
    with_dq_metrics,
)
from flink_realtime_edu_spark.streaming.cep import (
    cep_all_matches_stream,
    cep_first_match_stream,
    cep_not_followed_by_stream,
    cep_strict_matches_stream,
    cep_with_timeouts_stream,
)
from flink_realtime_edu_spark.streaming.rules import (
    evaluate_rules,
    rules_alerts_stream,
)
from flink_realtime_edu_spark.streaming.scd2 import (
    maintain_scd2_dim,
    read_scd2_intervals,
)
from flink_realtime_edu_spark.streaming.sinks import (
    await_progress,
    run_to_completion,
    upsert_latest_by_key,
)
from flink_realtime_edu_spark.streaming.stateful import (
    detect_abandoned_stream,
    tag_new_vs_returning,
)

__all__ = [
    "detect_abandoned_stream",
    "enrich_events_stream",
    "tag_new_vs_returning",
    "load_events_stream",
    "tumbling_stats_stream",
    "session_stats_stream",
    "dedup_users_stream",
    "interval_join_outer_stream",
    "interval_join_stream",
    "layered_warehouse_stream",
    "ads_top_segments",
    "upsert_latest_by_key",
    "run_to_completion",
    "await_progress",
    "maintain_scd2_dim",
    "read_scd2_intervals",
    "streaming_exact_dedup",
    "read_dedup_output",
    "read_dedup_index",
    "with_dq_metrics",
    "dq_totals_from_progress",
    "evaluate_rules",
    "rules_alerts_stream",
    "cep_all_matches_stream",
    "cep_first_match_stream",
    "cep_not_followed_by_stream",
    "cep_strict_matches_stream",
    "cep_with_timeouts_stream",
]
