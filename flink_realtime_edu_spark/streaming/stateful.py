"""Custom keyed state — SURVEY.md §2.9 T6/T7.

The reference's DWD/DWS jobs keep per-key Flink ValueState: the
first-visit date for new-vs-returning repair, last-value caches, and
timers for timeout detection [R]. Spark offers two APIs:

- ``transformWithStateInPandas`` (Spark 4 StatefulProcessor) — the
  richer one (typed state, timers), but its state protocol needs the
  ``protobuf`` package, which this environment lacks → gated behind
  HAS_TRANSFORM_WITH_STATE and exercised only when available.
- ``applyInPandasWithState`` (GroupState) — protobuf-free and fully
  sufficient for ValueState semantics → the default implementation.

Here: (T6) first-visit tagging — per-user state holding the earliest
seen event day; every event is emitted tagged is_new (first-ever
visit day) vs returning — streaming form of
queries.time_semantics.new_vs_returning_daily; and (T7)
timeout-timer detection of abandoned clicks via GroupState
event-time timeouts — streaming form of abandoned_clicks_daily.
Tests assert agreement with the oracle-checked batch twins.

Scale: state is partitioned by the grouping key across executors
(RocksDB state store in production); only a date string per user, so
state size is O(distinct users).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "user_id BIGINT, event_id BIGINT, day STRING, is_new BOOLEAN"
STATE_SCHEMA = "first_day STRING"

try:  # protobuf-gated (see module docstring)
    import google.protobuf  # noqa: F401

    HAS_TRANSFORM_WITH_STATE = True
except ImportError:
    HAS_TRANSFORM_WITH_STATE = False


def _first_visit_fn(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    """GroupState function: ValueState<first_day> per user."""
    first = state.get[0] if state.exists else None
    for pdf in pdf_iter:
        days = pdf["day"]
        batch_min = days.min()
        if first is None or batch_min < first:
            first = batch_min
            state.update((first,))
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "day": days,
                "is_new": days == first,
            }
        )


ABANDONED_OUTPUT_SCHEMA = "user_id BIGINT, click_ts_ms BIGINT"
ABANDONED_STATE_SCHEMA = "pending ARRAY<BIGINT>, recent_purchases ARRAY<BIGINT>"


def _make_abandoned_fn(timeout_ms: int):
    """GroupState function for T7 timers: per-user ValueState holding
    the epoch-ms of clicks not yet matched by a purchase. A purchase
    at p matches (clears) every pending click c with c ≤ p ≤
    c+timeout; when the event-time watermark passes c+timeout the
    click is emitted as abandoned (the registered-timer firing)."""

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            pending = list(state.get[0])
            recent_p = list(state.get[1])
        else:
            pending, recent_p = [], []
        wm = state.getCurrentWatermarkMs()
        if not state.hasTimedOut:
            clicks: list[int] = []
            purchases: list[int] = []
            for pdf in pdf_iter:
                for et, ts in zip(pdf["event_type"], pdf["ts_ms"]):
                    if et == "click":
                        clicks.append(int(ts))
                    elif et == "purchase":
                        purchases.append(int(ts))
            # Two-phase: ingest ALL the batch's clicks into pending
            # BEFORE applying any purchase. Micro-batch rows arrive in
            # no particular order, and replaying them one-by-one (even
            # sorted by event time) is order-sensitive at ts ties — a
            # purchase processed before its same-timestamp click left
            # the click pending forever → false timeout. Two-phase is
            # order-insensitive within the batch and matches the batch
            # anti-join spec exactly (a purchase at p clears every
            # click c with c ≤ p ≤ c+timeout, wherever each sat in
            # the batch). Pinned by tests/test_properties.py::
            # test_abandoned_state_fn_matches_antijoin (hypothesis
            # shuffles arrival order).
            #
            # CROSS-batch ties need state too (hypothesis-found, r5):
            # a purchase in batch N must clear a click arriving in
            # batch N+1 at the same (or, under bounded out-of-order
            # arrival, an earlier) event time — the anti-join spec has
            # no batch boundaries. Purchases stay remembered while
            # p ≥ watermark; older ones can never match a future
            # click (Spark drops rows below the watermark before this
            # operator, so future clicks have c ≥ wm, and a match
            # needs c ≤ p).
            pending.extend(clicks)
            all_p = recent_p + purchases
            for p in all_p:
                pending = [c for c in pending if not (c <= p <= c + timeout_ms)]
            recent_p = sorted(p for p in set(all_p) if p >= wm)
        else:
            recent_p = [p for p in recent_p if p >= wm]
        expired = sorted(c for c in pending if c + timeout_ms <= wm)
        pending = [c for c in pending if c + timeout_ms > wm]
        if pending or recent_p:
            state.update((pending, recent_p))
            # timer must be strictly above the current watermark; a
            # purchase-only state fires once its last purchase falls
            # below the watermark, so eviction cannot leak state.
            horizon = (
                min(pending) + timeout_ms if pending else max(recent_p) + 1
            )
            state.setTimeoutTimestamp(max(horizon, wm + 1))
        elif state.exists:
            state.remove()
        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]] * len(expired), dtype="int64"),
                "click_ts_ms": pd.Series(expired, dtype="int64"),
            }
        )

    return fn


def detect_abandoned_stream(
    events: DataFrame, timeout_ms: int = 900_000, watermark: str = "1 minute"
) -> DataFrame:
    """T7 streaming timers: clicks with no purchase by the same user
    within `timeout_ms` — the reference's order-no-pay-within-15-min
    keyed process function + registered timer [R], on GroupState
    event-time timeouts (``applyInPandasWithState`` +
    ``GroupStateTimeout.EventTimeTimeout`` — protobuf-free, unlike
    transformWithStateInPandas timers). Streaming twin of the batch
    ``abandoned_clicks_daily`` anti-join.

    Scale: state is O(unmatched clicks within the timeout horizon)
    per user, partitioned by user_id; the watermark bounds state
    lifetime to timeout + watermark delay.

    Watermark semantics caveat (pinned by tests/test_streaming.py::
    test_abandoned_stream_same_timestamp_purchase_first_in_batch):
    Catalyst pushes the deterministic click/purchase filter BELOW the
    EventTimeWatermark node, so only click/purchase rows advance the
    watermark — other event types are cut before tracking. Timers
    therefore fire on click/purchase event-time progress, not on
    arbitrary traffic; a quiet stream holds its timeouts until the
    next click or purchase arrives (standard event-time behavior —
    use a processing-time fallback if wall-clock firing is needed)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    prepared = (
        events.withWatermark("ts", watermark)
        .filter(F.col("event_type").isin("click", "purchase"))
        # keep ts: the watermark's event-time column must survive the
        # projection for EventTimeTimeout to be legal
        .select("user_id", "event_type", "ts", F.unix_millis("ts").alias("ts_ms"))
    )
    out = prepared.groupBy("user_id").applyInPandasWithState(
        _make_abandoned_fn(timeout_ms),
        outputStructType=ABANDONED_OUTPUT_SCHEMA,
        stateStructType=ABANDONED_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.select("user_id", F.timestamp_millis("click_ts_ms").alias("click_ts"))


def tag_new_vs_returning(events: DataFrame, output_mode: str = "append") -> DataFrame:
    """Tag each event is_new/returning via keyed state (T6). `events`
    is a streaming DataFrame with (user_id, event_id, ts)."""
    import sys

    from pyspark import cloudpickle

    # Executor python workers don't necessarily have this repo on
    # sys.path (the driver may be launched from any cwd); pickle the
    # state function's module by value so the payload is portable.
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    prepared = events.select(
        "user_id", "event_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _first_visit_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
