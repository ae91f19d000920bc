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

Here: first-visit tagging — per-user state holding the earliest seen
event day; every event is emitted tagged is_new (first-ever visit
day) vs returning. Streaming form of
queries.time_semantics.new_vs_returning_daily; tests assert
agreement with that oracle-checked batch twin.

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
