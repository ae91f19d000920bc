"""Streaming data-quality observation — SURVEY.md §2.1 S7's
monitoring face.

The reference family side-outputs dirty records AND counts them (the
counts drive alerting on a broken upstream producer) [R — family
pattern]. In Structured Streaming the zero-cost way to get per-batch
quality counters is `DataFrame.observe`: named aggregates evaluated
INSIDE the running plan — no second scan, no extra shuffle (they ride
the existing stage as accumulator-style partial aggregates) — and
surfaced per micro-batch in `StreamingQueryProgress.observedMetrics`.

This is the right split of concerns at 100 TB: the dirty ROWS go to
their side sink exactly once (the S7 split), while the dirty COUNTS
are free metadata on the main stream's progress events — a monitoring
system consumes query progress JSON, never the data.

Works identically on batch frames (`observe` + a collect surfaces the
same named row), which is how the pytest pins batch ≡ stream counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DQ_OBSERVATION = "dq"


def with_dq_metrics(
    events: DataFrame,
    props_col: str = "props",
    value_col: str = "value",
    user_col: str = "user_id",
) -> DataFrame:
    """Attach the standard event-stream quality observation: total
    rows, rows whose props payload fails the strict parse (the S7
    dirty rule — from_json NULL or k outside [0, 100)), NULL/negative
    measure values, and NULL user ids. Pure pass-through otherwise:
    the returned frame has the same rows/schema and the aggregates
    evaluate inside the existing plan."""
    k = F.from_json(props_col, "k INT")["k"]
    return events.observe(
        DQ_OBSERVATION,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(~(k.isNotNull() & k.between(0, 99)), 1).otherwise(0)
        ).alias("n_dirty_props"),
        F.sum(
            F.when(
                F.col(value_col).isNull() | (F.col(value_col) < 0), 1
            ).otherwise(0)
        ).alias("n_bad_value"),
        F.sum(F.when(F.col(user_col).isNull(), 1).otherwise(0)).alias(
            "n_null_user"
        ),
    )


def dq_totals_from_progress(progresses: list[dict]) -> dict[str, int]:
    """Fold the per-micro-batch observedMetrics rows from
    `StreamingQuery.recentProgress` into stream totals. Batches where
    the observation is absent (empty trigger) count as zero."""
    totals = {"n_rows": 0, "n_dirty_props": 0, "n_bad_value": 0, "n_null_user": 0}
    for p in progresses:
        row = (p.get("observedMetrics") or {}).get(DQ_OBSERVATION)
        if not row:
            continue
        for key in totals:
            # sum() over an empty batch reports NULL (None), not 0 —
            # e.g. a zero-row trigger run to finalize windows.
            totals[key] += int(row[key] or 0)
    return totals
