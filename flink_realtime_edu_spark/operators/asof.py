"""As-of (temporal) join — SURVEY.md §2.3 J8.

The reference family resolves "dimension value as of event time" via
Flink temporal table functions / versioned table joins [R]. Spark SQL
has no native as-of physical operator, so we re-express it with the
union + running-`last(ignorenulls)` window trick (SURVEY.md §4.3):

    union(left tagged 1, right tagged 0)
    last(right_payload, ignorenulls=True)
        OVER (PARTITION BY keys ORDER BY ts, tag, tiebreak
              ROWS UNBOUNDED PRECEDING)
    → filter tag = 1

Right rows sort BEFORE left rows at equal timestamps (tag 0 < 1), so
semantics are inclusive: the match is the right row with the greatest
right_ts <= left_ts — exactly DuckDB's
``ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts``.

Scale posture: one shuffle on the key columns + a per-partition sort
— the same cost class as a sort-merge join, with no O(n·m) pairing
and no unbounded state. Skewed keys are handled by AQE skew-join
when this is expressed as a join; here the window's partition is the
key, so salt upstream if one key dominates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS, _TAG = "__asof_ts", "__asof_is_left"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    right_tiebreak: Sequence[str] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right `payload` columns
    with right_ts <= left_ts on equal `keys` (left-outer semantics:
    no earlier right row → NULL payload)."""
    keys = list(keys)
    payload = [c for c in payload if c not in keys]
    lcols = left.columns

    tb_cols = [f"__asof_tb{i}" for i in range(len(right_tiebreak))]
    l2 = left.select(
        *lcols,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_TAG),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(t) for c, t in zip(right_tiebreak, tb_cols)],
    )
    r2 = right.select(
        *[
            (F.col(c) if c in keys else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in lcols
        ],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_TAG),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
        *[F.col(c).alias(t) for c, t in zip(right_tiebreak, tb_cols)],
    )

    order: list[Column] = [F.col(_TS), F.col(_TAG), *[F.col(t) for t in tb_cols]]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l2.unionByName(r2)
    for c in payload:
        u = u.withColumn(f"{c}{suffix}", F.last(f"__r_{c}", ignorenulls=True).over(w))
    return u.filter(F.col(_TAG) == 1).select(
        *lcols, *[f"{c}{suffix}" for c in payload]
    )
