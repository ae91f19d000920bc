"""Late-data reconciliation — the batch twin of Flink's allowed
lateness (SURVEY.md §2.9 T4 closure; VERDICT r4 next-round item 2).

Spark's watermark DROPS rows older than (max event time seen −
delay); the Flink family instead re-fires corrected window results
for late rows inside the allowed-lateness horizon [R — family
pattern]. The batch re-expression: classify every event as on-time
or late against the SAME watermark rule replayed over a
deterministic arrival order, then emit the corrected aggregates for
exactly the windows that received late data — the repair delta an
allowed-lateness operator would re-fire, and the frame the
streaming-side repair (streaming/late.py) upserts into the bucketed
store.

Arrival model: the testdata's events are perfectly ordered by
event_id (zero natural lateness), so arrival time is simulated as
``ts + jitter`` with a content-derived deterministic jitter —
``ascii(first md5 hex char of event_id) × 300 s`` (4 h – 8.5 h) —
reproducible bit-identically in both engines, no RNG state (the
md5-shuffle discipline of token_budget_sample). The watermark at an
event's arrival is the running max of EVENT time over all earlier
arrivals; an event is late iff ``ts < watermark − 2 h``.

Scale posture: the running max over arrival order is computed
TWO-LEVEL like packing.py's prefix sums — a global orderBy window
would serialize 100 TB onto one reducer. Shards are arrival-DAY
ranges (a prefix of the (arrival, event_id) ordering key, so shard
order ≡ arrival order and the sharded running max is EXACT): a local
exclusive max inside each day + one tiny window over the per-day max
frame (#days rows, broadcast back). The final aggregate is one hash
shuffle on (window, event_type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_realtime_edu_spark.functions import dec_sum, dec_sum_sql
from flink_realtime_edu_spark.queries import register
from flink_realtime_edu_spark.sources import load

ALLOWED_LATENESS = "2 hours"
_JITTER_S = 300  # seconds per ascii unit of the md5 jitter


def with_arrival_and_late_flag(
    ev: DataFrame, delay: str = ALLOWED_LATENESS
) -> DataFrame:
    """Add ``arr`` (simulated deterministic arrival time) and
    ``is_late`` (event-time older than the running watermark at its
    arrival minus ``delay``) to an events frame. The running max is
    two-level sharded on arrival day — see the module docstring."""
    t = ev.withColumn(
        "delay_s",
        F.ascii(F.substring(F.md5(F.col("event_id").cast("string")), 1, 1))
        * _JITTER_S,
    ).withColumn(
        "arr", F.expr("ts + make_interval(0, 0, 0, 0, 0, 0, delay_s)")
    ).drop("delay_s")
    t = t.withColumn("__shard", F.expr("unix_seconds(arr) div 86400"))
    w_local = (
        Window.partitionBy("__shard")
        .orderBy("arr", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = t.withColumn("local_max", F.max("ts").over(w_local))
    w_off = (
        Window.orderBy("__shard").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        t.groupBy("__shard")
        .agg(F.max("ts").alias("shard_max"))
        .withColumn("off", F.max("shard_max").over(w_off))
        .select("__shard", "off")
    )
    # F.greatest skips NULLs (first row of first shard → wm NULL →
    # on-time), matching the oracle's exclusive-window MAX.
    wm = F.greatest("local_max", "off")
    return (
        local.join(F.broadcast(offsets), on="__shard")
        .withColumn(
            "is_late",
            wm.isNotNull()
            & (F.col("ts") < wm - F.expr(f"INTERVAL {delay}")),
        )
        .drop("__shard", "local_max", "off")
    )


@register(
    "late_corrected_windows",
    survey_rows=("T4", "T1", "W4", "A1", "F8"),
    oracle=f"""
WITH a AS (
  SELECT event_id, ts, event_type, value,
         ts + to_seconds(ascii(substr(md5(CAST(event_id AS VARCHAR)), 1, 1))
                         * {_JITTER_S}) AS arr
  FROM events
), b AS (
  SELECT *, MAX(ts) OVER (ORDER BY arr, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM a
), f AS (
  SELECT *, (wm IS NOT NULL AND ts < wm - INTERVAL 2 HOUR) AS is_late FROM b
)
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(COUNT(*) FILTER (WHERE NOT is_late) AS BIGINT) AS n_ontime,
       CAST(COUNT(*) FILTER (WHERE is_late) AS BIGINT) AS n_late,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       COALESCE({dec_sum_sql('CASE WHEN NOT is_late THEN value END')}, 0.0)
         AS sum_value_ontime,
       {dec_sum_sql('value')} AS sum_value_corrected
FROM f GROUP BY 1, 2
HAVING COUNT(*) FILTER (WHERE is_late) > 0
""",
)
def late_corrected_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The allowed-lateness repair delta: hourly (window, event_type)
    aggregates for every window that received late data — what the
    window held when the watermark finalized it (`n_ontime` /
    `sum_value_ontime`: the values Spark's drop-late semantics left
    in the store) next to the corrected totals including the late
    slice. streaming/late.py::repair_late_windows upserts exactly
    this shape into the bucketed sink; the oracle replays the same
    arrival simulation and watermark rule with a plain global window
    (exactness of the sharded form is the equivalence)."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    f = with_arrival_and_late_flag(ev)
    late_i = F.col("is_late").cast("bigint")
    agg = (
        f.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.sum(1 - late_i).alias("n_ontime"),
            F.sum(late_i).alias("n_late"),
            F.count(F.lit(1)).alias("n_total"),
            F.coalesce(
                dec_sum(F.when(~F.col("is_late"), F.col("value"))), F.lit(0.0)
            ).alias("sum_value_ontime"),
            dec_sum("value").alias("sum_value_corrected"),
        )
        .filter(F.col("n_late") > 0)
    )
    return agg
