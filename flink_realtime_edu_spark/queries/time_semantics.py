"""Event-time semantics, batch-checkable forms — SURVEY.md §2.9.

The reference is a REAL-TIME warehouse [V README.md:2 "实时"]: every
DWS job is an event-time windowed aggregate with watermarks, keyed
dedup (unique visitors), first-visit repair, and timer-based timeout
detection [R]. Structured Streaming runs the SAME DataFrame code
incrementally (see flink_realtime_edu_spark/streaming/); these
queries are the batch re-expressions the DuckDB oracle can check —
Structured Streaming's prefix-consistency guarantee makes
batch == end-of-stream the right equivalence (tests assert it).

Windows here use hour-scale sizes because the testdata spans 30 days;
the streaming jobs parameterize the same durations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_realtime_edu_spark.functions import dec_sum, dec_sum_sql
from flink_realtime_edu_spark.queries import register
from flink_realtime_edu_spark.sources import load

SESSION_GAP = "12 hours"  # mean inter-event gap per user is ~10h in testdata


# --------------------------------------------------------------------------
# T1 — tumbling event-time window
# --------------------------------------------------------------------------
@register(
    "tumbling_hourly_stats",
    survey_rows=("T1", "A1", "A2"),
    bench=True,
    oracle=f"""
SELECT date_trunc('hour', ts) AS window_start, event_type,
  COUNT(*) AS n_events,
  {dec_sum_sql('value')} AS sum_value
FROM events GROUP BY 1, 2
""",
)
def tumbling_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling window per event type — the shape of every
    reference DWS job (10s windows there; 1h here for 30-day data).
    `window()` is epoch-aligned so it ≡ date_trunc('hour') exactly.
    Streaming twin: streaming/jobs.py::tumbling_stats_stream adds
    withWatermark and runs unchanged."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# T2 — sliding event-time window
# --------------------------------------------------------------------------
@register(
    "sliding_window_traffic",
    survey_rows=("T2",),
    oracle=f"""
WITH e AS (
  SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                 time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS window_start,
         value
  FROM events)
SELECT window_start, COUNT(*) AS n_events, {dec_sum_sql('value')} AS sum_value
FROM e GROUP BY 1
""",
)
def sliding_window_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 minutes (trend metrics [R]).
    Each event lands in exactly 2 overlapping windows; the oracle
    reconstructs them by unnesting the two window starts. Spark's
    `window(ts, size, slide)` explodes the same assignment internally
    — cost scales with size/slide ratio, so keep the ratio small at
    100 TB (or use tumbling + rolling-sum-over-windows)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


# --------------------------------------------------------------------------
# T3 — session window (gap-based)
# --------------------------------------------------------------------------
@register(
    "session_window_stats",
    survey_rows=("T3",),
    bench=True,
    oracle=f"""
WITH x AS (
  SELECT user_id, ts, value,
    CASE WHEN LAG(ts) OVER w IS NULL
              OR ts - LAG(ts) OVER w >= INTERVAL {SESSION_GAP.replace('hours', 'HOUR')}
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
 s AS (
  SELECT user_id, ts, value,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM x)
SELECT user_id,
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL {SESSION_GAP.replace('hours', 'HOUR')} AS session_end,
  COUNT(*) AS n_events,
  {dec_sum_sql('value')} AS session_value
FROM s GROUP BY user_id, sid
""",
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based user sessions via native `session_window` (merges
    events closer than the gap; session end = last event + gap). The
    oracle reconstructs identical sessions with lag + cumulative-sum
    session ids — also exactly how a pre-Spark-3.2 engine (or the
    reference's keyed-state job [R]) would. Session state is keyed by
    user_id → one shuffle, mergeable at any scale."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", SESSION_GAP).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value").alias("session_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


# --------------------------------------------------------------------------
# T5 — streaming dedup ≡ first event per (user, day): daily UV
# --------------------------------------------------------------------------
@register(
    "daily_unique_visitors",
    survey_rows=("T5", "U3"),
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       COUNT(DISTINCT user_id) AS uv
FROM events GROUP BY 1
""",
)
def daily_unique_visitors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily unique visitors via dropDuplicates on (user, day) — the
    batch twin of the reference's ValueState-with-TTL first-visit
    dedup [R]; streaming twin uses dropDuplicatesWithinWatermark
    (streaming/jobs.py). Dedup-then-count shuffles on (user, day)
    then (day); both keys are high-cardinality-safe."""
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    return ev.dropDuplicates(["day", "user_id"]).groupBy("day").agg(
        F.count(F.lit(1)).alias("uv")
    )


# --------------------------------------------------------------------------
# T6 — new-vs-returning repair (keyed first-visit state)
# --------------------------------------------------------------------------
@register(
    "new_vs_returning_daily",
    survey_rows=("T6", "A3"),
    oracle="""
WITH f AS (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id)
SELECT CAST(date_trunc('day', e.ts) AS DATE) AS day,
  COUNT(DISTINCT CASE WHEN date_trunc('day', f.first_ts) = date_trunc('day', e.ts)
                      THEN e.user_id END) AS new_users,
  COUNT(DISTINCT CASE WHEN date_trunc('day', f.first_ts) <> date_trunc('day', e.ts)
                      THEN e.user_id END) AS returning_users
FROM events e JOIN f USING (user_id)
GROUP BY 1
""",
)
def new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each day's visitors into new (first-ever visit that day)
    vs returning — the reference keeps first-visit-date in keyed
    ValueState [R]; batch re-expression is min(ts) over user. The
    window avoids a self-join: one shuffle on user_id, then the
    daily rollup."""
    ev = load(spark, sf_dir, "events")
    first_day = F.to_date(F.min("ts").over(Window.partitionBy("user_id")))
    tagged = ev.select(
        F.to_date("ts").alias("day"),
        "user_id",
        (first_day == F.to_date("ts")).alias("is_new"),
    )
    return tagged.groupBy("day").agg(
        F.countDistinct(F.when(F.col("is_new"), F.col("user_id"))).alias("new_users"),
        F.countDistinct(F.when(~F.col("is_new"), F.col("user_id"))).alias(
            "returning_users"
        ),
    )


# --------------------------------------------------------------------------
# CEP funnel (Flink CEP Pattern → join/window re-expression,
# SURVEY.md §2.10 exhaustiveness note)
# --------------------------------------------------------------------------
@register(
    "funnel_click_view_purchase",
    survey_rows=("J4", "W3", "A3"),
    oracle="""
SELECT
  (SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'click') AS stage_click,
  (SELECT COUNT(DISTINCT c.user_id)
   FROM events c JOIN events v
     ON c.user_id = v.user_id AND v.event_type = 'view'
    AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 6 HOUR
   WHERE c.event_type = 'click') AS stage_click_view,
  (SELECT COUNT(DISTINCT c.user_id)
   FROM events c
   JOIN events v ON c.user_id = v.user_id AND v.event_type = 'view'
    AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 6 HOUR
   JOIN events p ON v.user_id = p.user_id AND p.event_type = 'purchase'
    AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 6 HOUR
   WHERE c.event_type = 'click') AS stage_click_view_purchase
""",
)
def funnel_click_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-stage funnel (click → view ≤6h later → purchase ≤6h after
    that): users surviving each stage. The reference family does this
    with Flink CEP `Pattern.begin("click").next("view")...` [R];
    re-expressed as chained interval joins (each stage only shuffles
    on user_id, and the time bound keeps join state finite — the same
    reason the streaming form's state stays evictable)."""
    ev = load(spark, sf_dir, "events")
    six_h = F.expr("INTERVAL 6 HOURS")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    cv = clicks.join(
        views,
        (F.col("cu") == F.col("vu"))
        & (F.col("vts") >= F.col("cts"))
        & (F.col("vts") <= F.col("cts") + six_h),
    )
    cvp = cv.join(
        purchases,
        (F.col("vu") == F.col("pu"))
        & (F.col("pts") >= F.col("vts"))
        & (F.col("pts") <= F.col("vts") + six_h),
    )
    s1 = clicks.agg(F.countDistinct("cu").alias("stage_click"))
    s2 = cv.agg(F.countDistinct("cu").alias("stage_click_view"))
    s3 = cvp.agg(F.countDistinct("cu").alias("stage_click_view_purchase"))
    return s1.crossJoin(s2).crossJoin(s3)


# --------------------------------------------------------------------------
# T7 — timeout detection (CEP-lite): clicks never followed by purchase
# --------------------------------------------------------------------------
@register(
    "abandoned_clicks_daily",
    survey_rows=("T7", "J6", "J4"),
    oracle="""
SELECT CAST(date_trunc('day', c.ts) AS DATE) AS day, COUNT(*) AS n_abandoned
FROM events c
WHERE c.event_type = 'click'
  AND NOT EXISTS (
    SELECT 1 FROM events p
    WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
      AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 DAY)
GROUP BY 1
""",
)
def abandoned_clicks_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks with no purchase by the same user within 1 day — the
    reference's order-no-pay-within-15-min timer pattern (keyed
    process function + registered timer [R]) re-expressed as an
    interval anti-join; the streaming twin would use
    transformWithStateInPandas timers (streaming/stateful.py)."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").alias("c")
    purchases = ev.filter(F.col("event_type") == "purchase").alias("p")
    cond = (
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("c.ts"))
        & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 1 DAY"))
    )
    return (
        clicks.join(purchases, cond, "left_anti")
        .groupBy(F.to_date("c.ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_abandoned"))
    )
