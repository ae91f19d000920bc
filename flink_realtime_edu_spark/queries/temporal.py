"""Versioned-table (SCD2 / temporal) queries — Flink parity for
changelog compaction and `FOR SYSTEM_TIME AS OF` joins.

The reference family maintains versioned dimension state in Flink:
a keyed changelog is compacted into validity intervals and fact rows
join the version valid at their event time (temporal table join)
[R, SURVEY.md §2.1 S2 "dim snapshots + events changelog"]. Spark has
no native temporal-join operator; this module re-expresses both
halves declaratively:

1. **Compaction** (`user_state_intervals`): the per-user event-type
   changelog collapses into SCD2-style rows (state, valid_from,
   valid_to) via gaps-and-islands — a LAG run-start flag and a
   running SUM over a ROWS frame, both partitioned by `user_id`, so
   every window sorts only within its key partition (no global
   WindowExec; survives 100 TB of events as one keyed shuffle).
2. **Temporal join** (`temporal_join_purchase_state`): purchases
   join the state interval containing their timestamp — an equi join
   on `user_id` carrying the range predicate as a join residual, so
   the physical plan is a keyed SortMergeJoin, never a cross
   product; per-user interval counts are bounded by that user's
   activity, so the residual scan is O(intervals per user).
3. **Transitions** (`state_transition_matrix`): Markov transition
   counts between consecutive COMPACTED states (self-loops removed
   by construction) — identical SQL text on both engines.

Determinism: (user_id, ts) pairs are unique in the testdata
(verified at all SFs) and ts carries no sub-microsecond component,
so window order and interval boundaries agree exactly between
Spark (micros) and DuckDB (nanos). Durations are exact BIGINT
micro sums cast to DOUBLE only for the final division; money sums
use the DECIMAL(30,8) trick (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_realtime_edu_spark.functions import dec_sum, dec_sum_sql
from flink_realtime_edu_spark.queries import register
from flink_realtime_edu_spark.sources import load


def state_intervals(events: DataFrame) -> DataFrame:
    """Compact a (user_id, ts, event_type) changelog into SCD2
    validity intervals — the Flink temporal-table build step.

    Gaps-and-islands: a run starts where event_type differs from its
    predecessor (LAG); the running count of starts numbers the runs;
    grouping by run yields one row per maximal constant-state span
    with `valid_from` = first event ts and `valid_to` = next run's
    start (NULL while the version is current). All three windows
    partition by user_id → one hash shuffle, per-key sorts only.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run_id = F.sum(
        F.when(F.col("event_type") == F.lag("event_type").over(w), F.lit(0))
        .otherwise(F.lit(1))
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    intervals = (
        events.withColumn("run_id", run_id)
        .groupBy("user_id", "run_id", F.col("event_type").alias("state"))
        .agg(F.min("ts").alias("valid_from"), F.count(F.lit(1)).alias("n_events"))
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return intervals.withColumn("valid_to", F.lead("valid_from").over(w2))


# Shared CTE text for the DuckDB oracles (the exact relational twin
# of state_intervals; {src} lets the temporal join build its state
# table from the non-purchase sub-stream).
_INTERVALS_CTE = """
runs AS (
  SELECT user_id, event_type, ts,
    CASE WHEN event_type = LAG(event_type)
           OVER (PARTITION BY user_id ORDER BY ts, event_id)
         THEN 0 ELSE 1 END AS is_start
  FROM {src}
),
numbered AS (
  SELECT user_id, event_type, ts,
    SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS run_id
  FROM runs
),
intervals AS (
  SELECT user_id, run_id, event_type AS state,
    MIN(ts) AS valid_from, COUNT(*) AS n_events
  FROM numbered GROUP BY user_id, run_id, event_type
),
versioned AS (
  SELECT user_id, state, n_events, valid_from,
    LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
      AS valid_to
  FROM intervals
)
"""


# --------------------------------------------------------------------------
# S2/W3 — changelog compaction into SCD2 intervals
# --------------------------------------------------------------------------
_INTERVALS_ORACLE = (
    "WITH "
    + _INTERVALS_CTE.format(src="events")
    + """
SELECT state,
  COUNT(*) AS n_intervals,
  CAST(SUM(n_events) AS BIGINT) AS n_events,
  ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 4)
    AS avg_events_per_interval,
  ROUND(CAST(SUM(epoch_us(valid_to) - epoch_us(valid_from)) AS DOUBLE)
        / (COUNT(valid_to) * 1000000.0), 4) AS avg_closed_duration_s
FROM versioned
GROUP BY state
"""
)


@register(
    "user_state_intervals",
    survey_rows=("S2", "W3", "A1"),
    oracle=_INTERVALS_ORACLE,
)
def user_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state census of the compacted user-state history: how many
    validity intervals each state produced, how many raw changelog
    rows they absorbed, and the mean closed-interval duration. The
    compaction itself (state_intervals) is the reusable operator;
    this aggregate is its deterministic, oracle-checkable summary."""
    iv = state_intervals(load(spark, sf_dir, "events"))
    dur_us = F.unix_micros("valid_to") - F.unix_micros("valid_from")
    return (
        iv.withColumn("dur_us", dur_us)
        .groupBy("state")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("n_events").alias("n_events"),
            F.round(
                F.sum("n_events").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_events_per_interval"),
            F.round(
                F.sum("dur_us").cast("double")
                / (F.count("dur_us") * F.lit(1000000.0)),
                4,
            ).alias("avg_closed_duration_s"),
        )
    )


# --------------------------------------------------------------------------
# S2 — CDC envelope (debezium-style {op, before, after}) → SCD2 with deletes
# --------------------------------------------------------------------------

# Envelope shape of a FlinkCDC/debezium changelog record: op ∈
# {c,u,d} (create/update/delete), event-time in epoch micros (the
# io.debezium.time.MicroTimestamp convention — millis would truncate
# the testdata's micro-precision ts), the key struct, and the
# before/after row images (after is NULL on deletes, before is NULL
# on creates — exactly debezium's contract).
CDC_ENVELOPE_SCHEMA = (
    "op string, ts_us long, event_id long, "
    "key struct<user_id:bigint>, "
    "before struct<state:string>, after struct<state:string>"
)

# Tombstone pseudo-state used internally by the delete-aware
# compaction; never appears in output intervals.
DELETED_STATE = "__deleted__"


def events_as_cdc_envelope(ev: DataFrame) -> DataFrame:
    """Serialize the events changelog into debezium-style JSON
    envelopes (one `value` string column — what a Kafka CDC topic
    carries), honoring debezium's existence contract: error events
    become tombstones (op='d', after=NULL, before=the state being
    deleted); a surviving event is a create (op='c', before=NULL)
    whenever the key does not currently exist — first event ever OR
    first after a delete — and an update (op='u', before=previous
    state) otherwise. Deletes of keys that don't exist (a leading or
    repeated error) are NOT emitted — debezium never produces a
    tombstone for an absent key, and the delete-aware compaction is
    invariant to them (the first delete of a run closes the interval;
    the rest were no-ops). The op/before derivation is one keyed
    window (no global sort)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    # Three-valued logic: isNotNull() folds the NULL lag to FALSE.
    exists = prev.isNotNull() & (prev != F.lit("error"))
    op = (
        F.when(F.col("event_type") == "error", F.lit("d"))
        .when(~exists, F.lit("c"))
        .otherwise(F.lit("u"))
    )
    after = F.when(op != "d", F.struct(F.col("event_type").alias("state")))
    before = F.when(exists, F.struct(prev.alias("state")))
    enveloped = ev.select(
        (F.col("event_type") == "error").alias("__is_del"),
        exists.alias("__exists"),
        F.to_json(
            F.struct(
                op.alias("op"),
                F.unix_micros("ts").alias("ts_us"),
                F.col("event_id"),
                F.struct(F.col("user_id")).alias("key"),
                before.alias("before"),
                after.alias("after"),
            )
        ).alias("value"),
    )
    return enveloped.filter(
        ~(F.col("__is_del") & ~F.col("__exists"))
    ).select("value")


def parse_cdc_envelope(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse a debezium-style JSON envelope column into the typed
    changelog (user_id, event_id, ts, op, state). `from_json` with the
    explicit envelope schema — malformed records surface as NULL rows
    (the S7 dirty-data rule), never exceptions. `state` is taken from
    the AFTER image (NULL for deletes; the before-image is parsed and
    available for incremental-patch consumers, but the recompute path
    deliberately ignores it — see streaming/scd2.py module doc)."""
    return df.select(
        F.from_json(F.col(value_col), CDC_ENVELOPE_SCHEMA).alias("e")
    ).select(
        F.col("e.key.user_id").alias("user_id"),
        F.col("e.event_id").alias("event_id"),
        F.timestamp_micros(F.col("e.ts_us")).alias("ts"),
        F.col("e.op").alias("op"),
        F.col("e.after.state").alias("state"),
    )


def state_intervals_cdc(changelog: DataFrame) -> DataFrame:
    """Delete-aware SCD2 compaction of an op-tagged changelog
    (user_id, event_id, ts, op, state): deletes become tombstone runs
    that CLOSE the preceding interval (its valid_to = the delete's
    ts) without opening a new one, and the key stays closed until the
    next c/u. Implemented by mapping op='d' to an internal tombstone
    state, running the ordinary gaps-and-islands compaction, then
    dropping tombstone intervals — their valid_from has already been
    propagated into the predecessor's valid_to by the LEAD."""
    ev = changelog.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("op") == "d", F.lit(DELETED_STATE))
        .otherwise(F.col("state"))
        .alias("event_type"),
    )
    return state_intervals(ev).filter(F.col("state") != DELETED_STATE)


_CDC_SCD2_ORACLE = (
    "WITH "
    + _INTERVALS_CTE.format(
        src="""(SELECT user_id, event_id, ts,
        CASE WHEN event_type = 'error' THEN '__deleted__'
             ELSE event_type END AS event_type
      FROM events)"""
    )
    + """
SELECT state,
  COUNT(*) AS n_intervals,
  COUNT(valid_to) AS n_closed,
  CAST(SUM(n_events) AS BIGINT) AS n_events,
  ROUND(CAST(SUM(epoch_us(valid_to) - epoch_us(valid_from)) AS DOUBLE)
        / (COUNT(valid_to) * 1000000.0), 4) AS avg_closed_duration_s
FROM versioned WHERE state <> '__deleted__'
GROUP BY state
"""
)


@register(
    "cdc_scd2_intervals",
    survey_rows=("S2", "P3", "F7", "W3"),
    oracle=_CDC_SCD2_ORACLE,
)
def cdc_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end CDC-envelope path (S2 realism): the events changelog
    is serialized into debezium-style `{op, before, after}` JSON
    envelopes (errors → op='d' tombstones), parsed back through the
    explicit envelope schema (`from_json` — the exact path a real
    debezium/FlinkCDC topic takes), and compacted with the
    delete-aware SCD2 rules: a delete closes the open interval and
    the key stays closed until the next create/update. Census per
    surviving state: interval count, how many are CLOSED (deletes
    show up here — compare user_state_intervals, where every last
    interval stays open), absorbed changelog rows, and mean closed
    duration. The oracle replays the op mapping and tombstone
    compaction relationally (no JSON needed — op is a pure function
    of event_type on this corpus)."""
    env = events_as_cdc_envelope(load(spark, sf_dir, "events"))
    iv = state_intervals_cdc(parse_cdc_envelope(env))
    dur_us = F.unix_micros("valid_to") - F.unix_micros("valid_from")
    return (
        iv.withColumn("dur_us", dur_us)
        .groupBy("state")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.count("valid_to").alias("n_closed"),
            F.sum("n_events").alias("n_events"),
            F.round(
                F.sum("dur_us").cast("double")
                / (F.count("dur_us") * F.lit(1000000.0)),
                4,
            ).alias("avg_closed_duration_s"),
        )
    )


# --------------------------------------------------------------------------
# J8/S2 — temporal join: purchases vs the state valid at purchase time
# --------------------------------------------------------------------------
_TEMPORAL_JOIN_ORACLE = (
    "WITH "
    + _INTERVALS_CTE.format(
        src="(SELECT * FROM events WHERE event_type <> 'purchase')"
    )
    + f"""
SELECT COALESCE(v.state, 'none') AS state_at_purchase,
  COUNT(*) AS n_purchases,
  {dec_sum_sql('p.value')} AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN versioned v
  ON v.user_id = p.user_id
 AND v.valid_from <= p.ts
 AND (p.ts < v.valid_to OR v.valid_to IS NULL)
GROUP BY COALESCE(v.state, 'none')
"""
)


@register(
    "temporal_join_purchase_state",
    survey_rows=("J8", "S2", "A1"),
    oracle=_TEMPORAL_JOIN_ORACLE,
)
def temporal_join_purchase_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink `FOR SYSTEM_TIME AS OF` re-expression: each purchase
    joins the non-purchase state interval covering its timestamp
    (half-open [valid_from, valid_to)); purchases before any state
    fall out as 'none'. Revenue then aggregates by that
    state-at-purchase. The join keys on user_id (equi) with the
    interval containment as residual — keyed shuffle, no cross
    product, exactly one matching version per purchase by
    construction (intervals partition each user's timeline)."""
    ev = load(spark, sf_dir, "events")
    states = state_intervals(ev.filter(F.col("event_type") != "purchase")).select(
        F.col("user_id").alias("s_user_id"), "state", "valid_from", "valid_to"
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = purchases.join(
        states,
        (F.col("s_user_id") == F.col("user_id"))
        & (F.col("valid_from") <= F.col("ts"))
        & ((F.col("ts") < F.col("valid_to")) | F.col("valid_to").isNull()),
        "left",
    )
    return (
        joined.groupBy(
            F.coalesce(F.col("state"), F.lit("none")).alias("state_at_purchase")
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dec_sum("value").alias("purchase_value"),
        )
    )


# --------------------------------------------------------------------------
# W3 — Markov transition matrix between compacted states
# (identical SQL text on both engines)
# --------------------------------------------------------------------------
_TRANSITIONS_SQL = (
    "WITH "
    + _INTERVALS_CTE.format(src="events")
    + """
SELECT state AS from_state, next_state AS to_state,
  COUNT(*) AS n_transitions
FROM (
  SELECT state,
    LEAD(state) OVER (PARTITION BY user_id ORDER BY valid_from)
      AS next_state
  FROM versioned
) AS chained
WHERE next_state IS NOT NULL
GROUP BY state, next_state
"""
)


@register(
    "state_transition_matrix",
    survey_rows=("W3", "S2", "A1"),
    oracle=_TRANSITIONS_SQL,
)
def state_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transition counts between consecutive COMPACTED states per
    user — the run-length encoding guarantees from_state ≠ to_state,
    making this the proper Markov chain over state changes rather
    than raw events. Identical SQL text runs on both engines
    (lifecycle 2, SURVEY.md §3.2); Catalyst plans the CTE stack as
    one keyed shuffle reused across the three window functions."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_TRANSITIONS_SQL)


# --------------------------------------------------------------------------
# T7/W3 — CEP consecutive-pattern detection: PATTERN (error{3,})
# --------------------------------------------------------------------------
_ERROR_BURST_ORACLE = (
    "WITH "
    + _INTERVALS_CTE.format(src="events")
    + """
SELECT COUNT(*) AS n_bursts,
  COUNT(DISTINCT user_id) AS n_users_with_bursts,
  CAST(MAX(n_events) AS BIGINT) AS longest_burst,
  CAST(SUM(n_events) AS BIGINT) AS error_events_in_bursts
FROM versioned
WHERE state = 'error' AND n_events >= 3
"""
)


@register(
    "error_burst_stats",
    survey_rows=("T7", "W3", "A1"),
    oracle=_ERROR_BURST_ORACLE,
)
def error_burst_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink CEP ``PATTERN (error{3,})`` analogue: maximal runs of
    >= 3 consecutive error events per user, detected on the compacted
    interval table (a run IS the match — strict contiguity within the
    user's event sequence, Flink's skip-past-last-event semantics).
    Output: burst count, affected users, the longest burst, and the
    error volume inside bursts. One keyed-window pass + one global
    agg — no per-row pattern automaton needed in batch."""
    iv = state_intervals(load(spark, sf_dir, "events"))
    bursts = iv.filter((F.col("state") == "error") & (F.col("n_events") >= 3))
    return bursts.agg(
        F.count(F.lit(1)).alias("n_bursts"),
        F.countDistinct("user_id").alias("n_users_with_bursts"),
        F.max("n_events").alias("longest_burst"),
        F.sum("n_events").alias("error_events_in_bursts"),
    )
