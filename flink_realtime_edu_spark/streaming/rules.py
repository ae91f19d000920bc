"""Dynamic rules over a live stream — the Flink BROADCAST STATE
pattern (`BroadcastProcessFunction`: a low-throughput rules stream
broadcast to every parallel instance of the main stream's operator)
re-expressed Spark-first.

Spark has no broadcast-state operator; the idiomatic equivalent is a
per-micro-batch control-plane refresh:

1. rule updates flow through the bucketed upsert store
   (:func:`~flink_realtime_edu_spark.streaming.sinks.upsert_latest_by_key`)
   — latest version per rule_id wins, exactly the "new rule replaces
   old under the same key" semantics of Flink's MapState broadcast;
2. the MAIN stream runs ``foreachBatch``: each batch re-reads the
   (tiny) rules snapshot, ``broadcast()``-joins it against the batch
   — the join is the broadcast; every executor evaluates the same
   rules version within a batch, and a published rule update takes
   effect from the next micro-batch (Flink's broadcast also has
   propagation latency; here it is one trigger);
3. matched alerts publish through the transactional commit-log sink
   keyed by batch id, so an at-least-once replay of a batch cannot
   duplicate alerts — stronger than the raw Flink pattern, which
   leaves sink idempotence to the user.

Scale: the rules side stays broadcast-sized by construction (a rules
table is KBs); the main stream never shuffles — filter + broadcast
hash join per batch, alert write partitioned like any commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

RULES_KEY = ["rule_id"]
RULES_VERSION = "version"


def evaluate_rules(events: DataFrame, rules: DataFrame) -> DataFrame:
    """One batch of events against one rules snapshot: an alert per
    (event, matching active rule). Rules match on event_type with a
    min_value threshold — the family's 'alert when a metric breaches
    a live-tuned threshold' shape. Broadcast join: the rules side is
    control-plane-sized."""
    r = rules.filter(F.col("active")).select(
        "rule_id",
        F.col("event_type").alias("r_event_type"),
        "min_value",
    )
    return (
        events.join(
            F.broadcast(r), events.event_type == r.r_event_type, "inner"
        )
        .filter(F.col("value") >= F.col("min_value"))
        .select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            "value",
            "rule_id",
            "min_value",
        )
    )


def rules_alerts_stream(
    events: DataFrame,
    rules_store: str,
    alerts_table: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start the broadcast-rules alerting job: per micro-batch,
    re-read the latest rules snapshot from ``rules_store`` (written
    by the rules upsert stream or any batch publisher), evaluate, and
    commit the batch's alerts exactly-once into ``alerts_table`` via
    the commit-log sink (txn id = batch id → replays are no-ops).

    An EMPTY batch still commits (a zero-row txn), keeping the alert
    table's commit history aligned with processed batches — except
    batches processed before any rules store exists, which commit
    nothing (there is no rule set to evaluate against)."""
    from flink_realtime_edu_spark.sources.sinks import txn_write
    from flink_realtime_edu_spark.streaming.sinks import read_upsert_table

    def process(batch: DataFrame, batch_id: int) -> None:
        import os

        spark = batch.sparkSession
        # Only the missing-store condition is tolerated (no rules
        # published yet → nothing can match). Any OTHER read failure
        # must propagate so Spark retries the batch — swallowing it
        # would advance the checkpoint and silently drop every alert
        # of this batch.
        if not os.path.isdir(rules_store):
            return
        rules = read_upsert_table(spark, rules_store)
        alerts = evaluate_rules(batch, rules)
        txn_write(alerts, alerts_table, f"batch-{batch_id}")

    return (
        events.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
