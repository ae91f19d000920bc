"""Late-data repair for windowed stores — the streaming half of the
allowed-lateness closure (SURVEY.md §2.9 T4; batch twin
queries/late.py::late_corrected_windows).

Spark's watermark silently drops rows below (max event time − delay),
so a windowed-aggregate store fed by `foreachBatch` upsert holds the
watermark-finalized values forever. The Flink family instead re-fires
corrected results for late rows within the allowed lateness [R]. The
Spark-first equivalent is a REPAIR BATCH: given the late slice (e.g.
a replayed/backfilled file) and the event archive (the file-source
dir IS the event log; at warehouse scale, the dt-partitioned fact
table), recompute the touched windows from the archive and upsert
them into the same bucketed store the stream writes — idempotent
(recompute-from-truth, then latest-version-wins merge), so replaying
the repair is a no-op and a crash mid-repair just re-runs.

Scale: the touched-window frame is |late windows| rows (broadcast
semi join); the recompute scans only archive rows in those windows —
with a dt-partitioned archive the window range prunes partitions
before IO (pass the archive pre-filtered for that). Cost is
O(late-touched data), never O(store) or O(archive-total).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_realtime_edu_spark.functions import dec_sum
from flink_realtime_edu_spark.streaming.sinks import upsert_latest_by_key


def corrected_window_aggs(archive: DataFrame, late: DataFrame) -> DataFrame:
    """Recompute hourly (window_start, event_type) aggregates — same
    shape as streaming/jobs.py::tumbling_stats_stream — from the
    archive, restricted to the windows the late slice touches."""
    touched = late.select(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).distinct()
    return (
        archive.withColumn("window_start", F.date_trunc("hour", "ts"))
        .join(F.broadcast(touched), on=["window_start", "event_type"], how="left_semi")
        .groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("sum_value"),
        )
    )


def repair_late_windows(
    late: DataFrame,
    archive: DataFrame,
    store_dir: str,
    version: int,
    n_buckets: int | None = 8,
) -> DataFrame:
    """Upsert corrected aggregates for every window the late slice
    touches into the stream's bucketed store. ``version`` must exceed
    every version the live stream has written (e.g. max batch id + a
    repair epoch) so the corrected rows win the latest-per-key merge;
    re-running with the same inputs converges to the same state.
    Returns the corrected frame (for auditing / the repair log)."""
    corrected = corrected_window_aggs(archive, late).withColumn(
        "version", F.lit(version).cast("long")
    )
    writer = upsert_latest_by_key(
        store_dir, ["window_start", "event_type"], "version", n_buckets=n_buckets
    )
    writer(corrected, version)
    return corrected.drop("version")
