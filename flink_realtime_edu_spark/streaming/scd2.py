"""Continuously-maintained SCD2 dimension — the reference's DIM layer
closed into a loop (SURVEY.md §2.1 S2 + S5).

The reference maintains versioned dims from the CDC stream
continuously [R]; our batch side builds SCD2 with
``queries.temporal.state_intervals`` and the streaming side so far
only CONSUMED a prebuilt interval table (temporal_join_stream). This
module maintains one:

- every micro-batch APPENDS its raw changelog rows into a
  key-hash-bucketed parquet store (append-only — cheap, no rewrite);
- then recomputes validity intervals for the AFFECTED BUCKETS ONLY
  (batch keys hash into ≤ n_buckets partitions) and dynamically
  overwrites just those partitions of the interval table.

Why keep the raw changelog instead of incrementally patching
intervals: a late row landing INSIDE an already-compacted span with
a different state must split it — information a compacted row no
longer carries. Recomputing affected buckets from the retained
changelog is exactly the batch semantics (late data included) while
the per-batch cost stays O(affected buckets' history), not O(table).

Exactly-once: foreachBatch is at-least-once, so a replayed batch
appends duplicate changelog files; the recompute dedupes on
(user_id, event_id) before compacting, making the interval table
convergent under replays (same idempotency discipline as
``upsert_latest_by_key``). At warehouse scale the append-only
changelog gets periodic small-file compaction per bucket — a
maintenance job, not a correctness requirement.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame

from flink_realtime_edu_spark.streaming.sinks import (
    BUCKET_COL,
    check_bucket_layout,
    key_bucket_col,
    overwrite_buckets,
    read_buckets,
    read_upsert_table,
)

CHANGELOG_SUBDIR = "changelog"
INTERVALS_SUBDIR = "intervals"


def maintain_scd2_dim(store_dir: str, n_buckets: int = 8, key_col: str = "user_id"):
    """foreachBatch function maintaining an SCD2 interval table under
    ``store_dir`` from a (user_id, event_id, ts, event_type) CDC
    stream. Read the current versions with :func:`read_scd2_intervals`;
    schema matches queries.temporal.state_intervals (user_id, run_id,
    state, valid_from, n_events, valid_to)."""
    from flink_realtime_edu_spark.queries.temporal import state_intervals

    changelog_dir = str(Path(store_dir) / CHANGELOG_SUBDIR)
    intervals_dir = str(Path(store_dir) / INTERVALS_SUBDIR)

    from flink_realtime_edu_spark.queries.temporal import state_intervals_cdc

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # Changelog and intervals share one bucket count; record it at
        # the store root and refuse mismatched restarts (layout drift).
        check_bucket_layout(store_dir, n_buckets)
        # Persist: the batch plan feeds the touched-bucket probe AND
        # the changelog append (same rationale as sinks.write_bucketed).
        batch = batch_df.withColumn(
            BUCKET_COL, key_bucket_col([key_col], n_buckets)
        ).persist()
        try:
            touched = [r[0] for r in batch.select(BUCKET_COL).distinct().collect()]
            if not touched:
                return
            batch.write.mode("append").partitionBy(BUCKET_COL).parquet(changelog_dir)
        finally:
            batch.unpersist()
        history = read_buckets(spark, changelog_dir, touched).dropDuplicates(
            [key_col, "event_id"]  # replay idempotency
        )
        # An op-tagged changelog (debezium-style c/u/d, already parsed
        # via queries.temporal.parse_cdc_envelope) gets the delete-aware
        # compaction; a plain (key, ts, event_type) stream the original.
        compact = state_intervals_cdc if "op" in history.columns else state_intervals
        fresh = compact(history).withColumn(
            BUCKET_COL, key_bucket_col([key_col], n_buckets)
        )
        overwrite_buckets(fresh, intervals_dir)

    return write


def read_scd2_intervals(spark, store_dir: str) -> DataFrame:
    """Current SCD2 interval table maintained by maintain_scd2_dim."""
    return read_upsert_table(spark, str(Path(store_dir) / INTERVALS_SUBDIR))


def compact_changelog(
    spark, store_dir: str, key_col: str = "user_id", max_files_per_bucket: int = 1
) -> int:
    """Small-file maintenance for the append-only changelog: each
    micro-batch appends one file per touched bucket, so a long-lived
    stream accumulates per-bucket file counts linear in batch count.
    Rewrites every bucket that exceeds `max_files_per_bucket` down
    to ONE file (all of a bucket's rows hash to one task), with the
    (key, event_id) dedup folded in — replayed batches' duplicates
    disappear at compaction instead of being re-dropped on every
    read. Run OFFLINE — between, not during, streaming runs: the
    maintainer lists bucket dirs per batch and must not race a
    concurrent rewrite. Returns the number of buckets compacted.

    CRASH SAFETY (the changelog is the source of truth — intervals
    can be regenerated, history cannot): the compacted rows are
    STAGED to a sibling tmp directory first, then each new file is
    moved into its live bucket dir and only afterwards are that
    bucket's old files deleted. No step overwrites data in place, so
    a crash at any point leaves the live changelog either untouched,
    or with BOTH old and new files — i.e. duplicated rows, which
    every reader already folds away with the (key, event_id) dedup,
    and which the next compaction run removes. Contrast the previous
    in-place dynamic-partition overwrite fed from memory-only
    checkpoint blocks, where a crash mid-overwrite could lose
    history permanently."""
    import shutil

    changelog_dir = Path(store_dir) / CHANGELOG_SUBDIR
    staging = Path(str(changelog_dir) + ".compact-tmp")
    if staging.exists():
        # Stale staging from a crashed run; the live dir is complete
        # (possibly with duplicate files — dedup-safe), start over.
        shutil.rmtree(staging)
    fat = [
        int(d.name.split("=", 1)[1])
        for d in changelog_dir.glob(f"{BUCKET_COL}=*")
        if len(list(d.glob("*.parquet"))) > max_files_per_bucket
    ]
    if not fat:
        return 0
    rows = (
        read_buckets(spark, str(changelog_dir), fat)
        .dropDuplicates([key_col, "event_id"])
        .repartition(len(fat), BUCKET_COL)
    )
    rows.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(str(staging))
    for b in fat:
        live = changelog_dir / f"{BUCKET_COL}={b}"
        old_files = list(live.glob("*.parquet"))
        for f in (staging / f"{BUCKET_COL}={b}").glob("*.parquet"):
            # Part-file names carry a per-job UUID — no collision with
            # the live files recorded above.
            f.rename(live / f.name)
        for f in old_files:
            f.unlink()
            crc = f.parent / f".{f.name}.crc"
            if crc.exists():
                crc.unlink()
    shutil.rmtree(staging)
    return len(fat)
