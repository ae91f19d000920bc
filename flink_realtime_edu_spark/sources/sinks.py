"""Batch sinks — SURVEY.md §2.1 S4/S5/S6.

The reference writes DWD facts to Kafka topics, DWS aggregates to
ClickHouse, and dimension snapshots to HBase/Phoenix [R]. The batch
equivalents here are parquet layouts chosen for the 100 TB read
path:

- fact tables partitioned by event date (`dt=YYYY-MM-DD/`): partition
  pruning turns time-range queries into directory listings;
- dimension snapshots as small overwrite tables (the HBase upsert →
  full-snapshot-overwrite mapping, correct because dims are small);
- DWS-style aggregate outputs written once per window, idempotent
  (same input → same files), so replays are safe — the batch face of
  streaming/sinks.upsert_latest_by_key.

The streaming faces (writeStream kafka / foreachBatch JDBC) live in
flink_realtime_edu_spark/streaming/sinks.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_fact_partitioned(
    df: DataFrame, path: str, ts_col: str = "ts", mode: str = "overwrite"
) -> None:
    """Write a fact table date-partitioned on its event time.

    `dt` is derived, low-cardinality (one dir per day) and prunable;
    at 100 TB add a second bucket-ish key (e.g. hash(user_id) % N)
    only if single days exceed comfortable file counts."""
    (
        df.withColumn("dt", F.date_format(ts_col, "yyyy-MM-dd"))
        .repartition("dt")  # one writer wave per partition dir
        .write.partitionBy("dt")
        .mode(mode)
        .parquet(path)
    )


def write_dim_snapshot(df: DataFrame, path: str) -> None:
    """Overwrite a dimension snapshot (S6). Dims are small by
    definition (they get broadcast in J3); coalesce to a single file
    so the broadcast read is one footer fetch."""
    df.coalesce(1).write.mode("overwrite").parquet(path)


def read_fact_partitioned(spark, path: str) -> DataFrame:
    """Read back a date-partitioned fact; `dt` filters prune
    directories before any IO (PartitionFilters in the explain)."""
    return spark.read.parquet(path)


def export_training_shards(
    df: DataFrame, path: str, n_shards: int, key_col: str, salt: str = "v1"
) -> None:
    """Deterministic sharded + shuffled training-data export.

    Training loaders want (a) fixed-count shards a 1000-worker job
    can claim independently, (b) rows shuffled so each shard is an
    unbiased sample (no source/time clumping), (c) bit-identical
    re-runs (resumable pipelines, reproducible ablations). All three
    come from hashing, never from randomness or a global sort:

    - shard  = pmod(xxhash64(key, salt), n_shards) — balanced by the
      hash, stable across runs and partitionings;
    - within-shard order = xxhash64(key, salt||'#order') — a
      deterministic shuffle (sortWithinPartitions after a shard
      repartition: per-shard local sort, no global exchange).

    One keyed shuffle total; scales linearly in rows. The salt
    versions the permutation — bump it to reshuffle epochs without
    touching the data.
    """
    shard = F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)), F.lit(n_shards))
    order = F.xxhash64(F.col(key_col), F.lit(salt + "#order"))
    (
        df.withColumn("shard", shard.cast("int"))
        .withColumn("_ord", order)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_ord")
        .drop("_ord")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )


def write_clustered(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    cluster_cols: list[str] | None = None,
    files_per_day: int = 1,
    mode: str = "overwrite",
    n_days: int | None = None,
) -> None:
    """Date-partitioned + CLUSTERED fact layout: within each `dt=`
    directory, rows are range-distributed and sorted on
    ``cluster_cols`` — the poor man's Z-order for the 1-D case, and
    the layout every 100 TB point-lookup path wants:

    - `dt` filters prune directories before any IO (as in
      :func:`write_fact_partitioned`);
    - `cluster_cols` filters prune ROW GROUPS via parquet min/max
      stats: sorting makes each row group's [min, max] window narrow
      and disjoint, so a `user_id = X` scan reads ~1 row group per
      day instead of every file (unsorted layouts have every row
      group spanning the full id range — stats prune nothing).

    `repartitionByRange` on (dt, cluster) gives ``files_per_day``
    non-overlapping files per day (range boundaries from a sampled
    sketch — deterministic enough for layout; rows are EXACTLY
    distributed by the subsequent partitionBy regardless), and
    `sortWithinPartitions` orders rows inside each file so row-group
    boundaries cut the cluster key into consecutive ranges. One
    range shuffle total; no global sort.

    Layout quality (disjoint, narrow per-row-group ranges) is pinned
    by tests/test_sinks.py with pyarrow footer inspection.
    """
    cluster_cols = cluster_cols or []
    dtd = df.withColumn("dt", F.date_format(ts_col, "yyyy-MM-dd"))
    probed = False
    if cluster_cols:
        # The day-count probe is an extra job over the input — only
        # pay it when the range layout needs a target count and the
        # caller didn't supply one. Persist around probe + write so
        # (a) the input lineage is computed once, not twice, and
        # (b) a non-deterministic upstream can't show the two jobs
        # different rows.
        if n_days is None:
            dtd.persist()
            probed = True
            n_days = dtd.select("dt").distinct().count()
        clustered = dtd.repartitionByRange(
            max(n_days * files_per_day, 1),
            F.col("dt"),
            *[F.col(c) for c in cluster_cols],
        ).sortWithinPartitions("dt", *cluster_cols)
    else:
        clustered = dtd.repartition("dt")
    try:
        clustered.write.partitionBy("dt").mode(mode).parquet(path)
    finally:
        if probed:
            dtd.unpersist()
