"""Batch sink layouts (S4-S6): date partitioning with pruning, dim
snapshots, and read-back fidelity."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_realtime_edu_spark.sources import load
from flink_realtime_edu_spark.sources.sinks import (
    read_fact_partitioned,
    write_dim_snapshot,
    write_fact_partitioned,
)


def test_fact_partitioned_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events")
    path = str(tmp_path / "events_dt")
    write_fact_partitioned(ev, path)

    back = read_fact_partitioned(spark, path)
    assert back.count() == ev.count()

    one_day = back.filter(F.col("dt") == "2024-01-05")
    want = ev.filter(F.to_date("ts") == "2024-01-05").count()
    assert one_day.count() == want

    # Partition pruning must show up in the plan (no full-scan).
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(dt" in plan or "dt#" in plan.split(
        "PartitionFilters"
    )[1][:200]


def test_dim_snapshot_single_file(spark, sf_dir, tmp_path):
    nation = load(spark, sf_dir, "nation")
    path = tmp_path / "dim_nation"
    write_dim_snapshot(nation, str(path))
    files = list(path.glob("*.parquet"))
    assert len(files) == 1  # one footer fetch for broadcast readers
    back = spark.read.parquet(str(path))
    assert sorted(r.n_nationkey for r in back.collect()) == sorted(
        r.n_nationkey for r in nation.collect()
    )
