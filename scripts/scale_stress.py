#!/usr/bin/env python
"""10× scale-stress experiment (BASELINE.md scale sweep).

Derives a dataset ~10× sf0.1 (≈ sf1) from the driver's sf0.1 tables
— facts replicated 10× with shifted unique keys (join keys and dims
untouched, so join fan-outs stay realistic; document/embedding
payloads replicated verbatim, making the corpus dup-heavy, which is
exactly the dedup operators' production shape) — written as
multi-file parquet so scans actually parallelize (the driver's
single-row-group files cap scan parallelism at 1 task, BASELINE.md
caveat). Then runs the headline queries at both scales and prints a
JSON line with per-query wall times and the 10×-data wall-time
ratio. This is a PERFORMANCE artifact only: correctness stays pinned
to the driver's own tables + DuckDB oracle.

Usage: python scripts/scale_stress.py [--out /root/repo/.scratch/sf1d]
"""

from __future__ import annotations

import argparse
import json
import re
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BASE_SF = "/root/testdata/sf0.1"
REPLICAS = 10
N_FILES = 8  # files per derived fact table → scan parallelism

# (table, unique key columns to shift per replica, shift stride)
FACT_SHIFTS = {
    "orders": (["o_orderkey"], 100_000_000),
    "lineitem": (["l_orderkey"], 100_000_000),
    "events": (["event_id"], 100_000_000),
    "documents": (["doc_id"], 10_000_000),
    "embeddings": (["vec_id"], 10_000_000),
}
DIMS = ("region", "nation", "customer", "supplier", "part")


def build(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from flink_realtime_edu_spark.sources import load

    out = Path(out_dir)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    for t in DIMS:
        load(spark, BASE_SF, t).write.parquet(str(out / f"{t}.parquet"))
    for t, (key_cols, stride) in FACT_SHIFTS.items():
        base = load(spark, BASE_SF, t)
        parts = []
        for r in range(REPLICAS):
            df = base
            for kc in key_cols:
                df = df.withColumn(kc, F.col(kc) + F.lit(r * stride))
            parts.append(df)
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        union.repartition(N_FILES).write.parquet(str(out / f"{t}.parquet"))


def bench_at(spark, sf_dir: str, names, repeats: int = 2) -> dict[str, float]:
    from flink_realtime_edu_spark.queries import load_registry

    registry = load_registry()
    timings = {}
    for name in names:
        registry[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # warmup
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            registry[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
    return timings


def skew_case(spark) -> None:
    """Deliberately-skewed LSH band join: a 6 k-document duplicate
    clique collapses onto ONE (band_id, band_hash) bucket per band —
    the crawl-corpus worst case. Verifies AQE splits the hot bucket
    (SortMergeJoin(skew=true), AQEShuffleRead skewed) now that
    candidate_pairs leaves its shuffles planner-inserted, and
    snapshots the final adaptive plan to plans/candidate_pairs_skew.txt.
    Thresholds are scaled down so the sf-tiny clique registers as
    skewed; at 100 TB the 256 MB defaults fire unaided."""
    from pyspark.sql import functions as F

    from flink_realtime_edu_spark.operators.dedup import candidate_pairs, lsh_bands

    # Keep the conf block + clique corpus in sync with
    # tests/test_plans.py::test_candidate_pairs_skew_split (the pytest
    # twin of this case at smaller scale).
    skew_confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {key: spark.conf.get(key, None) for key in skew_confs}
    for key, v in skew_confs.items():
        spark.conf.set(key, v)

    n_clique, n_unique = 6000, 2000
    rows = [(i, "identical clique document body for the skew sweep " * 3)
            for i in range(n_clique)]
    rows += [(10_000 + i, f"unique doc {i} tokens {i * 7} {i * 13} {i * 29} pad")
             for i in range(n_unique)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(32)
    pairs = candidate_pairs(lsh_bands(docs))
    t0 = time.perf_counter()
    n_raw = pairs._jdf.queryExecution().executedPlan().execute().count()
    dt = time.perf_counter() - t0
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    # Same run-dependent-id normalization as dump_plans.py, so the
    # snapshot only diffs when the adaptive plan SHAPE changes.
    plan = re.sub(r"#\d+", "#N", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
    (REPO / "plans" / "candidate_pairs_skew.txt").write_text(plan)
    for key, v in saved.items():
        if v is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, v)
    print(
        json.dumps(
            {
                "metric": "skew_band_join",
                "clique_docs": n_clique,
                "unique_docs": n_unique,
                "pair_rows": n_raw,
                "wall_s": round(dt, 1),
                "skew_split": "skew=true" in plan,
                "shuffle_reused": "ReusedExchange" in plan,
            }
        )
    )


def relational_skew_case(spark) -> None:
    """Hot-key stress for the RELATIONAL core (VERDICT r4 item 4):
    one customer owns 30% of a 2M-row orders table.

    (a) Star join on the skewed key with broadcast disabled (the
        100 TB fact-to-fact case): AQE must split the hot partition
        (SortMergeJoin skew=true) instead of leaving one straggler.
    (b) Windowed running sum partitioned BY the hot key: window
        partitions cannot be AQE-split (sort-based, no partial agg),
        so the naive form serializes 30% of the data onto one task —
        the two-level sharded form (date-range shards inside the
        customer, the packing.py prefix-sum discipline) restores
        parallelism. Both walls + the ratio are recorded; results are
        asserted equal so the fast form is proven correct, not just
        fast.
    Plan twin at pytest scale: tests/test_plans.py::test_star_join_skew_split.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    skew_confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {key: spark.conf.get(key, None) for key in skew_confs}
    for key, v in skew_confs.items():
        spark.conf.set(key, v)
    try:
        n_orders, n_cust, hot_frac = 2_000_000, 10_000, 0.3
        hot_n = int(n_orders * hot_frac)
        orders = spark.range(n_orders).select(
            F.col("id").alias("o_orderkey"),
            F.when(F.col("id") < hot_n, F.lit(1))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_cust)))
            .alias("o_custkey"),
            (F.pmod(F.xxhash64("id", F.lit("p")), F.lit(10000)) / 100.0 + 1.0)
            .alias("o_totalprice"),
            F.date_add(
                F.lit("2024-01-01").cast("date"),
                F.pmod(F.xxhash64("id", F.lit("d")), F.lit(365)).cast("int"),
            ).alias("o_orderdate"),
        ).repartition(32).localCheckpoint()
        cust = spark.range(n_cust).select(
            F.col("id").alias("c_custkey"),
            F.concat(F.lit("seg"), F.pmod("id", F.lit(5))).alias("c_segment"),
        ).repartition(8).localCheckpoint()

        # (a) skewed SMJ star join + agg
        joined = (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("c_segment")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("rev"))
        )
        t0 = time.perf_counter()
        joined._jdf.queryExecution().executedPlan().execute().count()
        join_wall = time.perf_counter() - t0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        plan_n = re.sub(r"#\d+", "#N", re.sub(r"plan_id=\d+", "plan_id=N", plan))
        (REPO / "plans" / "star_join_skew.txt").write_text(plan_n)

        # (b) hot-key window: naive vs two-level sharded running sum
        w_naive = (
            Window.partitionBy("o_custkey")
            .orderBy("o_orderdate", "o_orderkey")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        naive = orders.select(
            "o_custkey", F.sum("o_totalprice").over(w_naive).alias("run")
        )
        t0 = time.perf_counter()
        naive.write.format("noop").mode("overwrite").save()
        naive_wall = time.perf_counter() - t0

        shard = F.month("o_orderdate")  # range of the ordering key
        w_local = (
            Window.partitionBy("o_custkey", "__shard")
            .orderBy("o_orderdate", "o_orderkey")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_off = (
            Window.partitionBy("o_custkey")
            .orderBy("__shard")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        t = orders.withColumn("__shard", shard)
        offsets = (
            t.groupBy("o_custkey", "__shard")
            .agg(F.sum("o_totalprice").alias("st"))
            .withColumn("off", F.coalesce(F.sum("st").over(w_off), F.lit(0.0)))
            .select("o_custkey", "__shard", "off")
        )
        sharded = (
            t.join(offsets, on=["o_custkey", "__shard"])
            .select(
                "o_custkey",
                (F.col("off") + F.sum("o_totalprice").over(w_local)).alias("run"),
            )
        )
        t0 = time.perf_counter()
        sharded.write.format("noop").mode("overwrite").save()
        sharded_wall = time.perf_counter() - t0
        # correctness of the fast form: identical multiset of rounded sums
        mism = (
            naive.groupBy("o_custkey")
            .agg(F.round(F.sum("run"), 4).alias("s"))
            .exceptAll(
                sharded.groupBy("o_custkey").agg(F.round(F.sum("run"), 4).alias("s"))
            )
            .count()
        )
    finally:
        for key, v in saved.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)
    print(
        json.dumps(
            {
                "metric": "relational_skew",
                "orders": n_orders,
                "hot_fraction": hot_frac,
                "star_join_wall_s": round(join_wall, 2),
                "star_join_skew_split": "skew=true" in plan,
                "window_naive_wall_s": round(naive_wall, 2),
                "window_sharded_wall_s": round(sharded_wall, 2),
                "window_naive_over_sharded": round(naive_wall / sharded_wall, 2),
                "window_mismatch_rows": mism,
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / ".scratch" / "sf1d"))
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--skew", action="store_true",
                    help="run only the skewed band-join case")
    args = ap.parse_args()

    if args.skew:
        from flink_realtime_edu_spark.session import get_spark

        spark = get_spark(app_name="fres-skew-stress")
        skew_case(spark)
        relational_skew_case(spark)
        spark.stop()
        return

    from flink_realtime_edu_spark.queries import load_registry
    from flink_realtime_edu_spark.session import get_spark

    spark = get_spark(app_name="fres-scale-stress")
    if not args.skip_build:
        build(spark, args.out)
    # Headline set + the heavier late-r1 pipeline operators: the point
    # of the sweep is how the WORK scales, so include the ops with
    # real data-volume-proportional cost.
    extra = [
        "tfidf_top_terms",
        "benchmark_contamination",
        "cms_token_frequencies",
        "kmeans_cluster_profile",
        "trailing_24h_user_value",
        # r1 third/fourth batches: multi-way join + decorrelation
        # shapes and the SCD2 window/temporal-join stack
        "volume_shipping_pairs",
        "nation_profit_trend",
        "excess_share_suppliers",
        "customer_order_distribution",
        "user_state_intervals",
        "temporal_join_purchase_state",
        # r3: batch-construction window passes + the md5-twin simhash
        "sequence_packing_chunks",
        "token_budget_sample",
        "near_dup_simhash",
        # r4: training-set assembly + the PQ ANN path (codebook fit is
        # sample-sized by design; the ADC scan is the volume cost)
        "training_shuffle_manifest",
        "incremental_dedup_delta",
        "pq_ann_topk",
        "near_dup_incremental",
        "bpe_merge_learning",
    ]
    names = sorted({n for n, s in load_registry().items() if s.bench} | set(extra))
    small = bench_at(spark, BASE_SF, names)
    big = bench_at(spark, args.out, names)
    ratios = {n: round(big[n] / small[n], 2) for n in names}
    print(
        json.dumps(
            {
                "metric": "scale_stress_10x",
                "base_sf_dir": BASE_SF,
                "derived_dir": args.out,
                "replicas": REPLICAS,
                "small_s": small,
                "big_s": big,
                "wall_ratio_10x_data": ratios,
                "small_total": round(sum(small.values()), 3),
                "big_total": round(sum(big.values()), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
