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
import os
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


def build_native(spark, out_dir: str, sf: int = 1000) -> None:
    """NATIVE ~sf1 dataset (VERDICT r4 item 8): unique rows at 1000×
    the sf0.001 row counts, distribution-matched to FIXTURES.md,
    instead of 10× replication of sf0.1 — replication made every
    document/embedding 10-plicated, so near-dup cliques grew
    quadratically and dominated the sweep ratios with real-but-
    artificial output growth. Here dup structure is PLANTED at a
    fixed rate (~2% of documents are near/exact copies of a base doc,
    the crawl-corpus shape), so near-dup cost scales like a corpus,
    not like a replication artifact.

    All columns derive from xxhash64 of the row id (deterministic,
    distributed, no driver data); embeddings use per-label centers +
    hash-noise so label-homophily survives. Multi-file output so
    scans parallelize."""
    from pyspark.sql import functions as F

    from flink_realtime_edu_spark.sources import load

    out = Path(out_dir)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)

    def u(col, salt, mod):  # deterministic uniform int in [0, mod)
        return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(mod))

    # region/nation: tiny dims, copy the driver's verbatim.
    for t in ("region", "nation"):
        load(spark, BASE_SF, t).coalesce(1).write.parquet(str(out / f"{t}.parquet"))

    n_cust, n_supp, n_part = 150 * sf, 10 * sf, 200 * sf
    n_orders, n_events, n_docs = 1500 * sf, 1000 * sf, 500 * sf
    segs = ["AUTOMOBILE", "MACHINERY", "BUILDING", "FURNITURE", "HOUSEHOLD"]
    seg_arr = F.array(*[F.lit(s) for s in segs])

    cust = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("id")).alias("c_name"),
        u("id", "cn", 25).cast("int").alias("c_nationkey"),
        (u("id", "cb", 1_100_000) / 100.0 - 999.0).alias("c_acctbal"),
        F.element_at(seg_arr, (u("id", "cs", 5) + 1).cast("int")).alias(
            "c_mktsegment"
        ),
    )
    cust.repartition(4).write.parquet(str(out / "customer.parquet"))

    spark.range(n_supp).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.col("id")).alias("s_name"),
        u("id", "sn", 25).cast("int").alias("s_nationkey"),
        (u("id", "sb", 1_100_000) / 100.0 - 999.0).alias("s_acctbal"),
    ).coalesce(1).write.parquet(str(out / "supplier.parquet"))

    types = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
    metals = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
    spark.range(n_part).select(
        F.col("id").alias("p_partkey"),
        F.concat(F.lit("part "), F.col("id")).alias("p_name"),
        F.concat(F.lit("Brand#"), u("id", "pb", 25)).alias("p_brand"),
        F.concat(
            F.element_at(
                F.array(*[F.lit(t) for t in types]), (u("id", "pt", 6) + 1).cast("int")
            ),
            F.lit(" "),
            F.element_at(
                F.array(*[F.lit(m) for m in metals]), (u("id", "pm", 5) + 1).cast("int")
            ),
        ).alias("p_type"),
        (u("id", "ps", 50) + 1).cast("int").alias("p_size"),
        (u("id", "pr", 200_000) / 100.0 + 900.0).alias("p_retailprice"),
    ).repartition(2).write.parquet(str(out / "part.parquet"))

    statuses = F.array(F.lit("P"), F.lit("O"), F.lit("F"))
    prios = F.array(*[F.lit(p) for p in
                      ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]])
    orders = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        u("id", "oc", n_cust).alias("o_custkey"),
        F.element_at(statuses, (u("id", "os", 3) + 1).cast("int")).alias(
            "o_orderstatus"
        ),
        (u("id", "op", 45_000_000) / 100.0 + 900.0).alias("o_totalprice"),
        F.to_timestamp(
            F.date_add(F.lit("1995-01-01").cast("date"), u("id", "od", 2404).cast("int"))
        ).alias("o_orderdate"),
        F.element_at(prios, (u("id", "opr", 5) + 1).cast("int")).alias(
            "o_orderpriority"
        ),
    )
    orders.repartition(N_FILES).write.parquet(str(out / "orders.parquet"))

    # lineitem: 1-7 lines per order (avg 4 like TPC-H) via sequence.
    flags = F.array(F.lit("N"), F.lit("A"), F.lit("R"))
    li = (
        spark.range(n_orders)
        .select(
            F.col("id").alias("l_orderkey"),
            F.explode(
                F.sequence(F.lit(1), (u("id", "ln", 7) + 1).cast("int"))
            ).alias("l_linenumber"),
        )
        .withColumn("lid", F.xxhash64("l_orderkey", "l_linenumber"))
        .select(
            "l_orderkey",
            F.pmod("lid", F.lit(n_part)).alias("l_partkey"),
            F.pmod(F.xxhash64("lid", F.lit("s")), F.lit(n_supp)).alias("l_suppkey"),
            F.col("l_linenumber").cast("int"),
            (F.pmod(F.xxhash64("lid", F.lit("q")), F.lit(50)) + 1)
            .cast("double")
            .alias("l_quantity"),
            (F.pmod(F.xxhash64("lid", F.lit("e")), F.lit(9_500_000)) / 100.0 + 900.0)
            .alias("l_extendedprice"),
            (F.pmod(F.xxhash64("lid", F.lit("d")), F.lit(11)) / 100.0).alias(
                "l_discount"
            ),
            (F.pmod(F.xxhash64("lid", F.lit("t")), F.lit(9)) / 100.0).alias("l_tax"),
            F.element_at(
                flags, (F.pmod(F.xxhash64("lid", F.lit("r")), F.lit(3)) + 1).cast("int")
            ).alias("l_returnflag"),
            F.when(
                F.pmod(F.xxhash64("lid", F.lit("ls")), F.lit(2)) == 0, F.lit("O")
            ).otherwise(F.lit("F")).alias("l_linestatus"),
            F.to_timestamp(
                F.date_add(
                    F.lit("1995-01-01").cast("date"),
                    F.pmod(F.xxhash64("lid", F.lit("sd")), F.lit(2500)).cast("int"),
                )
            ).alias("l_shipdate"),
        )
    )
    li.repartition(N_FILES).write.parquet(str(out / "lineitem.parquet"))

    etypes = F.array(*[F.lit(t) for t in ["click", "purchase", "error", "signup", "view"]])
    spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1704067200000000)  # 2024-01-01 UTC
            + F.pmod(F.xxhash64("id", F.lit("ts")), F.lit(30 * 86400 * 1000000))
        ).alias("ts"),
        u("id", "eu", 20 * sf).alias("user_id"),
        F.element_at(etypes, (u("id", "et", 5) + 1).cast("int")).alias("event_type"),
        (u("id", "ev", 10000) / 100.0 + 0.01).alias("value"),
        F.concat(F.lit('{"k": '), u("id", "ek", 100), F.lit("}")).alias("props"),
    ).repartition(N_FILES).write.parquet(str(out / "events.parquet"))

    # documents: hash-sampled word soup over an engine-term vocab;
    # ~1% exact-dup + ~1% near-dup planted copies of base docs.
    vocab = (
        "join filter window aggregate shuffle partition broadcast hash sort merge "
        "scan parquet column row batch stream state checkpoint watermark trigger "
        "catalyst tungsten codegen plan stage task executor driver memory spill "
        "index bucket cluster sample skew salt range key value tuple schema type "
        "null cast string double bigint array map struct json explode flatten "
        "union distinct limit order group having select where insert update"
    ).split()
    vocab_arr = F.array(*[F.lit(w) for w in vocab])
    langs = F.array(*[F.lit(x) for x in ["en", "zh", "de", "es", "fr"]])
    base_docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), (u("id", "dw", 61) + 20).cast("int")),
                lambda i: F.element_at(
                    vocab_arr,
                    (F.pmod(F.xxhash64(F.col("id"), i), F.lit(len(vocab))) + 1).cast(
                        "int"
                    ),
                ),
            ),
        ).alias("text"),
        F.element_at(langs, (u("id", "dl", 5) + 1).cast("int")).alias("lang"),
        F.concat(F.lit("src"), u("id", "dsrc", 20)).alias("source"),
    )
    # plant dups: doc_id % 100 == 98 → exact copy of doc_id-98's text;
    # % 100 == 99 → near copy (one word appended).
    base = base_docs.withColumn(
        "copy_of",
        F.when(F.col("doc_id") % 100 >= 98, F.col("doc_id") - (F.col("doc_id") % 100) + 1)
        .otherwise(F.lit(None)),
    )
    src_text = base_docs.select(
        F.col("doc_id").alias("copy_of"), F.col("text").alias("src_text")
    )
    docs = (
        base.join(src_text, on="copy_of", how="left")
        .select(
            "doc_id",
            F.when(
                F.col("copy_of").isNotNull() & (F.col("doc_id") % 100 == 98),
                F.col("src_text"),
            )
            .when(
                F.col("copy_of").isNotNull() & (F.col("doc_id") % 100 == 99),
                F.concat(F.col("src_text"), F.lit(" shuffle")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text").cast("bigint"))
    )
    docs.repartition(N_FILES).write.parquet(str(out / "documents.parquet"))

    # embeddings: 10 label centers (hash-derived) + per-vector noise,
    # so label homophily holds; dim 64 float.
    emb = spark.range(n_docs).select(
        F.col("id").alias("vec_id"),
        u("id", "el", 10).cast("int").alias("label"),
    )
    noise = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("vec_id"), i, F.lit("en")), F.lit(2000)) / 1000.0
            - 1.0
            + (F.pmod(F.xxhash64(F.col("label").cast("long"), i), F.lit(2000)) / 500.0
               - 2.0)
        ).cast("float"),
    )
    emb.select("vec_id", noise.alias("embedding"), "label").repartition(
        N_FILES
    ).write.parquet(str(out / "embeddings.parquet"))


def bench_at(spark, sf_dir: str, names, repeats: int = 2) -> dict[str, float]:
    from flink_realtime_edu_spark.queries import load_registry

    registry = load_registry()
    timings = {}
    for name in names:
        print(f"[sweep] {sf_dir} {name}", file=sys.stderr, flush=True)
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
    one customer owns 40% of an 8M-row orders table.

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
        n_orders, n_cust, hot_frac = 8_000_000, 10_000, 0.4
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
        # decimal accumulation → associative, so the sharded and naive
        # forms are comparable EXACTLY (double sums drift by addition
        # order on the hot key's 3M-row prefix chain).
        price = F.col("o_totalprice").cast("decimal(20,2)")
        w_naive = (
            Window.partitionBy("o_custkey")
            .orderBy("o_orderdate", "o_orderkey")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        naive = orders.select(
            "o_custkey", F.sum(price).over(w_naive).alias("run")
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
            .agg(F.sum(price).alias("st"))
            .withColumn(
                "off",
                F.coalesce(
                    F.sum("st").over(w_off), F.lit(0).cast("decimal(20,2)")
                ),
            )
            .select("o_custkey", "__shard", "off")
        )
        sharded = (
            t.join(offsets, on=["o_custkey", "__shard"])
            .select(
                "o_custkey",
                (F.col("off") + F.sum(price).over(w_local)).alias("run"),
            )
        )
        t0 = time.perf_counter()
        sharded.write.format("noop").mode("overwrite").save()
        sharded_wall = time.perf_counter() - t0
        # correctness of the fast form: identical multiset of rounded sums
        mism = (
            naive.groupBy("o_custkey")
            .agg(F.sum("run").alias("s"))
            .exceptAll(sharded.groupBy("o_custkey").agg(F.sum("run").alias("s")))
            .count()
        )
        # Hard gate, not just a recorded number: a future edit that
        # breaks the shard-is-range-of-ordering-key invariant must
        # fail the sweep loudly.
        assert mism == 0, f"sharded window diverged from naive: {mism} rows"
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
    ap.add_argument("--native", action="store_true",
                    help="build/use the NATIVE sf1 dataset (unique rows, "
                         "planted dup rate) instead of 10x replication")
    ap.add_argument("--native-sf", type=float, default=1.0,
                    help="native dataset scale in sf units (1.0 = sf1; "
                         "3.0 adds the VERDICT r6 third scale point)")
    ap.add_argument("--only", default="",
                    help="comma-separated query names: restrict the sweep "
                         "to these (targeted two-point readings for new "
                         "operators without rerunning the full inventory)")
    args = ap.parse_args()
    sf_label = f"{args.native_sf:g}"
    if args.native and args.out == str(REPO / ".scratch" / "sf1d"):
        args.out = str(REPO / ".scratch" / f"sf{sf_label}native")

    # The 47-query sweep OOMs the 8 GiB default driver in GC storms
    # (BASELINE.md "sweep infra note"); pin the requirement in code
    # instead of the operator's memory (VERDICT r9 item 8). Set
    # BEFORE any JVM starts — get_spark reads this env var.
    if not args.skew:
        cur = os.environ.get("SPARK_DRIVER_MEMORY")
        need_gib = 24
        cur_gib = None
        if cur:
            m = re.fullmatch(r"(\d+)\s*([gG])", cur.strip())
            cur_gib = int(m.group(1)) if m else None
        if cur is None or (cur_gib is not None and cur_gib < need_gib):
            os.environ["SPARK_DRIVER_MEMORY"] = f"{need_gib}g"
            print(
                f"scale_stress: SPARK_DRIVER_MEMORY={cur!r} -> "
                f"{need_gib}g (the full sweep needs it; see BASELINE.md)",
                file=sys.stderr,
            )

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
        if args.native:
            build_native(spark, args.out, sf=int(1000 * args.native_sf))
        else:
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
        # r5: tokenizer apply + lateness repair + CEP + PNG decode
        "bpe_encode_stats",
        "late_corrected_windows",
        "cep_funnel_first_match",
        "cep_strict_error_runs",
        "cep_funnel_timeouts",
        "png_decode_stats",
        # r6: quantified CEP (block-native dense_rank plan) + JPEG/AVI
        # decode (fixed asset sets — constant work by construction,
        # the ratios pin per-asset decode cost staying flat)
        "cep_times_quantifier",
        "jpeg_decode_stats",
        "video_decode_stats",
        # r7: all-matches CEP enumeration (within-pruned slot joins —
        # the ratio pins horizon-bounded fanout) + color JPEG decode
        "cep_all_matches_ranges",
        "jpeg_color_decode_stats",
        # late-r7: substring-span dedup — gram volume ≈ corpus chars,
        # the most data-proportional operator in the registry; the
        # ratio pins the one-shuffle grouped-positions design
        "dup_span_stats",
        # r8: skip strategies over the enumeration (the greedy walk's
        # applyInPandas is horizon-bounded — ratios pin that), the
        # per-start negative-pattern chains (data-proportional fanout
        # = starts per key), and the two fixed-asset-set fingerprint
        # dedups (flat by construction)
        "cep_skip_past_last",
        "cep_skip_to_first",
        "cep_no_error_funnel",
        "phash_dup_stats",
        "audio_fingerprint_dups",
        # r9: iterative conditions (the value-threaded enumeration —
        # the ratio pins that the condition conjunct does not change
        # the horizon-bounded join shape) and canonical-asset
        # selection over the fixed-asset fingerprint graphs (flat by
        # construction, like its two inputs)
        "cep_iterative_condition",
        "media_dup_canonicals",
        "cep_consecutive_clicks",
        # r10: unbounded loops (the data-dependent slot bound — the
        # ratio pins that candidate-run density, not corpus size,
        # drives the plan), the stop/greedy conjunct variants over the
        # same shape, the group-repetition union, and the bigram LM
        # (two corpus hash aggregates + dictionary joins — the most
        # data-proportional r10 addition)
        "cep_one_or_more_until",
        "cep_greedy_views",
        "cep_group_times_funnel",
        "doc_bigram_perplexity",
        # late-r10: DSIR scoring (two 8-byte-key hash aggregates over
        # bigram volume ≈ corpus tokens — the tfidf/perplexity shape),
        # its Gumbel-top-k selection (same pipeline + one global
        # top-m heap), the DoReMi one-step (two LM scoring pipelines
        # + domain-sized arithmetic — the most data-proportional of
        # the selection ops), and the temperature mixture (one token
        # aggregate; included to pin that it stays corpus-size-free).
        # semdedup_label_blocks is deliberately NOT swept: its blocks
        # are the 10 labels, which at native sf1 are 50k vectors wide
        # — 12.5B within-block pairs, a documented violation of the
        # operator's bounded-block contract (SemDeDup's k-means blocks
        # are ~10k; the label stand-in only holds that bound at the
        # oracle scales). Sweeping it would measure the contract
        # violation, not the operator.
        "dsir_importance_weights",
        "dsir_gumbel_topk",
        "doremi_domain_weights",
        "domain_temperature_mixture",
        # interpolated trigram LM: three n-gram model aggregates over
        # corpus token volume — the heaviest of the LM scorers
        "doc_trigram_perplexity",
        # r11: the trained quality classifier (_QC_STEPS=6 full-batch
        # gradient steps × two 8-byte-key aggregates over bigram
        # volume — the
        # most data-proportional r11 addition; the model/gradient stay
        # 4096 rows at every scale), IVF×PQ ANN (the probed-cluster
        # ADC scan is the volume cost; the recall summary's exact
        # brute-force arm is verification-only and scales as the
        # cosine_topk baseline), and the two metadata walkers (fixed
        # 40-asset sets — flat by construction, like the codecs)
        "quality_classifier_scores",
        "ivfpq_ann_topk",
        "audio_metadata_stats",
        "video_container_stats",
        # r12: the planted-signal eval (two QC fits' worth of hash
        # aggregates over bigram volume + the rank gates) and the
        # flag-gated residual IVF×PQ (same probed-cluster ADC scan
        # shape as ivfpq_ann_topk plus the per-(query,cluster) bias).
        "quality_classifier_planted_eval",
        "ivfpq_residual_ann_topk",
        # r13: the k-NN graph ENTERS the sweep (VERDICT r12 item 3).
        # The r12 exclusion said the fixed 4-plane geometry, not the
        # operator, was what a sweep would measure (~31k-row buckets
        # at sf1); adaptive_n_planes now sizes the graph profile from
        # the corpus count (12 planes / ~122-row expected buckets at
        # sf1's 500k vectors) and the r13 per-bucket applyInPandas
        # scorer moved data volume from candidate-pairs × vector-width
        # (the r12 join shape's ~130 GB at sf1) to n·tables tagged
        # rows in and n·tables·k edges out. The persisted IVF×PQ
        # search rides along: its store builds once in the untimed
        # warmup, so the timed runs measure the WARM read-index →
        # pruned ADC scan → rerank path a real user pays per query.
        "knn_graph_sampled_recall",
        "ivfpq_persisted_ann_topk",
    ]
    names = sorted({n for n, s in load_registry().items() if s.bench} | set(extra))
    if args.only:
        want = set(args.only.split(","))
        unknown = want - set(load_registry())
        if unknown:
            raise SystemExit(f"--only names unknown queries: {sorted(unknown)}")
        names = sorted(want)
    small = bench_at(spark, BASE_SF, names)
    big = bench_at(spark, args.out, names)
    ratios = {n: round(big[n] / small[n], 2) for n in names}
    print(
        json.dumps(
            {
                "metric": f"scale_stress_native_sf{sf_label}" if args.native
                else "scale_stress_10x",
                "base_sf_dir": BASE_SF,
                "derived_dir": args.out,
                "replicas": None if args.native else REPLICAS,
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
