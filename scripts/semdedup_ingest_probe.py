#!/usr/bin/env python
"""Attribute the semantic-dedup ingest batch-to-batch wall variance
(VERDICT r11 item 6 / "What's missing" #6: the r11 sf1 reading showed
a 2.7× per-batch spread with no growth trend, provisionally blamed on
"GC/JIT noise on the 7.6M-pair probe join" — this script measures
instead of guessing).

Design: the sink (streaming/semdedup.py) is run UNMODIFIED — every
diagnostic is either sampled between batches (JVM GC time, which is
monotone counters read in microseconds) or derived POST-RUN from the
sink's own durable outputs, so the measured walls are the production
walls, not walls + instrumentation:

- survivor index rows carry ``first_seen_batch`` ⇒ the survivor set
  visible to batch i is exactly {rows: first_seen_batch < i};
- per-batch outputs carry (vec_id, block, status) ⇒ batch membership
  and classification mix;
- probe-join pair count for batch i = Σ_block |batch_i ∩ block| ×
  |survivors_before_i ∩ block| — the exact row count of the sink's
  block-equi-join before the threshold filter (two tiny group-bys,
  no embedding math).

Output: one JSON line with per-batch {wall_s, gc_ms (delta during
the batch), probe_pairs, survivors_before, kept/dup mix} plus a
verdict block: wall spread, wall-minus-GC spread, and the Pearson
correlation of wall against gc and against pairs — the numbers
BASELINE.md's attribution paragraph cites.

Usage: python scripts/semdedup_ingest_probe.py
         [--sf /root/repo/.scratch/sf1native] [--n-batches 8]
         [--sem-blocks 4096] [--threshold 0.40]
"""

from __future__ import annotations

import argparse
import json
import math
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _jvm_gc_ms(spark) -> int:
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def _pearson(xs: list[float], ys: list[float]) -> float | None:
    n = len(xs)
    if n < 3:
        return None
    mx, my = sum(xs) / n, sum(ys) / n
    sx = math.sqrt(sum((x - mx) ** 2 for x in xs))
    sy = math.sqrt(sum((y - my) ** 2 for y in ys))
    if sx == 0 or sy == 0:
        return None
    return round(
        sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / (sx * sy), 3
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=str(REPO / ".scratch" / "sf1native"))
    ap.add_argument("--n-batches", type=int, default=8)
    ap.add_argument("--sem-blocks", type=int, default=4096)
    ap.add_argument("--threshold", type=float, default=0.40)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from flink_realtime_edu_spark.session import get_spark
    from flink_realtime_edu_spark.sources import load
    from flink_realtime_edu_spark.streaming.semdedup import (
        streaming_semantic_dedup,
    )
    from flink_realtime_edu_spark.streaming.sinks import run_to_completion

    spark = get_spark()
    tmp = Path(tempfile.mkdtemp(prefix="semprobe_"))
    try:
        emb = load(spark, args.sf, "embeddings").select(
            "vec_id",
            (F.col("vec_id") % args.sem_blocks).cast("long").alias("block"),
            "embedding",
        )
        n_vecs = emb.count()
        src = tmp / "emb_src"
        emb.repartition(args.n_batches).write.parquet(str(src))

        index_dir = str(tmp / "sem_idx")
        out_dir = str(tmp / "sem_out")
        sink = streaming_semantic_dedup(
            index_dir, out_dir, threshold=args.threshold
        )

        walls: list[float] = []
        gc_deltas: list[int] = []

        def timed(df, bid):
            g0 = _jvm_gc_ms(spark)
            t0 = time.monotonic()
            sink(df, bid)
            walls.append(round(time.monotonic() - t0, 2))
            gc_deltas.append(_jvm_gc_ms(spark) - g0)

        t0 = time.monotonic()
        q = (
            spark.readStream.schema(
                "vec_id long, block long, embedding array<float>"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(timed)
            .option("checkpointLocation", str(tmp / "sem_ckpt"))
            .start()
        )
        run_to_completion(q)
        total_wall = time.monotonic() - t0

        # ---- post-run derivation (zero in-run overhead) ----
        out = spark.read.option("basePath", out_dir).parquet(out_dir)
        idx = spark.read.parquet(index_dir).dropDuplicates(
            ["vec_id", "block"]
        )
        batches = sorted(
            r.batch_id for r in out.select("batch_id").distinct().collect()
        )
        per_block_batch = {
            (r.batch_id, r.block): r.c
            for r in out.groupBy("batch_id", "block")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        # survivors visible to batch i, per block: first_seen_batch < i
        surv_rows = idx.select("block", "first_seen_batch").collect()
        status_mix = {
            (r.batch_id, r.status): r.c
            for r in out.groupBy("batch_id", "status")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }

        records = []
        for i, b in enumerate(batches):
            surv_per_block: dict[int, int] = {}
            for r in surv_rows:
                if r.first_seen_batch < b:
                    surv_per_block[r.block] = surv_per_block.get(r.block, 0) + 1
            pairs = sum(
                c * surv_per_block.get(blk, 0)
                for (bid, blk), c in per_block_batch.items()
                if bid == b
            )
            records.append(
                {
                    "batch_id": b,
                    "wall_s": walls[i] if i < len(walls) else None,
                    "gc_ms": gc_deltas[i] if i < len(gc_deltas) else None,
                    "probe_pairs": pairs,
                    "survivors_before": sum(surv_per_block.values()),
                    "n_rows": sum(
                        c
                        for (bid, _), c in per_block_batch.items()
                        if bid == b
                    ),
                    "kept": status_mix.get((b, "kept"), 0),
                    "dup_in_batch": status_mix.get((b, "dup_in_batch"), 0),
                    "dup_of_corpus": status_mix.get((b, "dup_of_corpus"), 0),
                }
            )

        ws = [r["wall_s"] for r in records if r["wall_s"] is not None]
        gs = [float(r["gc_ms"]) for r in records if r["gc_ms"] is not None]
        ps = [float(r["probe_pairs"]) for r in records]
        net = [w - g / 1000.0 for w, g in zip(ws, gs)]
        med = sorted(ws)[len(ws) // 2]
        med_net = sorted(net)[len(net) // 2]
        print(
            json.dumps(
                {
                    "metric": "semdedup_ingest_probe",
                    "sf": args.sf,
                    "rows": n_vecs,
                    "total_wall_s": round(total_wall, 1),
                    "batches": records,
                    "wall_spread": round(max(ws) / min(ws), 2),
                    "wall_max_over_median": round(max(ws) / med, 2),
                    "wall_minus_gc_spread": round(max(net) / min(net), 2),
                    "wall_minus_gc_max_over_median": round(
                        max(net) / med_net, 2
                    ),
                    "corr_wall_gc": _pearson(ws, gs),
                    "corr_wall_pairs": _pearson(ws, ps),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
