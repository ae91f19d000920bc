#!/usr/bin/env python
"""Kmeans-blocked SemDeDup sweep (VERDICT r10 item 7): run the
paper-shaped operator — k-means blocks, within-block pairwise cosine,
component-keep — at a chosen scale and PIN the quadratic-within-block
cost term empirically: the dominant work is Σ_blocks b_i² pairs, so
at fixed corpus doubling k should roughly halve the pair volume AND
the dedup wall. The script logs the block-size distribution (the
bounded-block contract made visible), the exact joined-pair volume,
and per-phase walls, one JSON line per (sf, k) point.

Usage:
  SPARK_DRIVER_MEMORY=24g python scripts/semdedup_sweep.py \
      --sf /root/repo/.scratch/sf1native --k 128 --k 256
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

THRESHOLD = 0.40  # semdedup_kmeans_summary's threshold


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--k", type=int, action="append",
        help="cluster counts to sweep (repeatable); default [8]",
    )
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()
    ks = args.k or [8]

    from pyspark.sql import functions as F

    from flink_realtime_edu_spark.operators.clustering import kmeans_fit
    from flink_realtime_edu_spark.operators.similarity import (
        block_pairs,
        semantic_dedup,
    )
    from flink_realtime_edu_spark.session import get_spark, materialize
    from flink_realtime_edu_spark.sources import load

    spark = get_spark(app_name="fres-semdedup-sweep")
    try:
        emb = load(spark, args.sf, "embeddings").select("vec_id", "embedding")
        n = emb.count()
        for k in ks:
            rec: dict = {"sf_dir": args.sf, "n_vectors": n, "k": k,
                         "threshold": THRESHOLD}
            t0 = time.monotonic()
            _, assigned, _ = kmeans_fit(emb, k=k, iters=args.iters)
            blocks = materialize(
                emb.join(assigned.select("vec_id", "cluster"), "vec_id")
            )
            rec["fit_assign_wall_s"] = round(time.monotonic() - t0, 2)

            sizes = (
                blocks.groupBy("cluster").count()
                .agg(
                    F.min("count").alias("mn"),
                    F.expr("percentile(count, 0.5)").alias("p50"),
                    F.max("count").alias("mx"),
                    F.sum(F.col("count") * F.col("count")).alias("sum_sq"),
                )
                .collect()[0]
            )
            rec["block_sizes"] = {
                "min": sizes["mn"], "p50": sizes["p50"], "max": sizes["mx"],
            }
            # Σ b² = the within-block join volume the quadratic term is
            # made of (ordered pairs incl. self; the filter halves it)
            rec["sum_block_sq"] = int(sizes["sum_sq"])

            t0 = time.monotonic()
            pairs = materialize(
                block_pairs(blocks, block_col="cluster", threshold=THRESHOLD)
            )
            n_pairs = pairs.count()
            rec["pairs_wall_s"] = round(time.monotonic() - t0, 2)
            rec["n_dup_pairs"] = n_pairs

            t0 = time.monotonic()
            res = materialize(
                semantic_dedup(
                    blocks, block_col="cluster", threshold=THRESHOLD,
                    pairs=pairs,
                )
            )
            pruned = res.filter(~F.col("keep")).count()
            rec["dedup_wall_s"] = round(time.monotonic() - t0, 2)
            rec["n_pruned"] = pruned
            rec["prune_rate"] = round(pruned / n, 6)
            print(json.dumps(rec), flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
