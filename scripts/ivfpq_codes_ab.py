#!/usr/bin/env python
"""Codes-at-rest A/B for the IVF×PQ search path (VERDICT r11 item 2
done-bar: "a bytes-scanned/wall A/B at native sf1 in BASELINE.md").

Builds the IVF index over the native-sf1 embeddings, PQ-encodes it
once (pq_encode_index), writes it to parquet partitioned by cluster
id (the at-rest layout), then measures the same 10-query top-5 search
two ways:

- **codes**: ivfpq_topk over the read-back index — the ADC scan
  selects (nid, cluster, code), so the parquet reader materializes
  only those column chunks in the probed partitions;
- **floats** (bootstrap): ivfpq_topk over the same read-back index
  with the code column dropped — forces the encode-in-scan path,
  which reads the float column and re-encodes per search call.

Bytes are taken from parquet column-chunk metadata of the PROBED
partitions (total_compressed_size summed per column) — the exact
bytes a column-pruning reader materializes for each plan, measured
from the files rather than estimated. Walls are wall-clock over the
full search (scan + ADC + shortlist rerank), repeated; first run is
reported separately (JIT/codegen warmup).

Usage: python scripts/ivfpq_codes_ab.py
         [--sf /root/repo/.scratch/sf1native] [--reps 3]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _column_bytes(part_dirs: list[Path], cols: set[str]) -> int:
    import pyarrow.parquet as pq

    total = 0
    for d in part_dirs:
        for f in d.glob("*.parquet"):
            md = pq.ParquetFile(str(f)).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    # nested (array) columns appear as path prefixes
                    # like "cv.list.element"
                    root = col.path_in_schema.split(".")[0]
                    if root in cols:
                        total += col.total_compressed_size
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=str(REPO / ".scratch" / "sf1native"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n-queries", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from flink_realtime_edu_spark.operators.quantization import (
        ivfpq_topk,
        pq_encode_index,
        pq_fit_sample,
    )
    from flink_realtime_edu_spark.operators.similarity import _ivf_fit_assign
    from flink_realtime_edu_spark.session import get_spark
    from flink_realtime_edu_spark.sources import load

    spark = get_spark()
    tmp = Path(tempfile.mkdtemp(prefix="ivfpqab_"))
    try:
        emb = load(spark, args.sf, "embeddings").select("vec_id", "embedding")
        n = emb.count()
        queries = emb.filter(F.col("vec_id") < args.n_queries)
        t_fit = time.monotonic()
        assigned, centers = _ivf_fit_assign(emb, "vec_id", "embedding", 16, 42)
        cb = pq_fit_sample(emb, m=16, k=256)
        root = tmp / "index"
        t_enc = time.monotonic()
        pq_encode_index(assigned, cb).write.partitionBy("cluster").parquet(
            str(root)
        )
        t_built = time.monotonic()
        idx = spark.read.parquet(str(root))

        def run(frame):
            t = time.monotonic()
            ivfpq_topk(
                frame, centers, queries, cb, k=5, n_probe=4, rerank_r=30
            ).collect()
            return round(time.monotonic() - t, 2)

        walls = {"codes": [], "floats": []}
        for _ in range(args.reps):
            walls["codes"].append(run(idx))
            walls["floats"].append(run(idx.drop("code")))

        # probed partitions for this query set (same driver-side probe
        # math as ivfpq_topk, n_probe=4)
        import numpy as np

        qmat = np.array(
            [r.embedding for r in queries.collect()], dtype=np.float64
        )
        d2 = ((qmat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        probed = sorted(
            {int(c) for c in np.argsort(d2, axis=1)[:, :4].ravel()}
        )
        part_dirs = [root / f"cluster={c}" for c in probed]
        bytes_codes = _column_bytes(part_dirs, {"nid", "code"})
        bytes_floats = _column_bytes(part_dirs, {"nid", "cv"})

        print(
            json.dumps(
                {
                    "metric": "ivfpq_codes_at_rest_ab",
                    "sf": args.sf,
                    "rows": n,
                    "n_probed_clusters": len(probed),
                    "build_s": {
                        "ivf_fit_assign": round(t_enc - t_fit, 2),
                        "encode_and_write": round(t_built - t_enc, 2),
                    },
                    "scan_bytes": {
                        "codes_path": bytes_codes,
                        "floats_path": bytes_floats,
                        "ratio": round(bytes_floats / max(bytes_codes, 1), 2),
                    },
                    "search_wall_s": {
                        "codes_first": walls["codes"][0],
                        "codes_warm": walls["codes"][1:],
                        "floats_first": walls["floats"][0],
                        "floats_warm": walls["floats"][1:],
                    },
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
