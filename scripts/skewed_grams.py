#!/usr/bin/env python
"""Skewed-gram adversarial A/B for ``duplicated_spans`` (VERDICT r8
item 6): measure the ``max_df`` hot-gram guard on a boilerplate-heavy
corpus. The measurement REDESIGNED the guard: the r8 left-semi
keep-join shape clocked guarded 223.8/203.2 s vs naive post-filter
179.9/89.8 s (warm) — the sort-merge semi join re-shuffled the
corpus-sized probe side and the un-reused count branch re-derived it
(AQE does not stage-reuse duplicated subtrees, the r3 lesson), while
the skew it avoided was harmless at this shape (a df=150k gram's
collect_list is ~2 MB). The r9 guard counts the STRUCTURALLY FEW hot
keys (df > max_df ⇒ at most grams/max_df of them), localCheckpoints
them, and broadcast-ANTI-joins them off the probe — keeping the
single corpus shuffle while still guarding the real failure (an
ultra-hot gram with df ≈ corpus collecting an unbounded list on one
task).

  * corpus: .scratch/sf1native documents with a fixed ~400-char
    boilerplate paragraph PREPENDED to every doc_id % 10 < 3 (30% of
    docs) — each of its ~360 overlapping 40-grams then has document
    frequency ≈ 0.3 × n_docs, the legal-footer/crawler-banner shape.
  * variant A (shipped): duplicated_spans(max_df=N) — broadcast-anti
    hot-key guard before the positions shuffle.
  * variant B (naive): the identical gram pipeline with the df filter
    applied AFTER the corpus-wide collect_list groupBy — correct and
    fast at moderate skew, an OOM at ultra-hot skew.

Both variants share the in-code gram-shuffle sizing so the ONLY
difference is the guard. Results are asserted row-identical before
timings are reported. Prints ONE JSON line for BASELINE.md. Usage:
    python scripts/skewed_grams.py [--sf-dir DIR] [--max-df 200]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

TEMPLATE = (
    "this document is provided as is without warranty of any kind "
    "either express or implied including but not limited to the "
    "implied warranties of merchantability fitness for a particular "
    "purpose or non infringement all content remains the property of "
    "the original publisher and may not be reproduced without prior "
    "written permission from the rights holder thank you for reading "
    "our standard legal boilerplate notice "
)


def naive_spans(docs, k: int, max_df: int, gram_rows_per_task: int):
    """The pre-r8 shape: same gram generation + in-code shuffle
    sizing, but the df guard runs AFTER the positions collect."""
    import math

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    txt = F.col("text")
    pos = F.explode(
        F.sequence(F.lit(1), F.length(txt) - F.lit(k - 1), F.lit(1))
    ).alias("p")
    gram = F.substring(txt, F.col("p"), k)
    grams = (
        docs.filter(F.length(txt) >= k)
        .select(F.col("doc_id"), txt, pos)
        .select("doc_id", "p", F.xxhash64(gram).alias("g"))
    )
    est = (
        docs.filter(F.length(txt) >= k)
        .agg(F.sum(F.length(txt) - F.lit(k) + 1).alias("n"))
        .first()["n"]
        or 0
    )
    session_parts = int(
        docs.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    n_tasks = math.ceil(est / gram_rows_per_task)
    if n_tasks > session_parts:
        grams = grams.repartition(n_tasks, "g")
    grouped = grams.groupBy("g").agg(
        F.count(F.lit(1)).alias("df"),
        F.collect_list(F.struct(F.col("doc_id"), F.col("p"))).alias("occ"),
    )
    dup = grouped.filter((F.col("df") >= 2) & (F.col("df") <= max_df))
    hits = dup.select(F.explode("occ").alias("o")).select(
        F.col("o.doc_id").alias("doc_id"), F.col("o.p").alias("p")
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    return (
        hits.withColumn(
            "brk",
            F.when(F.col("p") - F.lag("p").over(w) <= k, F.lit(0)).otherwise(
                F.lit(1)
            ),
        )
        .withColumn(
            "span_seq",
            F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "span_seq")
        .agg(
            F.min("p").alias("span_start"),
            (F.max("p") - F.min("p") + F.lit(k)).alias("span_len"),
        )
        .drop("span_seq")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=str(REPO / ".scratch" / "sf1native"))
    ap.add_argument("--max-df", type=int, default=200)
    ap.add_argument("--k", type=int, default=40)
    ap.add_argument("--boiler-tenths", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from flink_realtime_edu_spark.operators.dedup import duplicated_spans
    from flink_realtime_edu_spark.session import get_spark
    from flink_realtime_edu_spark.sources import load

    spark = get_spark(app_name="fres-skewed-grams")
    docs = load(spark, args.sf_dir, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 < args.boiler_tenths,
            F.concat(F.lit(TEMPLATE), F.col("text")),
        ).otherwise(F.col("text")),
    )
    n_docs = docs.count()

    def timed(df) -> tuple[float, int]:
        t0 = time.perf_counter()
        n = df.count()
        return round(time.perf_counter() - t0, 2), n

    # JVM/page-cache warmup through the same operator at small scale
    duplicated_spans(
        docs.filter(F.col("doc_id") % 100 == 0),
        k=args.k,
        max_df=args.max_df,
    ).count()

    guarded = duplicated_spans(docs, k=args.k, max_df=args.max_df)
    naive = naive_spans(docs, args.k, args.max_df, 4_000_000)
    t_naive, n_naive = timed(naive)
    t_guarded, n_guarded = timed(guarded)
    # second warm readings, reversed order (first-run bias check)
    t_guarded2, _ = timed(guarded)
    t_naive2, _ = timed(naive)
    assert n_naive == n_guarded, (n_naive, n_guarded)
    # content equality, not just counts (ADVICE r9): both directions
    # of exceptAll must be empty for the A/B claim to hold
    extra = naive.exceptAll(guarded).count()
    missing = guarded.exceptAll(naive).count()
    assert extra == 0 and missing == 0, (extra, missing)

    print(
        json.dumps(
            {
                "metric": "skewed_gram_max_df_ab",
                "sf_dir": args.sf_dir,
                "n_docs": n_docs,
                "boiler_frac": args.boiler_tenths / 10,
                "template_chars": len(TEMPLATE),
                "max_df": args.max_df,
                "k": args.k,
                "span_rows": n_guarded,
                "guarded_s": [t_guarded, t_guarded2],
                "naive_post_filter_s": [t_naive, t_naive2],
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
