#!/usr/bin/env python
"""Streaming state-size GROWTH curves over a long replay (VERDICT r6
item 5: "state-size curves in BASELINE.md" — observe growth, don't
just assert the bound).

Replays the sf events table as N time-ordered micro-batches (one
parquet file per batch, maxFilesPerTrigger=1) through the three
stateful-operator families and records the state store's
numRowsTotal / memoryUsedBytes after EVERY batch:

  * tumbling  — T1 windowed agg, 1 h watermark: state is open
    windows; the curve must PLATEAU at ~(1 h horizon x event types)
    once the watermark advances (eviction working).
  * cep_nottl — T7 first-match automaton, first-match-EVER
    semantics: done markers are never evicted, so on a key-churning
    stream the curve must GROW ~linearly with cumulative distinct
    keys (the documented trade-off, streaming/cep.py:37).
  * cep_ttl   — same automaton with done_ttl: the curve must BEND
    to a plateau bounded by keys active within one TTL horizon
    (the r7 eviction flag doing its job).

Key churn is synthesized by day-salting user_id (each day of the
30-day sf window brings a fresh key population) — the driver's 1 500
fixed users would cap every curve at 1 500 and show nothing. The
salting is measurement harness only; the jobs under test are the
same production functions bench.py drives.

Usage: python scripts/state_growth.py [--sf-dir DIR] [--batches N]
Prints ONE JSON line with the three curves for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def write_ordered_batches(spark, sf_dir: str, out_dir: Path, n: int) -> None:
    """n single-file parquet batches, globally time-ordered (batch i
    holds the i-th ts slice) so the watermark advances monotonically
    across the replay like a live source. Driver-side pandas is fine
    here: this is the measurement harness, not the operator."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_realtime_edu_spark.sources import load
    from pyspark.sql import functions as F

    ev = (
        load(spark, sf_dir, "events")
        # day-salt: a fresh key population every event-day
        .withColumn(
            "user_id",
            F.col("user_id") + F.dayofmonth("ts").cast("long") * F.lit(1_000_000),
        )
        .orderBy("ts", "event_id")
    )
    pdf = ev.toPandas()
    # Match the driver snapshot's on-disk ts shape (tz-naive micros,
    # the NTZ shape sniff_events_ts_shape classifies) — the session is
    # UTC so dropping the tz keeps wall-time values identical.
    if getattr(pdf["ts"].dtype, "tz", None) is not None:
        pdf["ts"] = pdf["ts"].dt.tz_localize(None)
    out_dir.mkdir(parents=True)
    size = (len(pdf) + n - 1) // n
    for i in range(n):
        chunk = pdf.iloc[i * size : (i + 1) * size]
        if chunk.empty:
            break
        tbl = pa.Table.from_pandas(chunk, preserve_index=False)
        ts_idx = tbl.schema.get_field_index("ts")
        tbl = tbl.set_column(
            ts_idx, "ts", tbl.column("ts").cast(pa.timestamp("us"))
        )
        pq.write_table(tbl, out_dir / f"batch_{i:04d}.parquet")


def state_curve(query) -> list[dict]:
    """[{batch, rows, mem_bytes, input_rows}] from progress events
    that carried a state operator."""
    curve = []
    for p in query.recentProgress:
        ops = p.get("stateOperators") or []
        if not ops:
            continue
        so = ops[0]
        curve.append(
            {
                "batch": p["batchId"],
                "rows": int(so.get("numRowsTotal") or 0),
                "mem_bytes": int(so.get("memoryUsedBytes") or 0),
                "input_rows": int(p.get("numInputRows") or 0),
            }
        )
    return curve


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--batches", type=int, default=48)
    ap.add_argument("--done-ttl", default="3 days")
    args = ap.parse_args()

    from flink_realtime_edu_spark.session import get_spark
    from flink_realtime_edu_spark.streaming.cep import cep_first_match_stream
    from flink_realtime_edu_spark.streaming.jobs import (
        load_events_stream,
        tumbling_stats_stream,
    )
    from flink_realtime_edu_spark.streaming.sinks import run_to_completion

    spark = get_spark(app_name="fres-state-growth")
    # keep every batch's progress event (default retention is 100)
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(args.batches + 16)
    )
    work = Path(tempfile.mkdtemp(prefix="fres-state-growth-"))
    out: dict[str, object] = {
        "metric": "streaming_state_growth",
        "sf_dir": args.sf_dir,
        "batches": args.batches,
        "done_ttl": args.done_ttl,
    }
    try:
        src = work / "events_src"
        write_ordered_batches(spark, args.sf_dir, src, args.batches)

        def run(name, df_fn):
            q = (
                df_fn(load_events_stream(spark, str(src), max_files_per_trigger=1))
                .writeStream.format("noop")
                .outputMode("append" if name.startswith("cep") else "update")
                .option("checkpointLocation", str(work / f"ckpt_{name}"))
                .start()
            )
            run_to_completion(q)
            curve = state_curve(q)
            out[name] = curve
            out[f"{name}_final_rows"] = curve[-1]["rows"] if curve else 0
            out[f"{name}_peak_rows"] = max((c["rows"] for c in curve), default=0)

        steps = ["view", "click", "purchase"]
        run("tumbling", lambda ev: tumbling_stats_stream(ev))
        run(
            "cep_nottl",
            lambda ev: cep_first_match_stream(ev, steps, "24 hours"),
        )
        run(
            "cep_ttl",
            lambda ev: cep_first_match_stream(
                ev, steps, "24 hours", done_ttl=args.done_ttl
            ),
        )
        # r8: negative-pattern automaton — partials must stay bounded
        # by one `within` horizon of starts (timer-pruned), done
        # markers grow with emitted keys (first-match-ever, like
        # cep_nottl); the trailing negative keeps pendings alive until
        # their horizons close, the worst-case state shape.
        from flink_realtime_edu_spark.streaming.cep import (
            cep_not_followed_by_stream,
        )

        run(
            "cep_nfb",
            lambda ev: cep_not_followed_by_stream(
                ev, ["click", "purchase", ("not", "error")], "24 hours"
            ),
        )
        # r9: the fork-tree ALL-matches NFA per skip strategy (VERDICT
        # r8 item 5) — the one automaton whose state fans out
        # combinatorially. The bound: partials = one `within` horizon
        # of enumeration fanout per key (timer-pruned), plus the
        # self-pruning strategy memory; no cap here so the curves show
        # the raw fanout (the cap knob bounds OUTPUT, state drains at
        # quiescence regardless — pinned by
        # test_cep_all_matches_stream_state_drains_at_quiescence).
        from flink_realtime_edu_spark.streaming.cep import (
            cep_all_matches_stream,
        )

        am_blocks = [("click", 1, 2), ("view", 0, 1), ("purchase", 1, 1)]
        for strat, blk in [
            ("no_skip", None),
            ("skip_to_next", None),
            ("skip_past_last_event", None),
            ("skip_to_first", 2),
            ("skip_to_last", 1),
        ]:
            run(
                f"cep_am_{strat}",
                lambda ev, s=strat, b=blk: cep_all_matches_stream(
                    ev, am_blocks, "6 hours", strategy=s, skip_block=b
                ),
            )
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
