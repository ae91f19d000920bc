#!/usr/bin/env python
"""Simulate the spark-graft driver's correctness gate locally.

Loads /root/repo/__spark_entry__.py exactly like the driver (spec
import, fresh module), smoke-runs entry(), then compares each
queries()[name] against its oracle_sql()[name] in DuckDB on the same
parquet (row values, column-name-sorted, order-insensitive — the
driver's compare) AND asserts result-type equivalence per column
(the driver's value hash is type-sensitive: DuckDB HUGEINT vs Spark
BIGINT hash-mismatches even with identical values — the r5 failure
class this gate previously missed). Default scope is the driver's check window (the
first DRIVER_CHECK_WINDOW registry keys); pass --all for the full
inventory or query names for a subset touched by a diff.

Usage:
  python scripts/driver_sim.py                 # entry smoke + first-50 window
  python scripts/driver_sim.py --all           # every registered query
  python scripts/driver_sim.py near_dup_minhash token_topk   # subset
  python scripts/driver_sim.py --sf /root/testdata/sf0.001   # other scale
Exit code 0 iff everything compared equal (rows-only queries count
as pass when they execute and return a schema).
"""

from __future__ import annotations

import argparse
import importlib.util
import sys

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from flink_realtime_edu_spark.oracle_types import (  # noqa: E402
    describe_oracle,
    type_mismatches,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="subset of query names")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", f"{REPO}/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    assert len(mod.entry(spark).collect()) > 0, "entry() smoke failed"

    q, o = mod.queries(), mod.oracle_sql()
    if args.names:
        names = args.names
        unknown = [n for n in names if n not in q]
        if unknown:
            print("unknown queries:", unknown)
            return 2
    elif args.all:
        names = list(q)
    else:
        from flink_realtime_edu_spark.queries import DRIVER_CHECK_WINDOW

        names = list(q)[:DRIVER_CHECK_WINDOW]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    bad = []
    for name in names:
        sdf = q[name](spark, args.sf)
        srows = sorted(
            map(repr, (tuple(r) for r in sdf.select(*sorted(sdf.columns)).collect()))
        )
        if name in o:
            # DB-API description only carries generic type codes
            # (NUMBER/STRING) — DESCRIBE gives the real SQL types.
            tmm = type_mismatches(sdf.schema, describe_oracle(con, o[name]))
            cur = con.execute(o[name])
            cols = [d[0] for d in cur.description]
            drows = sorted(
                map(
                    repr,
                    (
                        tuple(r[cols.index(c)] for c in sorted(cols))
                        for r in cur.fetchall()
                    ),
                )
            )
            ok = srows == drows and not tmm
            if not ok:
                bad.append(name)
            print(f"{name}: oracle-equal={ok} rows={len(srows)}"
                  + (f" TYPE-MISMATCH {tmm}" if tmm else ""))
        else:
            print(f"{name}: rows-only rows={len(srows)}")
    print(f"checked={len(names)} mismatches={bad or 'NONE'}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
