"""Measure the DuckDB-side oracle wall per registered query.

The driver's correctness gate runs every window oracle single-threaded
in DuckDB at sf0.01; one pathological oracle can own the gate budget
(the r12 lesson: quality_classifier_planted_eval's inlined CTE chain
re-evaluated the fit exponentially and pinned a core for ~25 min).
This script times each oracle at the gate scale and prints the top-N,
so oracle cost gets the same in-band attribution the bench wall got.

Usage: python scripts/oracle_walls.py [sf_dir] [--top N] [--timeout S]
Prints one JSON line: {"sf_dir": ..., "walls": {name: sec, ...}} with
walls sorted descending (full list; the top-N table goes to stderr).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from flink_realtime_edu_spark.queries import load_registry  # noqa: E402
from flink_realtime_edu_spark.sources import TABLES, table_path  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    top = 10
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, t)}')"
        )
    walls: dict[str, float] = {}
    for name, spec in load_registry().items():
        if spec.oracle is None:
            continue
        t0 = time.time()
        con.execute(spec.oracle).fetchall()
        walls[name] = round(time.time() - t0, 3)
        print(f"  {name}: {walls[name]:.3f}s", file=sys.stderr)
    ranked = dict(sorted(walls.items(), key=lambda kv: -kv[1]))
    print(f"-- top {top} oracle walls at {sf_dir} --", file=sys.stderr)
    for name, sec in list(ranked.items())[:top]:
        print(f"  {sec:8.3f}s  {name}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "walls": ranked}))


if __name__ == "__main__":
    main()
