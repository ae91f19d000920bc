#!/usr/bin/env python
"""A/B: does materializing the CEP enumeration's event set (one scan
+ windows, reused by every slot join) beat recomputing it per slot?

The enumeration references `ev` once per slot join plus the seed and
the bound job; AQE does NOT stage-reuse duplicated subtrees (the r3
lesson, measured again here), so without pinning, every reference
re-scans the events parquet and re-runs the distinct/value/window
enrichment — a (slots + 2)x scan multiplier that grows with the
pattern, invisible at sf0.01 and real at 100 TB.

Protocol: warm both variants once, then time N alternating rounds of
each on the SAME session; assert row counts AND content equality
(exceptAll both ways) before reporting. Toggled via the
_enumerate_matches(materialize_ev=...) parameter so both variants run
the identical code path otherwise.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from flink_realtime_edu_spark.operators import cep as cep_mod
    from flink_realtime_edu_spark.session import get_spark
    from flink_realtime_edu_spark.sources import load

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF_DIR
    spark = get_spark(app_name="fres-cep-ev-ab")
    ev = load(spark, sf_dir, "events")

    cases = {
        "all_matches_ranges": lambda: cep_mod.cep_all_matches(
            ev, [("click", 1, 2), ("view", 0, 1), ("purchase", 1, 1)],
            "6 hours", max_matches_per_key=5,
        ),
        "one_or_more_until": lambda: cep_mod.cep_all_matches(
            ev, [("click", 1, None), ("purchase", 1, 1)], "6 hours",
            max_matches_per_key=5, until={1: "__v > 200"},
        ),
        "greedy_views": lambda: cep_mod.cep_all_matches(
            ev, [("view", 1, None), ("purchase", 1, 1)], "12 hours",
            max_matches_per_key=5, greedy={1},
        ),
    }

    def run(mat: bool, fn) -> tuple[float, int]:
        cep_mod._MATERIALIZE_EV = mat
        df = fn()
        t0 = time.perf_counter()
        n = df.count()
        return round(time.perf_counter() - t0, 3), n

    out = {"metric": "cep_ev_materialize_ab", "sf_dir": sf_dir, "cases": {}}
    for name, fn in cases.items():
        # content equality first (counts are not enough — ADVICE r9)
        cep_mod._MATERIALIZE_EV = False
        a = fn()
        cep_mod._MATERIALIZE_EV = True
        b = fn()
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        run(False, fn); run(True, fn)  # warm both
        offs, ons = [], []
        for _ in range(3):
            offs.append(run(False, fn))
            ons.append(run(True, fn))
        assert len({n for _, n in offs + ons}) == 1
        out["cases"][name] = {
            "recompute_s": [t for t, _ in offs],
            "materialized_s": [t for t, _ in ons],
            "rows": offs[0][1],
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
