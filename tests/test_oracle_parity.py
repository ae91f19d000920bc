"""t2-style correctness: every registered query vs its DuckDB oracle.

This is the same check the driver runs (row count + columns +
order-insensitive values), executed at sf0.001 for speed; the driver
re-runs it at sf0.01. Queries without an oracle get a rows-run smoke
check instead (driver's weaker path).
"""

from __future__ import annotations

import pytest

from flink_realtime_edu_spark.queries import load_registry
from tests.oracle import compare

REGISTRY = load_registry()
ORACLED = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if not s.oracle)

# The quality-classifier oracles replay the ENTIRE 6-step integer fit
# as a chained CTE — minutes each, the heaviest tests in the suite
# (r12 trim, VERDICT r11 item 6). Excluded from the default dev
# profile (pytest.ini: -m "not slow"); the round-close gate runs the
# FULL suite with `-m ""`, and the driver's own correctness window
# still executes these oracles officially every rotation.
_SLOW_PARITY = {
    "quality_classifier_scores",
    "quality_classifier_heldout_eval",
    "quality_classifier_planted_eval",
}
ORACLED_PARAMS = [
    pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_PARITY else n
    for n in ORACLED
]


@pytest.mark.parametrize("name", ORACLED_PARAMS)
def test_oracle_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.build(spark, sf_dir)
    compare(df, spec.oracle, sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.build(spark, sf_dir)
    # Must execute cleanly and have a stable schema; row count >= 0.
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    # Contract: every queries() key with an oracle appears in oracle_sql().
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
