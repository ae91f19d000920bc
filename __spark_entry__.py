"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``flink_realtime_edu_spark.queries`` — the real
engine code. ``entry`` runs the flagship pricing summary at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented SURVEY.md §2
operator with its DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable no matter where the driver launched from.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from flink_realtime_edu_spark.queries import load_registry  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_registry()
    return registry["pricing_summary"].build(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle per query; omitted → driver's rows-only check."""
    return {
        name: spec.oracle
        for name, spec in load_registry().items()
        if spec.oracle is not None
    }
