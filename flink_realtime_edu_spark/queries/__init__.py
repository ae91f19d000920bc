"""Query registry backing ``__spark_entry__.queries()`` / ``oracle_sql()``.

Each registered query is one row of SURVEY.md §2's operator
inventory: a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
plus (when ANSI-SQL-expressible) the DuckDB oracle string the driver
runs side-by-side. Queries without an oracle get the driver's weaker
rows-only check (B* rows in the inventory).

Conventions enforced here (SURVEY.md §5.2):
- every computed column is aliased identically in Spark and SQL;
- floating aggregates use the DECIMAL(30,8) trick from
  ``flink_realtime_edu_spark.functions`` on BOTH sides;
- results are deterministic (unique tie-breakers under limits,
  arrays sorted/joined to strings).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Builder
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    survey_rows: tuple[str, ...] = ()  # SURVEY.md §2 inventory ids covered
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default=())


QUERIES: dict[str, QuerySpec] = {}

# Modules that register queries on import (one per §2 area).
_QUERY_MODULES = (
    "pricing",
    "joins",
    "aggregates",
    "windows",
    "setops",
    "scalars",
    "json_events",
    "time_semantics",
    "llm_text",
    "dedup",
    "similarity",
    "udfs",
    "ads",
    "subqueries",
    "tpch",
    "temporal",
    "statistics",
)


def register(
    name: str,
    oracle: str | None = None,
    survey_rows: tuple[str, ...] = (),
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(
            name=name,
            build=fn,
            oracle=oracle,
            survey_rows=tuple(survey_rows),
            doc=doc or (fn.__doc__ or "").strip(),
            bench=bench,
            tags=tuple(tags),
        )
        return fn

    return deco


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(f"flink_realtime_edu_spark.queries.{mod}")
    return QUERIES
