"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors __spark_entry__'s documented check: run the Spark DataFrame
and the DuckDB SQL on the same parquet, then compare row count +
column-name set + order-insensitive values, with columns sorted by
name (driver compare semantics). We compare values EXACTLY — the
engine's determinism discipline (decimal-sum trick, rounding, unique
tie-breakers) is supposed to make both sides bit-identical; any
mismatch here is a real bug, not noise.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from flink_realtime_edu_spark.oracle_types import describe_oracle, type_mismatches
from flink_realtime_edu_spark.sources import TABLES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _norm(v):
    """Normalize a scalar for cross-engine comparison."""
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def compare(spark_df, sql: str, sf_dir: str, limit_diff: int = 5) -> None:
    """Assert Spark result == DuckDB result (order-insensitive)."""
    con = duck_connection(sf_dir)
    # DB-API description only carries generic type codes — DESCRIBE
    # gives the real SQL types. Driver's value hash is type-sensitive
    # (r5: HUGEINT vs BIGINT hash-fail with identical values), so
    # assert type equivalence alongside the value compare.
    duck_desc = describe_oracle(con, sql)
    tmm = type_mismatches(spark_df.schema, duck_desc)
    assert not tmm, f"result-type mismatch (driver hash would differ): {tmm}"
    cur = con.execute(sql)
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()
    con.close()

    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch:\n spark={sorted(spark_cols)}\n duck ={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    s = _normalize(spark_rows, spark_cols)
    d = _normalize(duck_rows, duck_cols)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:limit_diff]
        cols = sorted(spark_cols)
        msg = "\n".join(f" cols ={cols}\n spark={a}\n duck ={b}" for a, b in diffs)
        raise AssertionError(f"value mismatch ({len(diffs)}+ rows shown):\n{msg}")
