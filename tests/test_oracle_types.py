"""Registry-wide oracle type lint + regression for the r5 failure.

The driver's value hash is type-sensitive; round 5 failed two queries
whose DuckDB oracles produced HUGEINT (bare ``SUM(<int>)``) against
Spark BIGINT with identical values. This suite (a) DESCRIBEs every
registered oracle and rejects any result column outside the portable
type family — catching the next such oracle before the driver does —
and (b) pins the checker itself against the exact pre-fix r5 oracles.
"""

from __future__ import annotations

import pytest

from flink_realtime_edu_spark.oracle_types import (
    describe_oracle,
    type_equivalent,
    type_mismatches,
    unportable_duck_types,
)
from flink_realtime_edu_spark.queries import load_registry
from tests.oracle import duck_connection

REGISTRY = load_registry()
ORACLED = sorted(n for n, s in REGISTRY.items() if s.oracle)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_types_portable(con, name):
    desc = describe_oracle(con, REGISTRY[name].oracle)
    bad = unportable_duck_types(desc)
    assert not bad, (
        f"oracle {name} produces non-portable DuckDB types (would "
        f"hash-fail in the driver whatever Spark returns): {bad}"
    )


# ---------------------------------------------------------------------------
# Regression: the checker must flag the r5 failure class.
# ---------------------------------------------------------------------------

# Verbatim shape of the pre-fix late_priority_mix oracle (r5
# HASH-FAIL): bare SUM(CASE...) types as HUGEINT in DuckDB.
_PREFIX_BAD_SQL = """
SELECT l_linestatus,
  SUM(CASE WHEN l_quantity > 10 THEN 1 ELSE 0 END) AS high_line_count
FROM lineitem GROUP BY l_linestatus
"""


def test_lint_flags_prefix_r5_oracle(con):
    desc = describe_oracle(con, _PREFIX_BAD_SQL)
    bad = unportable_duck_types(desc)
    assert any("high_line_count" in b and "HUGEINT" in b.upper() for b in bad)


def test_lint_accepts_cast_fix(con):
    fixed = _PREFIX_BAD_SQL.replace(
        "END) AS high_line_count", "END) AS BIGINT) AS high_line_count"
    ).replace("SUM(CASE", "CAST(SUM(CASE")
    assert unportable_duck_types(describe_oracle(con, fixed)) == []


def test_type_equivalence_matrix():
    assert type_equivalent("bigint", "BIGINT")
    assert not type_equivalent("bigint", "HUGEINT")
    assert not type_equivalent("int", "BIGINT")
    assert type_equivalent("double", "DOUBLE")
    assert not type_equivalent("double", "DECIMAL(30,8)")
    assert type_equivalent("decimal(30,8)", "DECIMAL(30,8)")
    assert type_equivalent("string", "VARCHAR")
    assert type_equivalent("array<bigint>", "BIGINT[]")
    assert not type_equivalent("array<bigint>", "HUGEINT[]")
    assert type_equivalent("timestamp", "TIMESTAMP")


def test_type_mismatches_name_matched():
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("k", StringType()), StructField("n", LongType())]
    )
    desc = [("n", "HUGEINT"), ("k", "VARCHAR")]
    out = type_mismatches(schema, desc)
    assert out == ["n: spark=bigint duck=HUGEINT"]
