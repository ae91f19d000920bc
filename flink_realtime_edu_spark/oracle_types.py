"""Type-faithfulness checks for the DuckDB oracle registry.

The driver's value hash is TYPE-sensitive: it hashes serialized
result batches, so a DuckDB column typed HUGEINT (what a bare
``SUM(<int>)`` produces) never matches a Spark BIGINT even when every
printed value is identical. Round 5 shipped exactly that failure
twice (``late_priority_mix``, ``pii_redaction_stats`` — VERDICT r5
items 1-3) because the local gate compared ``repr()`` of fetched
Python values, which erases the int128/int64 distinction. This module
is the fix: a Spark-schema-vs-DuckDB-description equivalence check
used by ``scripts/driver_sim.py`` and ``tests/oracle.compare``, plus
a registry-wide lint (``tests/test_oracle_types.py``) that DESCRIBEs
every oracle and rejects any column outside the portable type family
before the real driver ever sees it.
"""

from __future__ import annotations

import re

# Spark simpleString -> DuckDB type names that serialize identically
# under a type-sensitive hash. Conservative on purpose: an unmapped
# combination is a mismatch.
_SPARK_TO_DUCK = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT", "REAL"},
    "string": {"VARCHAR"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP"},
    "boolean": {"BOOLEAN"},
    "binary": {"BLOB"},
}


def type_equivalent(spark_type: str, duck_type: str) -> bool:
    """True iff a Spark column of simpleString ``spark_type`` and a
    DuckDB column of type name ``duck_type`` serialize identically
    under the driver's type-sensitive value hash."""
    st, dt = spark_type.strip().lower(), duck_type.strip().upper()
    if st.startswith("decimal("):
        return dt == st.upper().replace(" ", "")
    if st.startswith("array<") and st.endswith(">"):
        return dt.endswith("[]") and type_equivalent(st[6:-1], dt[:-2])
    return dt in _SPARK_TO_DUCK.get(st, set())


def type_mismatches(spark_schema, duck_desc) -> list[str]:
    """Compare a Spark DataFrame schema against a DuckDB cursor
    description (name-matched, order-insensitive — driver compare
    semantics). Returns '<col>: spark=<t> duck=<t>' strings; empty
    list = type-faithful. Column-name drift is NOT reported here (the
    value compare owns that)."""
    spark_types = {f.name: f.dataType.simpleString() for f in spark_schema.fields}
    out = []
    for name, duck_t, *_ in duck_desc:
        if name not in spark_types:
            continue
        if not type_equivalent(spark_types[name], str(duck_t)):
            out.append(f"{name}: spark={spark_types[name]} duck={duck_t}")
    return out


# DuckDB result types that can hash-match SOME Spark type. HUGEINT,
# the unsigned family, INTERVAL, nested STRUCT/MAP etc. are out: an
# oracle producing them can never go green, whatever the Spark side
# does.
_PORTABLE_DUCK = re.compile(
    r"^(BIGINT|INTEGER|SMALLINT|TINYINT|DOUBLE|FLOAT|REAL|VARCHAR|DATE"
    r"|TIMESTAMP( WITH TIME ZONE)?|BOOLEAN|BLOB|DECIMAL\(\d+,\s*\d+\))"
    r"(\[\])*$"
)


def unportable_duck_types(duck_desc) -> list[str]:
    """Columns in a DuckDB cursor/DESCRIBE description whose type can
    never hash-match any Spark result type."""
    return [
        f"{name}: {duck_t}"
        for name, duck_t, *_ in duck_desc
        if not _PORTABLE_DUCK.match(str(duck_t).strip().upper())
    ]


def describe_oracle(con, sql: str) -> list[tuple[str, str]]:
    """(column, duckdb_type) pairs for an oracle via DESCRIBE — binds
    and plans the query without executing it, so the lint stays cheap
    even for oracles with materialized CTEs."""
    return [
        (r[0], r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()
    ]
