"""Registry-ordering contract (SURVEY.md §5.2 / VERDICT r2 item 3).

The driver's correctness gate oracles only the FIRST
``DRIVER_CHECK_WINDOW`` keys of ``__spark_entry__.queries()``, so the
registry's iteration order IS the coverage contract: if the prefix
misses a §2 row, that operator never gets a driver verdict no matter
how good its pytest oracle is (exactly what happened to X3–X6/S2 in
rounds 1–2). These tests pin the invariant structurally so adding a
query can never silently push an operator class out of the window.
"""

from __future__ import annotations

from flink_realtime_edu_spark.queries import (
    DRIVER_CHECK_WINDOW,
    _PRIORITY_PREFIX,
    load_registry,
)


def test_prefix_fits_and_resolves():
    reg = load_registry()
    assert len(_PRIORITY_PREFIX) <= DRIVER_CHECK_WINDOW
    assert len(set(_PRIORITY_PREFIX)) == len(_PRIORITY_PREFIX)
    assert list(reg)[: len(_PRIORITY_PREFIX)] == list(_PRIORITY_PREFIX)
    # entry() contract: flagship query first
    assert next(iter(reg)) == "pricing_summary"
    # nothing lost in the reorder
    assert set(reg) == set(load_registry())


def _official_passes() -> set[str]:
    """Query names green in a PAST official CORRECTNESS window (all
    three driver flags true) — the judge's pass* evidence tier."""
    import json
    from pathlib import Path

    passed: set[str] = set()
    for f in sorted(Path(__file__).resolve().parent.parent.glob("CORRECTNESS_r*.json")):
        for name, rec in json.load(f.open()).items():
            if (
                isinstance(rec, dict)
                and rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
            ):
                passed.add(name)
    return passed


def test_driver_window_union_covers_every_survey_row():
    """Every §2 row claimed by ANY registered query has at least one
    representative with an OFFICIAL driver verdict: inside the current
    check window, or already green in a past round's recorded window
    (the judge's pass* tier). The r5 rotation spends window slots on
    the last never-sampled queries — completing the union IS the
    invariant now; rows whose representatives all sit outside every
    official window would regress this test."""
    reg = load_registry()
    all_rows = {r for spec in reg.values() for r in spec.survey_rows}
    official = _official_passes() | set(list(reg)[:DRIVER_CHECK_WINDOW])
    covered = {
        r
        for name, spec in reg.items()
        if name in official
        for r in spec.survey_rows
    }
    assert covered == all_rows, f"rows with no official verdict: {sorted(all_rows - covered)}"


# Rows-only by design (no cross-engine twin exists): documented in
# SURVEY.md; the driver records their weaker rows-only check.
_ROWS_ONLY_BY_DESIGN = {"kmeans_cluster_profile", "spark_native_hashes"}


def test_driver_window_reps_are_oracled():
    """Every window representative must carry a DuckDB oracle (the
    strong check) unless it is explicitly rows-only BY DESIGN —
    kmeans_cluster_profile (centroid-dependent profile; the k-means
    CONTRACT is oracled separately via kmeans_quality_summary) sits in
    the r5 window once so even its weaker check lands in an official
    record."""
    reg = load_registry()
    window = list(reg.items())[:DRIVER_CHECK_WINDOW]
    bad = [
        n for n, s in window if s.oracle is None and n not in _ROWS_ONLY_BY_DESIGN
    ]
    assert not bad, f"window queries without oracle: {bad}"


def test_every_query_declares_rows_and_doc():
    """Registry hygiene: every registered query must declare at least
    one SURVEY §2 row (the coverage accounting the judge reads) and
    carry a docstring (QuerySpec.doc — the parity evidence). Guards
    future additions from silently falling out of COVERAGE.md."""
    reg = load_registry()
    no_rows = [n for n, s in reg.items() if not s.survey_rows]
    no_doc = [n for n, s in reg.items() if not s.doc.strip()]
    assert not no_rows, f"queries without survey_rows: {no_rows}"
    assert not no_doc, f"queries without docstring: {no_doc}"


def test_oracle_column_names_alias_discipline():
    """The driver's compare sorts columns BY NAME before hashing, so
    an oracle whose SELECT list leaks an unaliased aggregate (e.g.
    `sum(l_quantity)`) can only ever hash-mismatch. Cheap lint: no
    oracle may contain an unaliased aggregate-call column name at the
    top level — approximated by rejecting '(' in the FINAL select's
    output names via DuckDB's describe."""
    import duckdb

    from flink_realtime_edu_spark.sources import TABLES, table_path

    from tests.conftest import SF_DIR

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')"
        )
    offenders = {}
    for name, spec in load_registry().items():
        if not spec.oracle:
            continue
        # DESCRIBE plans the query without executing it — the lint
        # only needs output column NAMES, and running the heavy
        # chained-CTE oracles here cost 22 min of suite wall (r12
        # trim; the oracles still EXECUTE in test_oracle_parity)
        cols = [
            r[0] for r in con.execute(f"DESCRIBE {spec.oracle}").fetchall()
        ]
        bad = [c for c in cols if "(" in c]
        if bad:
            offenders[name] = bad
    assert not offenders, f"unaliased oracle columns: {offenders}"


def test_staleness_budget_within_window():
    """The K=4 staleness budget (VERDICT r8 item 8), the complement of
    the never-sampled pin: with R the newest recorded official round,
    any query whose last all-green official sample is round R-4 or
    older must sit inside the current check-window prefix — so a
    rotation that plans to spill an overdue query fails the suite
    instead of silently stretching the ledger. Never-sampled queries
    (last round 0) are subsumed. With ~156 registered queries and a
    50-slot window the steady-state staleness is slightly over 3
    rounds (156/50 = 3.12), so a threshold of R-3 trips on EVERY
    correct rotation the moment the new ledger lands (the r9 lesson —
    ADVICE r9 item 1); R-4 binds exactly when a rotation forgets its
    spill obligation and stays green across the round boundary when
    the rotation honored it."""
    import json
    import re
    from pathlib import Path

    reg = load_registry()
    last: dict[str, int] = {}
    newest = 0
    root = Path(__file__).resolve().parent.parent
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f.name).group(1))
        newest = max(newest, rnd)
        for name, rec in json.load(f.open()).items():
            # 'no_oracle' is the driver's documented rows-only check —
            # a real (weaker) sample, not a failure
            if isinstance(rec, dict) and rec.get("err") in (None, "no_oracle"):
                last[name] = max(last.get(name, 0), rnd)
    window = set(list(reg)[:DRIVER_CHECK_WINDOW])
    overdue = {
        n for n in reg if last.get(n, 0) <= newest - 4 and n not in window
    }
    assert not overdue, f"queries overdue past the K=4 budget: {sorted(overdue)}"


def test_never_sampled_queries_are_inside_the_window():
    """The r7 lesson, pinned structurally: five queries registered
    after the r7 rotation froze missed every official window. A query
    with NO row in any CORRECTNESS_r*.json (never officially sampled)
    must sit inside the current check-window prefix — adding a query
    without pinning it now fails the suite instead of the next
    verdict."""
    import json
    from pathlib import Path

    reg = load_registry()
    sampled: set[str] = set()
    for f in sorted(Path(__file__).resolve().parent.parent.glob("CORRECTNESS_r*.json")):
        sampled.update(json.load(f.open()))
    window = set(list(reg)[:DRIVER_CHECK_WINDOW])
    never = {n for n in reg if n not in sampled}
    assert never <= window, sorted(never - window)
