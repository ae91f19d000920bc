"""Property-based tests (hypothesis) for the engine's determinism
invariants — the guarantees the oracle-compare relies on.

Sessions are expensive, so examples are few but adversarial:
hypothesis shrinks failures to minimal cases.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_realtime_edu_spark.functions import dec_sum
from flink_realtime_edu_spark.operators.asof import asof_join_backward

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

doubles = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@given(
    values=st.lists(doubles, min_size=1, max_size=60),
    n_parts=st.integers(min_value=1, max_value=7),
)
@SET
def test_dec_sum_is_partition_invariant_and_exact(spark, values, n_parts):
    """dec_sum must equal the exact decimal sum regardless of how the
    rows are partitioned (the property that makes Spark and DuckDB
    hash-identical despite different accumulation orders)."""
    df = spark.createDataFrame([(v,) for v in values], "x double").repartition(n_parts)
    got = df.agg(dec_sum("x", scale=2).alias("s")).collect()[0].s
    exact = sum(
        Decimal(v).quantize(Decimal("0.00000001"), rounding=ROUND_HALF_UP)
        for v in values
    )
    want = float(Decimal(float(exact)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))
    assert got is not None and math.isclose(got, want, abs_tol=0.011)
    # And: identical under a different partitioning (bit-exact).
    got2 = (
        df.repartition(max(1, 8 - n_parts))
        .agg(dec_sum("x", scale=2).alias("s"))
        .collect()[0]
        .s
    )
    assert got == got2


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=1000),  # ts (seconds)
    ),
    min_size=1,
    max_size=40,
)


@given(left=events_strategy, right=events_strategy)
@SET
def test_asof_join_matches_bruteforce(spark, left, right):
    """asof_join_backward == per-row max(right_ts <= left_ts) brute
    force, including no-match → NULL."""
    ldf = spark.createDataFrame(
        [(i, k, F.lit(None)) for i, (k, t) in enumerate(left)],
        "lid long, k long, dummy string",
    ).drop("dummy")
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, lts long"
    )
    rdf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(right)], "rid long, k long, rts long"
    )
    out = asof_join_backward(
        ldf, rdf, keys=["k"], left_ts="lts", right_ts="rts",
        payload=["rts"], right_tiebreak=["rid"],
    )
    got = {r.lid: r.rts_asof for r in out.collect()}
    for i, (k, t) in enumerate(left):
        cands = [rt for (rk, rt) in right if rk == k and rt <= t]
        want = max(cands) if cands else None
        assert got[i] == want, (i, k, t, got[i], want)
