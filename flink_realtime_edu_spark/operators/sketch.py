"""Count-Min Sketch as pure DataFrame algebra — A4's point-frequency twin.

The reference family leans on ClickHouse-side HLL for distinct counts
[R — SURVEY.md §2.4 A4]; Spark ships `hll_sketch_agg` (used by
approx_unique_visitors) and a `count_min_sketch` aggregate whose
binary payload has no PySpark-side reader. Rather than smuggle the
JVM sketch class through py4j, this implements CMS *relationally*:
the sketch IS a DataFrame of counters, so building and probing are
shuffles Catalyst already knows how to scale, and merging sketches
from different inputs is a unionByName + re-aggregate.

- build: each token contributes `depth` rows (depth_i,
  xxhash64(token, seed_i) mod width) → one hash aggregate. Stays
  whole-stage-codegen'd JVM (xxhash64 is a builtin); counter table
  is depth×width rows regardless of input size.
- probe: candidates hash the same way, left-join the counter table
  (broadcast — it's tiny), take MIN over depths. Missing bucket ⇒
  count 0.

Guarantees (Cormode & Muthukrishnan; see PAPERS.md): estimate ≥
exact always; overestimate ≤ (e/width)·N with prob ≥ 1 − (1/e)^depth.
Pinned in tests/test_operators.py on the documents corpus.

100 TB posture: the build is one map-side-combined aggregate whose
output is O(depth·width) — constant; the probe broadcast-joins that
constant table. Nothing here is driver-bound or quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fixed seeds → deterministic, mergeable sketches across jobs/rounds.
_SEEDS = (101, 211, 307, 401, 503, 601, 701, 809)


def _bucket(col, seed: int, width: int):
    # xxhash64 is signed; pmod keeps buckets in [0, width).
    return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(width)).cast("int")


def cms_build(
    df: DataFrame, token_col: str, width: int = 256, depth: int = 4
) -> DataFrame:
    """Aggregate a token column into a CMS counter table
    (depth int, bucket int, cnt bigint) of exactly depth×width rows
    (absent rows mean zero)."""
    if depth > len(_SEEDS):
        raise ValueError(f"depth <= {len(_SEEDS)} supported")
    rows = df.select(
        F.posexplode(
            F.array(*[_bucket(F.col(token_col), s, width) for s in _SEEDS[:depth]])
        ).alias("depth", "bucket")
    )
    return rows.groupBy("depth", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    cms: DataFrame, probes: DataFrame, token_col: str, width: int = 256, depth: int = 4
) -> DataFrame:
    """Point-frequency estimates for each distinct probe token:
    (token_col, est bigint) with est = min over depths of the
    counter (0 for never-seen buckets). `width`/`depth` must match
    the build call."""
    hashed = probes.select(token_col).distinct().select(
        token_col,
        F.posexplode(
            F.array(*[_bucket(F.col(token_col), s, width) for s in _SEEDS[:depth]])
        ).alias("depth", "bucket"),
    )
    joined = hashed.join(F.broadcast(cms), ["depth", "bucket"], "left").select(
        token_col, F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return joined.groupBy(token_col).agg(F.min("cnt").alias("est"))
