"""Statistical aggregates — second moments and correlation (A2/A8 adjunct).

The reference family's ADS layer computes dispersion/trend stats over
DWS aggregates (score variance, amount correlation) [R]. Spark has
``stddev_samp/var_samp/corr/covar_samp`` built in, but their
streaming-merge moment updates are float-order-dependent — useless
for a cross-engine value hash. So the registered query derives the
same statistics from exact DECIMAL(30/38,8) power sums (Σx, Σx²,
Σxy …) with one identical SQL text on both engines: the sums are
order-independent and exact, the final combining arithmetic is
identical IEEE double expressions, hence bit-identical results.

tests/test_operators.py cross-validates the power-sum formulas
against Spark's native ``stddev_samp``/``corr`` to ~1e-9 relative,
so the oracle checks real statistics, not a made-up formula.

Scale: power sums are plain hash-aggregate partials (map-side
combine, one shuffle on the group key) — the same cost profile as
any A1 sum; nothing here is quadratic or collect-based.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_realtime_edu_spark.queries import register
from flink_realtime_edu_spark.sources import load

_MOMENTS_SQL = """
WITH s AS (
  SELECT l_returnflag,
    COUNT(*) AS n,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8)))
         AS DOUBLE) AS sxx,
    CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS syy,
    CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,8)))
         AS DOUBLE) AS sxy
  FROM lineitem
  GROUP BY l_returnflag)
SELECT l_returnflag, n,
  ROUND(sx / n, 4) AS mean_price,
  ROUND(SQRT((sxx - sx * sx / n) / (n - 1)), 4) AS stddev_price,
  ROUND((sxx - sx * sx / n) / (n - 1), 2) AS var_price,
  ROUND((sxy - sx * sy / n) / (n - 1), 2) AS covar_price_qty,
  ROUND((sxy - sx * sy / n)
        / SQRT((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
    AS corr_price_qty
FROM s
"""


@register(
    "price_moments_by_flag",
    survey_rows=("A2", "A8", "F3"),
    oracle=_MOMENTS_SQL,
)
def price_moments_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / sample stddev / variance / covariance / correlation of
    extended price (and vs quantity) per return flag, from exact
    decimal power sums. Identical SQL text on both engines; see
    module docstring for why the native moment aggregates can't be
    oracle-hashed directly."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_MOMENTS_SQL)
