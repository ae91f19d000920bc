"""M0 flagship: TPC-H-Q1-style pricing summary (SURVEY.md §7 M0).

Covers S3 (parquet scan), P1/P2/P5 (project/filter/cast), A1/A2/A5
(hash group-by, agg functions), O1 (order by) in one query — the
shape of every reference DWS job: filter a fact stream, group by
low-cardinality keys, emit sums/averages/counts [R].

Scale notes: the filter is pushed into the parquet scan
(PushedFilters in the explain), only 8 of 11 lineitem columns are
read (ReadSchema pruning), and the aggregate runs partial (map-side)
+ final with just one shuffle on (l_returnflag, l_linestatus) — a
near-constant-size shuffle regardless of input rows, so the plan is
scan-bound at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_edu_spark.functions import dec_avg, dec_avg_sql, dec_sum, dec_sum_sql
from flink_realtime_edu_spark.queries import register
from flink_realtime_edu_spark.sources import load

_CUTOFF = "1998-09-01"

_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {dec_sum_sql('l_quantity')} AS sum_qty,
  {dec_sum_sql('l_extendedprice')} AS sum_base_price,
  {dec_sum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {dec_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {dec_avg_sql('l_quantity')} AS avg_qty,
  {dec_avg_sql('l_extendedprice')} AS avg_price,
  {dec_avg_sql('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "pricing_summary",
    oracle=_ORACLE,
    survey_rows=("S3", "P1", "P2", "P5", "A1", "A2", "A5", "O1"),
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: per (returnflag, linestatus) totals."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit(_CUTOFF))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(disc_price).alias("sum_disc_price"),
            dec_sum(charge).alias("sum_charge"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_extendedprice").alias("avg_price"),
            dec_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
