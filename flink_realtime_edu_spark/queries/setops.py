"""Set operations — SURVEY.md §2.7 (U1-U3).

Reference semantics [R]: Flink `union` merges split streams back
(e.g. page-log splitting); ADS audience-overlap queries are
INTERSECT/EXCEPT over user sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_edu_spark.queries import register
from flink_realtime_edu_spark.sources import load


@register(
    "union_activity_feed",
    survey_rows=("U1", "P1", "P5"),
    oracle="""
SELECT 'order' AS src, o_orderkey AS id, o_totalprice AS amount
FROM orders WHERE o_totalprice > 450000
UNION ALL
SELECT 'purchase' AS src, event_id AS id, value AS amount
FROM events WHERE event_type = 'purchase' AND value > 200
""",
)
def union_activity_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize two heterogeneous facts into one high-value activity
    feed (`unionByName` — schema aligned by name, the safe variant)."""
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(
            F.lit("order").alias("src"),
            F.col("o_orderkey").alias("id"),
            F.col("o_totalprice").alias("amount"),
        )
    )
    purchases = (
        load(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("value") > 200))
        .select(
            F.lit("purchase").alias("src"),
            F.col("event_id").alias("id"),
            F.col("value").alias("amount"),
        )
    )
    return orders.unionByName(purchases)


@register(
    "nations_with_customers_and_suppliers",
    survey_rows=("U2",),
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def nations_with_customers_and_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap: nations present on both sides (INTERSECT)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "nations_without_suppliers",
    survey_rows=("U2",),
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def nations_without_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: nations with customers but no suppliers
    (`subtract` = EXCEPT DISTINCT; `exceptAll` would keep leftover
    multiplicity and wrongly retain nations that have suppliers)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@register(
    "distinct_segments_per_nation",
    survey_rows=("U3",),
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def distinct_segments_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row dedup on a column subset (`dropDuplicates`)."""
    return load(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").dropDuplicates()
