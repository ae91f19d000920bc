"""Join operators — SURVEY.md §2.3 (J1-J8).

Reference semantics [R]: DWD fact-to-fact equi joins (order_detail ⋈
order_info), HBase dimension lookup joins with Redis cache (→ our
broadcast hash joins), Flink interval joins (pay within N of order),
and temporal/as-of dim versions. All re-expressed declaratively so
Catalyst picks broadcast vs sort-merge and AQE fixes skew at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_edu_spark.functions import dec_sum, dec_sum_sql
from flink_realtime_edu_spark.operators.asof import asof_join_backward
from flink_realtime_edu_spark.queries import register
from flink_realtime_edu_spark.sources import load


# --------------------------------------------------------------------------
# J1 + J3 — multi-way equi join, dims broadcast
# --------------------------------------------------------------------------
@register(
    "star_join_revenue",
    survey_rows=("J1", "J3", "A1", "A2"),
    bench=True,
    oracle=f"""
SELECT r_name, n_name,
  {dec_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY r_name, n_name
""",
)
def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table star join: revenue per region/nation for 1995-96 orders.

    nation/region are broadcast (the reference's HBase dim-lookup →
    J3 broadcast-hash-join mapping); lineitem ⋈ orders is the only
    big shuffle and AQE handles its skew. Scale: dims stay O(small),
    fact shuffle is on the join key only.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dec_sum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


# --------------------------------------------------------------------------
# J2 — left outer join (optional facts)
# --------------------------------------------------------------------------
@register(
    "left_join_recent_spend",
    survey_rows=("J2", "P4"),
    oracle=f"""
SELECT c_custkey, c_name,
  COUNT(o.o_orderkey) AS n_recent_orders,
  {dec_sum_sql('COALESCE(o.o_totalprice, 0)')} AS recent_spend
FROM customer
LEFT JOIN (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01') o
  ON c_custkey = o.o_custkey
GROUP BY c_custkey, c_name
""",
)
def left_join_recent_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer 1998+ order count/spend; customers with none kept
    (count 0, spend 0.0) — the reference's optional-fact left join [R]."""
    customer = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("1998-01-01"))
    return (
        customer.join(recent, customer.c_custkey == recent.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_recent_orders"),
            dec_sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))).alias("recent_spend"),
        )
    )


# --------------------------------------------------------------------------
# J2 — full outer join
# --------------------------------------------------------------------------
@register(
    "full_join_nation_counts",
    survey_rows=("J2", "A1"),
    oracle="""
SELECT COALESCE(c.k, s.k) AS nationkey,
       COALESCE(c.n_customers, 0) AS n_customers,
       COALESCE(s.n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey AS k, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
FULL JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
  ON c.k = s.k
""",
)
def full_join_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer vs supplier presence per nation, neither side dropped."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return c.join(s, c.ck == s.sk, "full").select(
        F.coalesce("ck", "sk").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


# --------------------------------------------------------------------------
# J5 — semi join
# --------------------------------------------------------------------------
@register(
    "semi_join_recent_customers",
    survey_rows=("J5",),
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '1998-01-01')
""",
)
def semi_join_recent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one 1998+ order (EXISTS → left_semi)."""
    customer = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("1998-01-01"))
    return customer.join(
        recent, customer.c_custkey == recent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# J6 — anti join
# --------------------------------------------------------------------------
@register(
    "anti_join_no_big_order",
    survey_rows=("J6",),
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
""",
)
def anti_join_no_big_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who never placed an order above 450k (NOT EXISTS →
    left_anti) — the reference's first-time-buyer pattern [R]."""
    customer = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# J7 — cross join and theta join
# --------------------------------------------------------------------------
@register(
    "cross_join_region_status",
    survey_rows=("J7", "U3"),
    oracle="""
SELECT r_name, o_orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
""",
)
def cross_join_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense (region × order-status) grid, e.g. to left-join sparse
    aggregates onto a complete reporting matrix."""
    region = load(spark, sf_dir, "region").select("r_name")
    status = load(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return region.crossJoin(status)


@register(
    "theta_join_acctbal",
    survey_rows=("J7",),
    oracle="""
SELECT s_suppkey, c_custkey
FROM supplier JOIN customer
  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
WHERE c_acctbal > 9000
""",
)
def theta_join_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + non-equi condition: same-nation supplier/customer pairs
    where the supplier balance exceeds the customer's."""
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    cond = (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal)
    return s.join(c, cond).select("s_suppkey", "c_custkey")


# --------------------------------------------------------------------------
# J4 — interval join (the reference's pay-within-N-of-order pattern)
# --------------------------------------------------------------------------
@register(
    "interval_join_click_purchase",
    survey_rows=("J4",),
    bench=True,
    oracle="""
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id AS user_id
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 DAY
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
""",
)
def interval_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases within 1 day after a click by the same user — Flink
    `intervalJoin(between(0, +1d))` re-expressed as an equi join on
    user_id with a time-bound theta condition. The equi key carries
    the shuffle; the time bound is evaluated post-match, so no cross
    product materializes (100 TB-safe as long as the key is selective;
    streaming form in streaming/jobs.py uses the same condition with
    watermarks on both sides)."""
    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").alias("c")
    purchases = events.filter(F.col("event_type") == "purchase").alias("p")
    cond = (
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("c.ts"))
        & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 1 DAY"))
    )
    return clicks.join(purchases, cond).select(
        F.col("c.event_id").alias("click_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("c.user_id").alias("user_id"),
    )


# --------------------------------------------------------------------------
# J8 — as-of join (temporal)
# --------------------------------------------------------------------------
@register(
    "asof_join_purchase_last_click",
    survey_rows=("J8", "W3"),
    oracle="""
SELECT p.event_id AS event_id, p.user_id AS user_id, p.ts AS ts,
       c.ts AS last_click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def asof_join_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase annotated with the user's most recent click at or
    before it (NULL if none) — operators/asof.py union+window
    re-expression; oracle is DuckDB's native ASOF LEFT JOIN."""
    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join_backward(
        purchases.drop("event_type"),
        clicks.withColumnRenamed("ts", "click_ts"),
        keys=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        payload=["click_ts"],
        right_tiebreak=["event_id"],
    )
    return out.select(
        "event_id", "user_id", "ts", F.col("click_ts_asof").alias("last_click_ts")
    )
