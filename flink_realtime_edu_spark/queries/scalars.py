"""Scalar function coverage — SURVEY.md §2.8 (F1-F5, F8).

Reference semantics [R]: keyword normalization, id concatenation,
epoch↔date-string conversion for ClickHouse window stamps, money
rounding, status→label mapping, action-array access, rowkey hashing.
Each query batches one function family over a testdata table; every
expression stays JVM-side (whole-stage codegen — no Python UDFs).

Cross-engine type discipline: Spark int-returning functions are cast
to match DuckDB's BIGINT (length, levenshtein, extract, floor, ...)
so the driver's schema/value compare sees identical types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_edu_spark.queries import register
from flink_realtime_edu_spark.sources import load


# --------------------------------------------------------------------------
# F1 — strings
# --------------------------------------------------------------------------
@register(
    "string_funcs_part",
    survey_rows=("F1",),
    oracle="""
SELECT p_partkey,
  UPPER(p_brand) AS brand_u,
  LOWER(p_type) AS type_l,
  SUBSTRING(p_name, 1, 4) AS name4,
  CONCAT_WS('-', p_brand, CAST(p_size AS VARCHAR)) AS brand_size,
  CAST(LENGTH(p_name) AS BIGINT) AS name_len,
  LPAD(CAST(p_partkey AS VARCHAR), 10, '0') AS key_pad,
  REGEXP_EXTRACT(p_type, '^([A-Z]+)', 1) AS type_head,
  REPLACE(p_name, ' ', '_') AS name_us,
  TRIM(CONCAT(' ', p_brand, ' ')) AS brand_trim,
  p_name LIKE '%widget%' AS is_widget,
  CAST(LEVENSHTEIN(p_brand, 'Brand#13') AS BIGINT) AS brand_dist
FROM part
""",
)
def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, substring, concat, pad, regexp, replace,
    trim, LIKE, edit distance — the reference's keyword-normalize /
    rowkey-concat usage [R]."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.substring("p_name", 1, 4).alias("name4"),
        F.concat_ws("-", F.col("p_brand"), F.col("p_size").cast("string")).alias("brand_size"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_pad"),
        F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("type_head"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
        F.col("p_name").like("%widget%").alias("is_widget"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#13")).cast("bigint").alias("brand_dist"),
    )


# --------------------------------------------------------------------------
# F2 — date/time
# --------------------------------------------------------------------------
@register(
    "datetime_funcs_orders",
    survey_rows=("F2", "P5"),
    oracle="""
SELECT o_orderkey,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
  strftime(o_orderdate, '%Y-%m-%d') AS d_str,
  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
  CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mo,
  CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS qtr,
  epoch_ms(o_orderdate) AS epoch_msec,
  o_orderdate + INTERVAL 30 DAY AS due_date,
  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS days_to_1998,
  CAST(o_orderdate AS DATE) AS order_day
FROM orders
""",
)
def datetime_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: truncation, formatting, field extraction,
    epoch-millis, interval arithmetic, day difference — the
    reference's yyyy-MM-dd window-stamp conversions [R]."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d_str"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.quarter("o_orderdate").alias("qtr"),
        # testdata timestamps are TIMESTAMP_NTZ; cast through the UTC
        # session tz so epoch agrees with DuckDB's naive-as-UTC epoch_ms
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("epoch_msec"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.lit("1998-01-01"), F.col("o_orderdate")).alias("days_to_1998"),
        F.to_date("o_orderdate").alias("order_day"),
    )


# --------------------------------------------------------------------------
# F3/F4 — math + conditional
# --------------------------------------------------------------------------
@register(
    "math_conditional_orders",
    survey_rows=("F3", "F4"),
    oracle="""
SELECT o_orderkey,
  CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished' ELSE 'pending' END AS status_label,
  CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_kbucket,
  CAST(CEIL(o_totalprice / 1000) AS BIGINT) AS price_kceil,
  ABS(o_totalprice - 250000.0) AS dist_from_mid,
  ROUND(SQRT(o_totalprice), 6) AS price_sqrt,
  ROUND(LN(o_totalprice + 1), 6) AS price_ln,
  GREATEST(o_totalprice, 250000.0) AS hi,
  LEAST(o_totalprice, 250000.0) AS lo,
  o_totalprice % 97.0 AS price_mod,
  NULLIF(o_orderstatus, 'P') AS status_or_null,
  COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_coalesced
FROM orders
""",
)
def math_conditional_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + conditional family: bucketing, abs/sqrt/ln, greatest/
    least, modulo, CASE/nullif/coalesce status mapping [R]."""
    o = load(spark, sf_dir, "orders")
    status_label = (
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("pending")
    )
    return o.select(
        "o_orderkey",
        status_label.alias("status_label"),
        F.floor(F.col("o_totalprice") / 1000).alias("price_kbucket"),
        F.ceil(F.col("o_totalprice") / 1000).alias("price_kceil"),
        F.abs(F.col("o_totalprice") - 250000.0).alias("dist_from_mid"),
        F.round(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
        F.round(F.ln(F.col("o_totalprice") + 1), 6).alias("price_ln"),
        F.greatest(F.col("o_totalprice"), F.lit(250000.0)).alias("hi"),
        F.least(F.col("o_totalprice"), F.lit(250000.0)).alias("lo"),
        (F.col("o_totalprice") % 97.0).alias("price_mod"),
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_coalesced"
        ),
    )


# --------------------------------------------------------------------------
# F5 — arrays + higher-order functions
# --------------------------------------------------------------------------
@register(
    "array_funcs_documents",
    survey_rows=("F5", "X1"),
    oracle="""
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  string_split(text, ' ')[1] AS first_tok,
  string_split(text, ' ')[-1] AS last_tok,
  list_contains(string_split(text, ' '), 'join') AS has_join,
  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_vocab,
  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',') AS vocab5,
  CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT) AS total_chars,
  CAST(len(list_filter(string_split(text, ' '), x -> length(x) > 5)) AS BIGINT) AS n_long_tokens
FROM documents
""",
)
def array_funcs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order transform/filter/aggregate —
    the reference's action/display array access [R] and the X1
    tokenizer building block. All JVM-side (no UDF)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    vocab = F.array_sort(F.array_distinct(toks))
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        toks[0].alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
        F.array_contains(toks, "join").alias("has_join"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_vocab"),
        F.concat_ws(",", F.slice(vocab, 1, 5)).alias("vocab5"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x).cast("bigint")
        ).alias("total_chars"),
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).cast("bigint").alias("n_long_tokens"),
    )


# --------------------------------------------------------------------------
# F8 — hashing / id building
# --------------------------------------------------------------------------
@register(
    "hash_funcs_documents",
    survey_rows=("F8",),
    oracle="""
SELECT doc_id,
  md5(text) AS text_md5,
  sha256(text) AS text_sha256,
  md5(CONCAT(source, '|', CAST(doc_id AS VARCHAR))) AS rowkey
FROM documents
""",
)
def hash_funcs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable hashes (md5/sha256 agree across engines) + the
    reference's concat-then-hash rowkey pattern [R]."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5(F.concat(F.col("source"), F.lit("|"), F.col("doc_id").cast("string"))).alias(
            "rowkey"
        ),
    )


@register("spark_native_hashes", survey_rows=("F8",), oracle=None)
def spark_native_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native hashes (xxhash64 / murmur hash / crc32) used for
    bucketing, salting and MinHash seeds — deterministic within Spark
    but not portable to DuckDB → rows-only check."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.xxhash64("text").alias("text_xxh64"),
        F.hash("text").alias("text_murmur"),
        F.crc32("text").alias("text_crc32"),
        (F.pmod(F.xxhash64("text"), F.lit(64))).alias("bucket64"),
    )
