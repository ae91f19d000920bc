"""Python UDF surface — SURVEY.md §2.10 X2/X3 + §2.4 A6 SQL forms.

The engine's rule (SURVEY.md §1.4): built-ins first; when Python is
unavoidable it is ALWAYS Arrow-batched pandas (scalar pandas UDF,
grouped-map applyInPandas, grouped-agg — the ~10-100× faster path vs
row-at-a-time). These queries exist to pin that surface; equivalent
built-in forms exist for each and are noted in the docstrings.

Also here: the SQL-string entry point (lifecycle 2 in SURVEY.md
§3.2) — GROUPING SETS / CUBE queries written as `spark.sql` over
temp views, textually close to their DuckDB oracles.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from flink_realtime_edu_spark.functions import dec_sum_sql
from flink_realtime_edu_spark.queries import register
from flink_realtime_edu_spark.sources import load


# --------------------------------------------------------------------------
# X2 — scalar pandas UDF (Arrow-batched Series→Series)
# --------------------------------------------------------------------------
@register(
    "pandas_udf_token_stats",
    survey_rows=("X2", "X7"),
    oracle="""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_word_tokens,
  CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT) AS n_spaces
FROM documents
""",
)
def pandas_udf_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting in a scalar pandas UDF (the X2
    shape: Series in, Series out, one Arrow batch per invocation).
    A pure-built-in equivalent (`regexp_count`) exists — the UDF is
    the point here, and the oracle checks it exactly."""

    @pandas_udf("long")
    def n_word_tokens(texts: pd.Series) -> pd.Series:
        pat = re.compile(r"[a-z]+")
        return texts.map(lambda t: len(pat.findall(t)))

    @pandas_udf("long")
    def n_spaces(texts: pd.Series) -> pd.Series:
        return texts.str.count(" ")

    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        n_word_tokens("text").alias("n_word_tokens"),
        n_spaces("text").alias("n_spaces"),
    )


# --------------------------------------------------------------------------
# X3 — grouped-map applyInPandas (per-key normalize/repair)
# --------------------------------------------------------------------------
@register(
    "grouped_zscore_chars",
    survey_rows=("X3",),
    oracle="""
SELECT doc_id, lang,
  ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
        / NULLIF(STDDEV_POP(n_chars) OVER (PARTITION BY lang), 0), 4) AS z_chars
FROM documents
""",
)
def grouped_zscore_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-score of document length via grouped-map
    applyInPandas — the reference's per-key normalize/repair shape
    [R]. One shuffle on the group key; each group is one pandas frame.
    fsum keeps the moments exact so the 4dp rounding matches the
    oracle's window-function re-expression."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["n_chars"].astype(float)
        n = len(x)
        mean = math.fsum(x) / n
        var = math.fsum((v - mean) ** 2 for v in x) / n
        std = math.sqrt(var)
        z = (x - mean) / std if std > 0 else pd.Series([None] * n, dtype=float)
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "lang": pdf["lang"], "z_chars": z.round(4)}
        )

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return d.groupBy("lang").applyInPandas(
        zscore, "doc_id bigint, lang string, z_chars double"
    )


# --------------------------------------------------------------------------
# A6 via SQL entry point — GROUPING SETS and CUBE
# --------------------------------------------------------------------------
_GROUPING_SETS_SQL = f"""
SELECT event_type,
       CAST(date_trunc('day', ts) AS DATE) AS day,
       COUNT(*) AS n,
       {dec_sum_sql('value')} AS sum_value
FROM events
GROUP BY GROUPING SETS ((event_type, CAST(date_trunc('day', ts) AS DATE)),
                        (event_type), ())
"""


@register(
    "grouping_sets_traffic",
    survey_rows=("A6",),
    oracle=_GROUPING_SETS_SQL,
)
def grouping_sets_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity traffic rollup via SQL GROUPING SETS — the
    reference's by-(type,day) / by-type / total DWS triple in one
    scan. Identical SQL text runs on both engines (lifecycle 2:
    spark.sql over temp views ≡ DataFrame plan)."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_GROUPING_SETS_SQL)


_CUBE_SQL = """
SELECT c_mktsegment, n_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE (c_mktsegment, n_name)
"""


@register("cube_customer_segments", survey_rows=("A6",), oracle=_CUBE_SQL)
def cube_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (segment, nation): all four granularities in one
    pass (Spark expands to an internal grouping-id union — one
    shuffle, not four scans)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(_CUBE_SQL)


# --------------------------------------------------------------------------
# J2 — right outer join (the missing variant; left is covered)
# --------------------------------------------------------------------------
@register(
    "right_join_supplier_nations",
    survey_rows=("J2",),
    oracle="""
SELECT n_name, COUNT(s_suppkey) AS n_suppliers
FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""",
)
def right_join_supplier_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every nation kept, supplier count 0 when
    absent (COUNT over the nullable side)."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )
