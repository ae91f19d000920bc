"""PII-redaction pipeline stage — SURVEY.md §2.10 X7.

The synthetic documents corpus contains no PII, so the registered
query FIRST plants deterministic PII derived from doc_id (email,
phone, IP, SSN shapes appended to the text — the identical
construction expressed in both engines), THEN scrubs it with
operators/redaction.redact_pii. That makes the redaction genuinely
fire on every row while staying exactly oracle-comparable: DuckDB
replays the same plant + the same RE2∩Java-regex scrub and both
sides must produce byte-identical redacted text (asserted through
md5 extremes) and a zero residual-PII audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_edu_spark.operators.redaction import (
    PII_PATTERNS,
    pii_match_count,
    pii_total_count,
    redact_pii,
)
from flink_realtime_edu_spark.queries import register
from flink_realtime_edu_spark.sources import load

_EMAIL, _SSN, _PHONE, _IPV4 = (p for _, p, _ in PII_PATTERNS)

# The planted suffix, once per engine dialect. Spark side builds the
# same string with concat/lpad; any drift breaks the md5 compare.
_PLANT_SQL = """
text || ' contact user' || CAST(doc_id AS VARCHAR)
     || '@mail.example.com tel +1-555-'
     || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
     || ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
     || CAST(doc_id % 100 AS VARCHAR)
     || ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
"""

_ORACLE = f"""
WITH planted AS (
  SELECT source, {_PLANT_SQL} AS aug FROM documents
), scrubbed AS (
  SELECT source, aug,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(aug, '{_EMAIL}', '<EMAIL>', 'g'),
               '{_SSN}', '<ID>', 'g'),
             '{_PHONE}', '<PHONE>', 'g'),
           '{_IPV4}', '<IP>', 'g') AS red
  FROM planted
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(aug, '{_EMAIL}'))) AS BIGINT)
         AS emails_found,
       CAST(SUM(len(regexp_extract_all(aug, '{_PHONE}'))) AS BIGINT)
         AS phones_found,
       CAST(SUM(len(regexp_extract_all(aug, '{_IPV4}'))) AS BIGINT)
         AS ips_found,
       CAST(SUM(len(regexp_extract_all(aug, '{_SSN}'))) AS BIGINT)
         AS ssns_found,
       CAST(SUM(len(regexp_extract_all(red, '{_EMAIL}'))
         + len(regexp_extract_all(red, '{_SSN}'))
         + len(regexp_extract_all(red, '{_PHONE}'))
         + len(regexp_extract_all(red, '{_IPV4}'))) AS BIGINT)
         AS residual_pii,
       MIN(md5(red)) AS min_redacted_md5,
       MAX(md5(red)) AS max_redacted_md5
FROM scrubbed
GROUP BY source
"""


@register(
    "pii_redaction_stats",
    survey_rows=("X7", "F1"),
    oracle=_ORACLE,
    doc="PII scrub audit: plant deterministic PII, redact, verify zero residual",
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII scrub audit over the planted corpus: found
    counts per pattern class, the post-scrub residual (exactly 0 —
    the audit every production scrub stage should ship with), and
    md5 extremes of the redacted text proving byte-identical output
    across engines. Pure regexp_replace/regexp_extract_all column
    expressions — whole-stage codegen, no UDF, no extra shuffle
    beyond the final per-source aggregate."""
    d = load(spark, sf_dir, "documents")
    doc_s = F.col("doc_id").cast("string")
    mod_s = lambda m: (F.col("doc_id") % m).cast("string")  # noqa: E731
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), doc_s,
        F.lit("@mail.example.com tel +1-555-"),
        F.lpad(mod_s(10000), 4, "0"),
        F.lit(" host 10."), mod_s(256), F.lit(".0."), mod_s(100),
        F.lit(" ssn 123-45-"), F.lpad(mod_s(10000), 4, "0"),
    )
    planted = d.select("source", aug.alias("aug"))
    scrubbed = planted.withColumn("red", redact_pii(F.col("aug")))
    return scrubbed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(pii_match_count("aug", _EMAIL)).alias("emails_found"),
        F.sum(pii_match_count("aug", _PHONE)).alias("phones_found"),
        F.sum(pii_match_count("aug", _IPV4)).alias("ips_found"),
        F.sum(pii_match_count("aug", _SSN)).alias("ssns_found"),
        F.sum(pii_total_count("red")).alias("residual_pii"),
        F.min(F.md5("red")).alias("min_redacted_md5"),
        F.max(F.md5("red")).alias("max_redacted_md5"),
    )
