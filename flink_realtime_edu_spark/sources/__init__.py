"""Sources: batch parquet loaders + streaming source builders.

Reference mapping (SURVEY.md §2.1): the reference consumes Kafka
topics per warehouse layer [R]. Our batch stand-in is the driver's
parquet tables (S3); the streaming path reads the same schema from a
file-source directory (or kafka when available) — see
``flink_realtime_edu_spark.streaming``.

Scale posture: `spark.read.parquet` gives the vectorized reader,
predicate pushdown and column pruning for free; at 100 TB the same
call over a partitioned table root additionally gets static +
dynamic partition pruning (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_edu_spark.session import configure

# The driver's testdata tables (TESTDATA.md / FIXTURES.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins
# (reference: HBase/Phoenix dim tables with Redis cache → our J3
# broadcast-hash-join mapping, SURVEY.md §2.3).
DIM_TABLES: frozenset[str] = frozenset({"region", "nation", "supplier", "part"})


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Batch-read one testdata table as a DataFrame.

    ``events.ts`` is normalized to a session-UTC TimestampType (LTZ)
    whatever the driver session reads from disk:

    - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) → Spark reads
      TIMESTAMP_NTZ (the current testdata shape); cast to
      ``timestamp_ltz`` — value-identical because :func:`configure`
      pins the session timezone to UTC first, and it matches how
      DuckDB (tz-naive) sees the same file.
    - parquet TIMESTAMP(NANOS) under ``nanosAsLong`` → epoch-nanos
      BIGINT; truncate to micros (exactly DuckDB's read of nanos).

    The explicit ``timestamp_ltz`` target (not plain ``timestamp``)
    keeps this correct even if the caller's session sets
    ``spark.sql.timestampType=TIMESTAMP_NTZ``.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    configure(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for `spark.sql` queries."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
