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

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as epoch-nanos
    BIGINT and is converted here to a microsecond TimestampType
    (truncating, exactly how DuckDB reads the same file — verified:
    ...778549829ns → ...778549µs on both engines).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    configure(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for `spark.sql` queries."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
