"""Table registry over the fixture star schema + CSV source.

The reference reads one headered CSV with *no* schema (every column lands as
string and is re-cast before every use — ``codeText.txt:12`` then
``codeText.txt:130,179-180,...``). This engine instead declares explicit
schemas at read time: at 100 TB, schema inference is a full extra scan and
read-then-cast defeats Parquet predicate pushdown on typed columns.

Parquet is the primary format (fixtures per TESTDATA.md); a strict CSV
reader is kept for parity with the reference's source (SURVEY.md §2.1 S1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
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

# Dimension tables small enough to broadcast in joins at any scale factor —
# at 100 TB the facts (orders/lineitem/events/documents) grow; these don't.
BROADCASTABLE = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_dim(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a dimension table pre-wrapped in a broadcast hint. Joins
    against the result never shuffle the fact side; refuses fact tables so
    a 100 TB table can't be broadcast by accident."""
    if name not in BROADCASTABLE:
        raise ValueError(f"{name} is a fact table; broadcast would not scale")
    return F.broadcast(load_table(spark, sf_dir, name))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Column pruning + predicate pushdown reach the
    Parquet scan automatically because we return a plain scan node."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Set defensively (the caller's session may not come from get_spark()):
    # fixtures store naive timestamps; extraction (hour/dayofweek) must read
    # them as-written, which for Spark's UTC-micros internal representation
    # means a UTC session zone. nanosAsLong lets events.ts (TIMESTAMP NANOS,
    # which Spark has no type for) load at all.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Normalize ts to Spark's session-zone TimestampType whatever the
        # fixture generation wrote: TIMESTAMP(NANOS) arrives as long under
        # nanosAsLong (integer div is exact — float division at epoch-nanos
        # magnitude ~1.7e18, double ulp ~256ns, could land ±1µs off);
        # TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as TIMESTAMP_NTZ
        # and is reinterpreted as UTC-instant (session zone is UTC above).
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or TABLE_NAMES
    return {n: load_table(spark, sf_dir, n) for n in names}


def spread(df: DataFrame) -> DataFrame:
    """Give a compute-bound stage cluster-wide parallelism when its input
    arrived as fewer partitions than cores (one small parquet file <
    maxPartitionBytes = one partition). The tiny up-front shuffle is
    repaid N-fold by the parallel stage; at 100 TB inputs already have
    thousands of partitions and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def read_csv_strict(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
) -> DataFrame:
    """CSV scan with a mandatory explicit schema.

    Mirrors the reference's ``spark.read.format("csv").option("header",
    "true").load(path)`` (codeText.txt:12) but refuses the all-strings
    read-then-cast pattern: with an explicit schema, Spark parses each
    column to its final type in one pass and keeps pushdown-eligible types.
    """
    return (
        spark.read.format("csv")
        .option("header", str(header).lower())
        .option("mode", "FAILFAST")
        .schema(schema)
        .load(path)
    )
