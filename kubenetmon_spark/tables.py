"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

The ``events`` table carries parquet TIMESTAMP(NANOS) which Spark's
reader refuses; with ``spark.sql.legacy.parquet.nanosAsLong=true`` (set by
session.get_spark) it arrives as a long that we convert to a microsecond
timestamp here. All other tables load as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
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
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            # nanos -> micros; truncation (floor) matches DuckDB's
            # second/minute truncation downstream (all values positive).
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
        elif dt == "timestamp_ntz":
            # parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
            # NTZ; with the session pinned to UTC the LTZ cast is
            # value-preserving, and downstream epoch casts need LTZ.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view for spark.sql use."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
