"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship end-to-end: the full kubenetmon pipeline
(label -> fan-out -> summing aggregation -> README top-talkers) over a
deterministic flow stream derived from the sf0.001 events table.

``queries()`` / ``oracle_sql()`` — the correctness-gate surface from
kubenetmon_spark.gate: one entry per SURVEY.md §2 operator class plus the
LLM-data-pipeline extensions (dedup, similarity, text analysis), each
paired with a DuckDB oracle computing identical values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kubenetmon_spark.demo import flagship_query
from kubenetmon_spark.gate import gate_oracles, gate_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return gate_queries()


def oracle_sql() -> dict[str, str]:
    return gate_oracles()
