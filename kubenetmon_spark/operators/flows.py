"""Fan-out + time bucketing + the SummingMergeTree aggregation contract.

X1: each labeled observation emits two fact rows — direction='out' with
the outbound counters, direction='in' with the inbound ones
(reference pkg/inserter/worker.go:143-222).

P7/A2: timestamps truncate to the UTC minute; intervalSeconds is a
constant 60 (reference worker.go:134-147, 298-306).

A1: the reference's table is a ClickHouse SummingMergeTree — rows sharing
the full 33-column dimension key get (bytes, packets) summed *eventually*,
at background-merge time (reference test/network_flows_0.sql:39-42). Here
that contract is an explicit aggregation: `summing_aggregate` is applied
eagerly per micro-batch AND by the compaction job over at-rest partitions
(sink.compact), which is the merge analogue. Readers get the same
guarantee as ClickHouse gives: re-aggregating is always safe, already-
merged data is just fewer rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kubenetmon_spark.functions.flags import canonical_flags_json
from kubenetmon_spark.schema import DIM_COLS


def to_flow_rows(accepted: DataFrame) -> DataFrame:
    """Labeled observations -> pre-aggregation fact rows (2 per obs)."""
    directions = F.array(
        F.struct(
            F.lit("out").alias("direction"),
            F.col("bytes_out").alias("bytes"),
            F.col("packets_out").alias("packets"),
        ),
        F.struct(
            F.lit("in").alias("direction"),
            F.col("bytes_in").alias("bytes"),
            F.col("packets_in").alias("packets"),
        ),
    )
    keep = [c for c in accepted.columns if c not in (
        "reject_reason", "flow_type", "bytes_out", "bytes_in", "packets_out", "packets_in", "ts"
    )]
    return (
        accepted.withColumn("_d", F.explode(directions))
        .select(
            F.to_date("ts").alias("date"),
            F.date_trunc("minute", F.col("ts")).alias("intervalStartTime"),
            F.lit(60).cast("int").alias("intervalSeconds"),
            *keep,
            F.col("_d.direction").alias("direction"),
            F.coalesce(F.col("_d.bytes"), F.lit(0)).alias("bytes"),
            F.coalesce(F.col("_d.packets"), F.lit(0)).alias("packets"),
        )
    )


def summing_aggregate(fact: DataFrame) -> DataFrame:
    """Fold rows sharing the full dimension key: sum(bytes), sum(packets).

    The map-typed connectionFlags column cannot be a group key; group on
    its canonical sorted-JSON form and keep the map via any_value
    (identical within a group by construction). SURVEY.md §4.4.
    """
    group_cols = [c for c in DIM_COLS if c != "connectionFlags"]
    return (
        fact.withColumn("_flags_key", canonical_flags_json("connectionFlags"))
        .groupBy("_flags_key", *group_cols)
        .agg(
            F.any_value("connectionFlags").alias("connectionFlags"),
            F.sum("bytes").alias("bytes"),
            F.sum("packets").alias("packets"),
        )
        .drop("_flags_key")
        .select(*DIM_COLS, "bytes", "packets")
    )
