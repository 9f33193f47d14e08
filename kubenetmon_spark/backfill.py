"""Batch backfill / replay: recompute flow-table date partitions from
raw observations.

This is the second tier of the two-tier SummingMergeTree design
(SURVEY.md §4.1): the streaming path aggregates with a finite
watermark, and arbitrarily-late data still lands because closed days
can be RE-DERIVED from the raw observation log at any time — the exact
capability ClickHouse gets from merge-time folding, expressed as a
deterministic batch job. Also the operational "reprocess yesterday
with the fixed labeler" lever the reference lacks entirely (its
pipeline is fire-and-forget; reference pkg/inserter/worker.go:287-293
drops a failed batch after one retry).

Scale posture: the observation scan prunes to the requested dates
(partition filter first, so 100 TB of history reads only the target
days), the labeler is the same broadcast-join plan as streaming, and
the write replaces ONLY the affected date partitions (dynamic
partition overwrite — untouched days keep their files byte-for-byte).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kubenetmon_spark.config import RuntimeConfig
from kubenetmon_spark.operators.flows import summing_aggregate, to_flow_rows
from kubenetmon_spark.operators.label import label_flows, split_rejected


def backfill_dates(
    spark: SparkSession,
    observations: DataFrame,
    table_path: str,
    dates: list[str],
    pods: DataFrame,
    nodes: DataFrame,
    prefixes: DataFrame,
    cfg: RuntimeConfig,
) -> int:
    """Recompute the given ``date`` partitions (ISO strings) of the
    flow table from raw observations; returns the number of rows
    written. Idempotent: rerunning with the same inputs rewrites the
    same partitions to the same content.

    Guarded (sink.partitions_mutation_guard): a streaming append into a
    partition being backfilled either drains before the recompute reads
    or waits behind the lock — never lands inside the overwrite window
    where the dynamic overwrite would silently delete its files.
    """
    if not dates:
        return 0
    from kubenetmon_spark.sink import partitions_mutation_guard
    day = F.to_date(F.col("ts"))
    obs = observations.filter(day.isin(dates))
    labeled = label_flows(obs, pods, nodes, prefixes, cfg)
    accepted, _ = split_rejected(labeled)
    flows = summing_aggregate(to_flow_rows(accepted))
    flows = flows.filter(F.col("date").cast("string").isin(dates))
    # Row count via an Observation on the write itself: the full
    # label+aggregate pipeline executes exactly ONCE (a pre-count would
    # run the whole backfill twice and could diverge from what lands if
    # inputs change between the two executions).
    from pyspark.sql import Observation

    row_obs = Observation()
    flows = flows.observe(row_obs, F.count(F.lit(1)).alias("n"))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    with partitions_mutation_guard(
        table_path, [f"date={d}" for d in dates]
    ) as fence:
        fence()
        try:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
            (
                flows.write.mode("overwrite")
                .partitionBy("date")
                .parquet(table_path)
            )
        finally:
            if prev is not None:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )
            else:
                spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    return int(row_obs.get["n"])
