"""Query cookbook: SQL views over the flow fact table and the five
questions the reference's operators answer with it (reference
README.md:16-21), as documented, reusable DataFrame builders.

Usage contract (matches the reference's own guidance, README.md:212):
a pod<->pod VPC flow is observed by BOTH endpoints' agents, so totals
must pin ``direction`` (or split by it) to avoid double-counting the
observation point. Every cookbook query does this explicitly.

Queries always aggregate: with the foreachBatch ingest path, rows for
the same key from different micro-batches coexist until compaction folds
them (the SummingMergeTree caveat, reference test/network_flows_0.sql:39);
aggregating reads are therefore always correct, compacted or not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kubenetmon_spark.functions import format_readable_size


def register_flow_views(spark: SparkSession, table_path: str) -> DataFrame:
    """Register the fact table as ``network_flows`` plus the
    direction-pinned convenience views ``flows_out`` / ``flows_in``."""
    flows = spark.read.parquet(table_path)
    flows.createOrReplaceTempView("network_flows")
    flows.filter(F.col("direction") == "out").createOrReplaceTempView("flows_out")
    flows.filter(F.col("direction") == "in").createOrReplaceTempView("flows_in")
    return flows


def top_talkers(
    flows: DataFrame, last_minutes: int | None = None, limit: int = 20
) -> DataFrame:
    """The README query (reference README.md:180-184): biggest outbound
    (localPod, remotePod, class) flows, readable sizes."""
    out = flows.filter(F.col("direction") == "out")
    if last_minutes is not None:
        out = out.filter(
            (F.col("date") == F.current_date())
            & (F.col("intervalStartTime") > F.current_timestamp() - F.expr(f"INTERVAL {int(last_minutes)} MINUTES"))
        )
    return (
        out.groupBy("localPod", "remotePod", "connectionClass")
        .agg(F.sum("bytes").alias("total_bytes"))
        .withColumn("readable", format_readable_size("total_bytes"))
        .orderBy(F.desc("total_bytes"), "localPod", "remotePod", "connectionClass")
        .limit(limit)
    )


def cross_az_traffic(flows: DataFrame) -> DataFrame:
    """Q1: how much cross-AZ traffic, and which workloads talk the most.
    Cross-AZ = both AZs known and different, inside the same region."""
    crossed = flows.filter(
        (F.col("direction") == "out")
        & (F.col("localAvailabilityZone") != "")
        & (F.col("remoteAvailabilityZone") != "")
        & (F.col("localAvailabilityZone") != F.col("remoteAvailabilityZone"))
        & F.col("connectionClass").isin("INTRA_VPC", "INTRA_REGION")
    )
    return (
        crossed.groupBy("localApp", "localAvailabilityZone", "remoteAvailabilityZone")
        .agg(F.sum("bytes").alias("total_bytes"), F.sum("packets").alias("total_packets"))
        .withColumn("readable", format_readable_size("total_bytes"))
        .orderBy(F.desc("total_bytes"), "localApp", "localAvailabilityZone", "remoteAvailabilityZone")
    )


def traffic_to_service(flows: DataFrame, service: str = "s3") -> DataFrame:
    """Q2: how much traffic goes to a cloud service (e.g. S3), per app.
    remoteService comes from the LPM-matched prefix dimension."""
    return (
        flows.filter((F.col("direction") == "out") & (F.col("remoteService") == service))
        .groupBy("localApp", "remoteRegion")
        .agg(F.sum("bytes").alias("total_bytes"))
        .withColumn("readable", format_readable_size("total_bytes"))
        .orderBy(F.desc("total_bytes"), "localApp", "remoteRegion")
    )


def connection_posture(flows: DataFrame) -> DataFrame:
    """Q3: which workloads send outbound vs only receive inbound.

    A workload's posture: 'outbound' if it ever sends, 'inbound-only'
    otherwise. Uses per-direction byte sums per app."""
    per_dir = (
        flows.groupBy("localApp")
        .pivot("direction", ["out", "in"])
        .agg(F.sum("bytes"))
        .fillna(0, subset=["out", "in"])
    )
    return per_dir.select(
        "localApp",
        F.col("out").alias("bytes_out"),
        F.col("in").alias("bytes_in"),
        F.when(F.col("out") > 0, "outbound").otherwise("inbound-only").alias("posture"),
    ).orderBy(F.desc("bytes_out"), "localApp")


def server_balance(flows: DataFrame, server_app: str) -> DataFrame:
    """Q4: are client connections balanced across a server app's pods?
    Inbound bytes per server pod + each pod's share in basis points."""
    inbound = (
        flows.filter((F.col("direction") == "in") & (F.col("localApp") == server_app))
        .groupBy("localPod")
        .agg(F.sum("bytes").alias("total_bytes"))
    )
    total = inbound.agg(F.sum("total_bytes").alias("_t"))
    return (
        inbound.crossJoin(F.broadcast(total))
        .select(
            "localPod",
            "total_bytes",
            F.floor(F.col("total_bytes") * 10000 / F.col("_t")).cast("long").alias("share_bp"),
        )
        .orderBy(F.desc("total_bytes"), "localPod")
    )


def node_throughput(flows: DataFrame, top: int = 20) -> DataFrame:
    """Q5: per-node, per-minute throughput — the series to compare against
    CSP instance bandwidth limits. bytes/minute -> bytes/s."""
    return (
        flows.filter((F.col("direction") == "out") & (F.col("localNode") != ""))
        .groupBy("localNode", "intervalStartTime")
        .agg((F.sum("bytes") / F.lit(60)).alias("bytes_per_sec"))
        .orderBy(F.desc("bytes_per_sec"), "localNode", "intervalStartTime")
        .limit(top)
    )


def pod_traffic_rates(
    flows: DataFrame,
    step_s: int = 300,
    window_s: int = 900,
    n_buckets: int = 48,
    direction: str = "out",
) -> DataFrame:
    """Per-pod byte RATES on a regular grid — the Grafana panel the
    reference deployment actually watches (rate of
    kubenetmon-exported bytes per pod, PromQL `rate()` shape), served
    straight from the flow table.

    The minute rollup stores per-bucket byte SUMS; accumulating them
    per pod gives a monotone counter, and
    :func:`~kubenetmon_spark.operators.timeseries.promql_to_grid`
    evaluates rate/increase/delta at ``step_s`` grid points over a
    trailing ``window_s`` — identical semantics to pointing Prometheus
    at the reference's metrics endpoint, but computed from the same
    table the SQL queries read (one engine, no second store).

    Direction is pinned (the double-observation contract, see module
    docstring). Grid starts at the table's first bucket, truncated to
    ``step_s``.
    """
    base = (
        flows.filter(F.col("direction") == direction)
        .groupBy(
            F.col("localPod").alias("pod"),
            F.unix_timestamp("intervalStartTime").alias("ts_s"),
        )
        .agg(F.sum("bytes").alias("inc"))
    )
    from pyspark.sql.window import Window

    from kubenetmon_spark.operators.timeseries import promql_to_grid

    cum = Window.partitionBy("pod").orderBy("ts_s")
    samples = base.select(
        "pod", "ts_s", F.sum("inc").over(cum).alias("v")
    )
    start_row = flows.agg(
        F.min(F.unix_timestamp("intervalStartTime")).alias("lo")
    ).collect()[0]
    if start_row["lo"] is None:
        return samples.select(
            "pod",
            F.lit(None).cast("long").alias("bucket_ts"),
            F.lit(None).cast("long").alias("n_samples"),
            F.lit(None).cast("long").alias("last_v"),
            F.lit(None).cast("long").alias("delta"),
            F.lit(None).cast("long").alias("increase"),
            F.lit(None).cast("long").alias("rate_bp"),
            F.lit(None).cast("long").alias("irate_bp"),
        ).limit(0)
    start = (start_row["lo"] // step_s) * step_s
    return promql_to_grid(
        samples,
        ["pod"],
        "ts_s",
        "v",
        start_s=start,
        n_buckets=n_buckets,
        step_s=step_s,
        window_s=window_s,
    )
