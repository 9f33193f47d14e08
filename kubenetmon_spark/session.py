"""SparkSession factory with the engine's default tuning.

Defaults mirror what the reference gets from ClickHouse for free
(columnar zstd storage, partition pruning, parallel inserts) expressed
as Spark conf:

- AQE on (runtime re-planning, skew-join splitting) — the analogue of
  ClickHouse adapting merge/read concurrency at runtime.
- zstd parquet compression — reference DDL uses ``CODEC(..., ZSTD(1))``
  on every column (reference test/network_flows_0.sql:3-37).
- UTC session timezone — the reference truncates observation times in
  UTC (reference pkg/inserter/worker.go:298-306).
- ``nanosAsLong`` — the driver's ``events`` table carries
  TIMESTAMP(NANOS) which Spark's vectorized parquet reader refuses by
  default; we read as long and convert (see tables.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "kubenetmon_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core; a real cluster would
        # size this to ~2-3x total cores (or rely on AQE coalescing).
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # local mode runs executors INSIDE the driver JVM: size the one
        # heap for 32 concurrent tasks (the box has 128 GiB; 8g caused
        # GC-lock thrash on ~100M-row cached graphs at sf1). A real
        # cluster ignores this and sizes executors instead.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
