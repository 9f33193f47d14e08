"""Query-log observability — the ``system.query_log`` analogue.

ClickHouse records every query's wall time, row counts, and shape into
``system.query_log``; operators live off it (slow-query hunts, change
regression, capacity). This engine's equivalent is a thin wrapper that
executes a DataFrame through the no-op sink (full plan runs, nothing
is collected), then appends one row per execution to a parquet log
table partitioned by day.

Driver-side cost is one row per query — the log write is `append` of a
1-row DataFrame, so it never interferes with the measured plan. The
plan fingerprint is a hash of the OPTIMIZED logical plan string, so
two executions of the same logical query correlate across sessions
even when literals (dates, limits) shift cosmetic details of the
physical plan.
"""

from __future__ import annotations

import hashlib
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession


def run_logged(
    spark: SparkSession,
    name: str,
    df: DataFrame,
    log_path: str | None = None,
) -> dict:
    """Execute ``df`` end to end (no-op sink) and return its log entry
    ``{name, started_at, wall_s, n_output_rows, plan_hash}``; when
    ``log_path`` is given the entry is also appended to the parquet
    query log, partitioned by ``log_date``."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    plan_hash = hashlib.md5(optimized.encode()).hexdigest()[:16]
    started = datetime.now(timezone.utc)
    t0 = time.perf_counter()
    # The no-op sink consumes FULL rows, so every projection in the plan
    # actually executes (count() would let Catalyst prune expensive
    # computed columns and understate wall_s); the row count comes from
    # an Observation on the same execution — no second pass.
    obs = Observation()
    df.observe(obs, F.count(F.lit(1)).alias("n")).write.format(
        "noop"
    ).mode("overwrite").save()
    n = int(obs.get["n"])
    wall = time.perf_counter() - t0
    entry = {
        "name": name,
        "started_at": started.isoformat(),
        "wall_s": round(wall, 4),
        "n_output_rows": n,
        "plan_hash": plan_hash,
    }
    if log_path:
        row = spark.createDataFrame(
            [
                (
                    name,
                    entry["started_at"],
                    float(entry["wall_s"]),
                    int(n),
                    plan_hash,
                    started.date().isoformat(),
                )
            ],
            "name string, started_at string, wall_s double,"
            " n_output_rows long, plan_hash string, log_date string",
        )
        row.write.mode("append").partitionBy("log_date").parquet(log_path)
    return entry


def slow_queries(
    spark: SparkSession, log_path: str, threshold_s: float = 1.0
) -> DataFrame:
    """The slow-query hunt: log entries over the threshold, newest
    first, with per-plan-hash execution counts so a regression shows
    as 'this plan got slow', not one noisy row."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    log = spark.read.parquet(log_path)
    w = Window.partitionBy("plan_hash")
    return (
        log.withColumn("n_runs", F.count("*").over(w))
        .withColumn("avg_wall_s", F.avg("wall_s").over(w))
        .filter(F.col("wall_s") >= threshold_s)
        .orderBy(F.desc("started_at"))
    )
