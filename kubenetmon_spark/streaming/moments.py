"""Streaming mean/variance — continuous moment statistics from
MERGEABLE exact-integer sums.

Companion to streaming/timing.py (quantiles) and the batch stats family
(operators/stats.py): the state per window is ``(n, sum x, sum x²)`` —
associative integers, so any merge order yields the same statistics,
and the float mean/variance are derived at READ time only (the engine's
exactness contract: nothing float ever accumulates across batches).

ClickHouse analogy: a materialized view holding avgState/varPopState
with readers applying -Merge. State size: three int64 per window —
a year of 1-minute windows is ~525k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def windowed_moment_sums(
    stream: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked per-window (n, sx, sxx) over an integer value."""
    x = F.col(value_col)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(x * x).alias("sxx"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "sx", "sxx")
    )


def start_moment_stream(
    sums: DataFrame,
    out_path: str,
    checkpoint: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Upsert each updated window's sum triple (absolute state values —
    the same upsert contract as streaming/timing.py histograms).

    Unlike timing.py there is NO stored-state read-back here, by
    construction: the state key (window_start) IS the partition
    column, update mode emits each touched window's ABSOLUTE triple,
    and dynamic overwrite replaces exactly the touched partitions —
    so the merge is the overwrite itself. (timing.py must read back
    because its state rows are (window, bucket): a batch touches some
    buckets of a window but the overwrite replaces the whole window
    partition.) An earlier version carried timing.py's read+anti-join
    anyway; its surviving-stored-rows set is provably empty here and
    it cost a full state read per micro-batch.
    """

    def upsert(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        merged = batch.select(
            "window_start", "n", "sx", "sxx"
        ).localCheckpoint(eager=True)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_start")
            .parquet(out_path)
        )

    return (
        sums.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_moments(spark: SparkSession, out_path: str) -> DataFrame:
    """-Merge at read time: mean and population variance per window
    from the exact sums (q143's integer formulas, rounded at 1e-6)."""
    s = spark.read.parquet(out_path)
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    mean = sx.cast("double") / n
    var = (n * sxx - sx * sx).cast("double") / (n * n).cast("double")
    return s.select(
        "window_start",
        "n",
        F.round(mean, 6).alias("mean"),
        F.round(var, 6).alias("var_pop"),
    ).orderBy("window_start")
