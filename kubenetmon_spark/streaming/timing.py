"""Streaming quantileTiming — continuous latency quantiles from
MERGEABLE bucket histograms.

The batch operator (operators/agg.py::quantile_timing) compresses
values into ClickHouse's timing buckets (<1024 exact, 16 ms bands to
30 s, saturated above). That state is mergeable by construction — a
histogram is a sum — so the streaming form is:

- stream -> watermarked tumbling-window groupBy (window, bucket) counts
  (update mode; state is bounded by watermark x <=~3k buckets);
- foreachBatch upserts per-window histogram partitions: update mode
  emits only CHANGED (window, bucket) rows but each carries its
  ABSOLUTE count (the state holds totals), so merge = batch rows +
  stored rows the batch didn't touch, dynamic-overwrite the touched
  window partitions (idempotent on retry);
- quantiles are computed AT READ TIME from the stored histograms with
  the exact lower-bound weighted-quantile rule — the same numbers the
  batch operator yields over the same data, which the test asserts.

This mirrors how a ClickHouse materialized view stores
quantileTimingState and readers apply quantileTimingMerge; at 100 TB
the stream shuffles (window, bucket) partials (map-side combined), and
a day of 1-minute windows is ~1440 x 3k rows of state — trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kubenetmon_spark.operators.agg import timing_bucket, weighted_quantile_exact
from kubenetmon_spark.streaming.state import read_state_or_none


def windowed_timing_histogram(
    stream: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked per-window timing-bucket histogram counts."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window).alias("w"),
            timing_bucket(F.col(value_col)).alias("tb"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "tb", "cnt")
    )


def start_timing_histogram_stream(
    hist: DataFrame,
    out_path: str,
    checkpoint: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Upsert each updated window's bucket histogram partition."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        spark = batch.sparkSession
        merged = batch.select("window_start", "tb", "cnt")
        # absent state = first batch; unreadable EXISTING state raises
        prev = read_state_or_none(spark, out_path)
        if prev is not None:
            touched = batch.select("window_start").distinct()
            stored = (
                prev.join(F.broadcast(touched), "window_start")
                .select("window_start", "tb", "cnt")
            )
            # batch rows carry the state's ABSOLUTE counts — they win;
            # stored rows survive only for buckets this batch didn't touch
            merged = merged.unionByName(
                stored.join(
                    batch.select("window_start", "tb"),
                    ["window_start", "tb"],
                    "left_anti",
                )
            )
        merged = merged.localCheckpoint(eager=True)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_start")
            .parquet(out_path)
        )

    return (
        hist.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_timing_quantiles(
    spark: SparkSession, out_path: str, percents: list[int]
) -> DataFrame:
    """quantileTimingMerge at read time: exact lower-bound weighted
    quantiles per window over the stored histograms."""
    hist = spark.read.parquet(out_path)
    return weighted_quantile_exact(
        hist, ["window_start"], "tb", "cnt", percents
    ).orderBy("window_start")
