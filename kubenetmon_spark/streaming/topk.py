"""Streaming windowed top-k — the continuous form of the README
top-talkers query (reference README.md:180-185), and of ClickHouse's
``topK``/``LIMIT k BY window`` read patterns.

Design: the stream aggregates to (window, key) partial counts with a
watermark (bounded state: windows close and are evicted), and the
RANKING happens in ``foreachBatch`` — a window function over each
micro-batch's updated windows only, upserted into a per-window
partitioned parquet table (dynamic partition overwrite). Ranking
inside the stream itself is impossible in Spark's model (window
functions aren't supported on streaming DataFrames in update mode) —
and unnecessary: only windows touched by a batch can change ranks, so
the foreachBatch recomputes exactly those partitions from the
aggregate state's output.

Delivery: update-mode aggregation + partition overwrite = per-window
idempotence (a retried batch rewrites the same partitions with the
same content). At 100 TB the shuffle carries (window, key) partials —
map-side combined — and each batch's ranking sorts only the touched
windows' keys, never history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from kubenetmon_spark.streaming.state import read_state_or_none


def windowed_counts(
    stream: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "10 minutes",
    measure: str | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Watermarked tumbling-window counts (or measure sums) per key.

    ``measure`` must be NON-NEGATIVE per event: the downstream top-k
    upsert's candidate rule (stored top-k ∪ batch updates) relies on
    per-key values only ever growing — a negative measure (deltas,
    refunds) would let a shrunken key squat in the stored ranking with
    its stale larger value.

    ``slide`` turns the window HOPPING ("top talkers over the trailing
    5 minutes, refreshed every minute" — the dashboard read ClickHouse
    users issue as a repeated range query): each event joins
    window/slide overlapping windows, so aggregation state and the
    downstream ranking table grow by that overlap factor — size the
    watermark to (window + lateness), and keep the factor small
    (5m/1m = 5×) at 100 TB. Everything downstream (update-mode
    partials, foreachBatch ranking, per-window partition upsert) is
    window-shape-agnostic and unchanged."""
    agg = (
        F.sum(measure).alias("val") if measure else F.count(F.lit(1)).alias("val")
    )
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), F.col(key_col))
        .agg(agg)
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "val",
        )
    )


def start_topk_stream(
    counts: DataFrame,
    out_path: str,
    checkpoint: str,
    k: int = 5,
    key_col: str = "key",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Rank each updated window's keys and upsert its top-k partition."""

    def rank_and_upsert(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql.window import Window

        if not batch.take(1):
            return
        spark = batch.sparkSession
        # Update mode emits only CHANGED (window, key) rows, so the
        # batch alone cannot re-rank a window. But count/sum values of
        # non-negative measures are MONOTONE: an unchanged key's value
        # is exactly what the stored ranking recorded, and other keys
        # only grow — so a key can enter the new top-k only from the
        # stored top-k or from this batch's updates. Candidates =
        # stored partitions of touched windows UNION batch updates
        # (batch value wins); rank that.
        candidates = batch.select("window_start", key_col, "val")
        # only a genuinely-absent state means first batch; a failed read
        # of EXISTING state must raise, not silently reset the rankings
        prev = read_state_or_none(spark, out_path)
        if prev is not None:
            touched = batch.select("window_start").distinct()
            stored = (
                prev.join(F.broadcast(touched), "window_start")
                .select("window_start", key_col, "val")
            )
            candidates = candidates.unionByName(
                stored.join(
                    batch.select("window_start", key_col),
                    ["window_start", key_col],
                    "left_anti",
                )
            )
        w = Window.partitionBy("window_start").orderBy(
            F.desc("val"), F.col(key_col)
        )
        top = (
            candidates.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            # materialize BEFORE writing: the plan reads the very
            # partitions the write overwrites
            .localCheckpoint(eager=True)
        )
        (
            top.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_start")
            .parquet(out_path)
        )

    return (
        counts.writeStream.outputMode("update")
        .foreachBatch(rank_and_upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_topk(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(out_path)
