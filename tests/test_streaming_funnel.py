"""Streaming funnel: incremental state matches the batch window-function
form, late events are counted not reordered, state survives restart."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kubenetmon_spark.operators.funnel import window_funnel
from kubenetmon_spark.streaming.funnel import streaming_window_funnel

EPOCH = dt.datetime(2024, 1, 1)
SCHEMA = "user_id long, ts timestamp, event_type string"
STEPS = ["view", "click", "purchase"]


def _rows(spec):
    return [(u, EPOCH + dt.timedelta(seconds=s), t) for u, s, t in spec]


def _drain(spark, tmp_path, batches, name, window=100, **kw):
    """Write each batch as one parquet file (in order), then run the
    availableNow drain with maxFilesPerTrigger=1 so every file is its
    own micro-batch."""
    src = str(tmp_path / "src")
    for i, rows in enumerate(batches):
        spark.createDataFrame(_rows(rows), SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_window_funnel(stream, STEPS, window, **kw)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


class TestStreamingFunnel:
    def test_matches_batch_when_ordered(self, spark, tmp_path):
        b1 = [(1, 0, "view"), (1, 10, "click"), (2, 0, "view")]
        b2 = [(1, 20, "purchase"), (2, 30, "click"), (3, 5, "click")]
        res = _drain(spark, tmp_path, [b1, b2], "sf1")
        # last update per user = final state
        final = {
            r["user_id"]: r["funnel_level"]
            for r in res.collect()  # memory sink appends; later rows win
        }
        latest = {}
        for r in res.collect():
            latest[r["user_id"]] = r["funnel_level"]
        batch = {
            r["user_id"]: r["funnel_level"]
            for r in window_funnel(
                spark.createDataFrame(_rows(b1 + b2), SCHEMA), STEPS, 100
            ).collect()
        }
        assert latest == batch == {1: 3, 2: 2, 3: 0}

    def test_late_event_counted_not_folded(self, spark, tmp_path):
        b1 = [(1, 50, "view")]
        b2 = [(1, 10, "view"), (1, 60, "click")]  # ts=10 is late
        res = _drain(spark, tmp_path, [b1, b2], "sf2").collect()
        last = sorted(res, key=lambda r: r["n_late"])[-1]
        assert last["n_late"] == 1
        assert last["funnel_level"] == 2  # 50 -> 60 chain still formed

    def test_cross_batch_window_enforced(self, spark, tmp_path):
        b1 = [(1, 0, "view")]
        b2 = [(1, 5000, "click")]  # outside window
        res = _drain(spark, tmp_path, [b1, b2], "sf3").collect()
        levels = {r["funnel_level"] for r in res}
        assert max(levels) == 1

    def test_state_survives_restart(self, spark, tmp_path):
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")

        def run(rows):
            collected: list = []
            spark.createDataFrame(_rows(rows), SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            stream = spark.readStream.schema(SCHEMA).parquet(src)
            out = streaming_window_funnel(stream, STEPS, 100)
            q = (
                out.writeStream.foreachBatch(
                    lambda df, _bid: collected.extend(df.collect())
                )
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
            return collected

        run([(1, 0, "view"), (1, 10, "click")])
        got = run([(1, 20, "purchase")])
        assert got and got[-1]["funnel_level"] == 3  # chain built across restart
