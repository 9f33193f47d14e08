"""Tests for native streaming session windows and cumulative-counter
deltification (batch + applyInPandasWithState stream forms)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from kubenetmon_spark.streaming import (
    deltify_batch,
    deltify_stream,
    streaming_session_stats,
)


def _ts(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


CUM_SCHEMA = "conn string, ts timestamp, bytes_total long, packets_total long"


class TestDeltifyBatch:
    def test_deltas_and_first_row(self, spark):
        df = spark.createDataFrame(
            [
                ("c1", _ts(10, 0), 100, 10),
                ("c1", _ts(10, 1), 250, 25),
                ("c1", _ts(10, 2), 300, 30),
            ],
            CUM_SCHEMA,
        )
        out = {r.ts: (r.bytes_delta, r.packets_delta)
               for r in deltify_batch(df, ["conn"]).collect()}
        assert out[_ts(10, 0)] == (100, 10)   # first observation = full value
        assert out[_ts(10, 1)] == (150, 15)
        assert out[_ts(10, 2)] == (50, 5)

    def test_counter_reset_restarts(self, spark):
        # cumulative value FELL -> new connection on the same key; the new
        # cumulative value is the delta (conntrack zero-on-read answer)
        df = spark.createDataFrame(
            [("c1", _ts(10, 0), 500, 50), ("c1", _ts(10, 1), 40, 4)],
            CUM_SCHEMA,
        )
        out = {r.ts: r.bytes_delta for r in deltify_batch(df, ["conn"]).collect()}
        assert out[_ts(10, 1)] == 40

    def test_sum_of_deltas_equals_last_cumulative(self, spark):
        rows = [("c1", _ts(10, i), 100 * (i + 1), 10 * (i + 1)) for i in range(8)]
        df = spark.createDataFrame(rows, CUM_SCHEMA)
        total = deltify_batch(df, ["conn"]).agg(F.sum("bytes_delta")).collect()[0][0]
        assert total == 800


class TestDeltifyStream:
    def test_stream_matches_batch(self, spark, tmp_path):
        rows = [
            ("c1", _ts(10, 0), 100, 10),
            ("c1", _ts(10, 1), 250, 25),
            ("c2", _ts(10, 0), 7, 1),
            ("c2", _ts(10, 5), 10, 2),
        ]
        df = spark.createDataFrame(rows, CUM_SCHEMA)
        src = str(tmp_path / "cum")
        df.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        out = deltify_stream(stream, ["conn"])
        q = (
            out.writeStream.format("memory")
            .queryName("deltified")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r.conn, r.ts): (r.bytes_delta, r.packets_delta)
            for r in spark.sql("SELECT * FROM deltified").collect()
        }
        expect = {
            (r.conn, r.ts): (r.bytes_delta, r.packets_delta)
            for r in deltify_batch(df, ["conn"]).collect()
        }
        assert got == expect


class TestStreamingSessions:
    def test_session_window_counts(self, spark, tmp_path):
        # user 1: 2 events 5 min apart (one session), then one 2 h later
        rows = [
            (1, _ts(10, 0)),
            (1, _ts(10, 5)),
            (1, _ts(12, 30)),
            (2, _ts(10, 0)),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        src = str(tmp_path / "ev")
        df.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        out = streaming_session_stats(stream, ["user_id"], gap="30 minutes")
        q = (
            out.writeStream.format("memory")
            .queryName("sessions")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r.user_id, r.session_start, r.n_events)
            for r in spark.sql("SELECT * FROM sessions").collect()
        }
        # Append mode emits a session only after the watermark (max ts -
        # 30 min = 12:00) passes its close: both 10:00 sessions are final;
        # user 1's 12:30 session is still OPEN state, correctly withheld
        # until later data advances the watermark.
        assert got == {(1, _ts(10, 0), 2), (2, _ts(10, 0), 1)}


class TestDeltifyRestart:
    def test_state_survives_checkpoint_restart(self, spark, tmp_path):
        """Cumulative counters arriving AFTER a stream restart must diff
        against the state saved before the restart, not restart from 0."""
        src = str(tmp_path / "cum")
        ckpt = str(tmp_path / "ckpt")
        out_dir = str(tmp_path / "out")

        def run_once():
            # file sink, not memory: only durable sinks support restarting
            # from a checkpoint
            stream = spark.readStream.schema(
                "conn string, ts timestamp, bytes_total long, packets_total long"
            ).parquet(src)
            q = (
                deltify_stream(stream, ["conn"])
                .writeStream.format("parquet")
                .option("path", out_dir)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            # NoTimeout (the default) is what makes this drain terminate:
            # a processing-time timeout would schedule empty batches forever
            assert q.awaitTermination(300), "availableNow drain did not finish"

        batch1 = spark.createDataFrame(
            [("c1", _ts(10, 0), 100, 10), ("c1", _ts(10, 1), 250, 25)], CUM_SCHEMA
        )
        batch1.coalesce(1).write.mode("append").parquet(src)
        run_once()
        # new file lands while the stream is DOWN; restart from checkpoint
        batch2 = spark.createDataFrame([("c1", _ts(10, 2), 400, 40)], CUM_SCHEMA)
        batch2.coalesce(1).write.mode("append").parquet(src)
        run_once()
        got = {
            r.ts: (r.bytes_delta, r.packets_delta)
            for r in spark.read.parquet(out_dir).collect()
        }
        # 400-250: diffed against pre-restart state, not treated as a reset
        assert got[_ts(10, 2)] == (150, 15)
        assert got[_ts(10, 0)] == (100, 10) and got[_ts(10, 1)] == (150, 15)


class TestDeltifyEviction:
    def test_idle_key_evicted_by_event_time(self, spark, tmp_path):
        """With ``idle_timeout``, a key silent past the watermark loses its
        snapshot; its next observation counts in full — the same answer
        conntrack gives after the kernel expires an idle connection."""
        src = str(tmp_path / "cum")
        ckpt = str(tmp_path / "ckpt")
        out_dir = str(tmp_path / "out")

        def run_once(*rows):
            spark.createDataFrame(list(rows), CUM_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            stream = spark.readStream.schema(CUM_SCHEMA).parquet(src)
            q = (
                deltify_stream(stream, ["conn"], idle_timeout="10 minutes")
                .writeStream.format("parquet")
                .option("path", out_dir)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(300), "availableNow drain did not finish"

        run_once(("c1", _ts(10, 0), 50, 5), ("c2", _ts(10, 0), 50, 5))
        # c1 keeps talking; the watermark (max ts - 10 min) passes c2's
        # timeout (10:10) during the 10:45 batch -> c2's state is evicted
        run_once(("c1", _ts(10, 30), 60, 6))
        run_once(("c1", _ts(10, 45), 70, 7))
        run_once(("c2", _ts(10, 50), 120, 12))
        got = {
            (r.conn, r.ts): r.bytes_delta
            for r in spark.read.parquet(out_dir).collect()
        }
        assert got[("c1", _ts(10, 30))] == 10  # state survived: 60 - 50
        # evicted key restarts from zero: full 120, not 120 - 50 = 70
        assert got[("c2", _ts(10, 50))] == 120
