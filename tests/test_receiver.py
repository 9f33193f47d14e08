"""Ingest receiver integration: encode -> HTTP POST -> landing dir ->
stream -> full labeler pipeline -> the q34-shaped per-class sums."""

from __future__ import annotations

import urllib.request

import pytest
from pyspark.sql import functions as F

from kubenetmon_spark.sources.receiver import (
    ObservationReceiver,
    frame_messages,
    unframe_messages,
)

SF_DIR = "/root/testdata/sf0.001"


def _post(url: str, body: bytes) -> int:
    req = urllib.request.Request(url, data=body, method="POST")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status
    except urllib.error.HTTPError as e:
        return e.code


class TestFraming:
    def test_roundtrip(self):
        msgs = [b"", b"a", b"x" * 300, bytes(range(256))]
        assert unframe_messages(frame_messages(msgs)) == msgs

    def test_truncated_rejected(self):
        body = frame_messages([b"hello world"])
        with pytest.raises(ValueError):
            unframe_messages(body[:-3])


class TestEndToEnd:
    def test_encode_post_stream_label(self, spark, tmp_path):
        from kubenetmon_spark.demo import DEMO_CFG, build_flow_inputs
        from kubenetmon_spark.operators.flows import (
            summing_aggregate,
            to_flow_rows,
        )
        from kubenetmon_spark.operators.label import (
            label_flows,
            split_rejected,
        )
        from kubenetmon_spark.sink import read_flows
        from kubenetmon_spark.sources.proto import encode_observation
        from kubenetmon_spark.sources.receiver import (
            read_received_observations,
        )
        from kubenetmon_spark.streaming.job import start_flow_stream

        obs, pods, nodes, prefixes = build_flow_inputs(spark, SF_DIR)
        obs = obs.filter(F.col("orig_src_port") % 40 == 0)  # small slice
        rows = [r.asDict() for r in obs.collect()]
        assert len(rows) > 10
        for r in rows:
            r["ts_seconds"] = int(r["ts"].timestamp())

        landing = str(tmp_path / "landing")
        rx = ObservationReceiver(landing).start()
        try:
            url = f"http://127.0.0.1:{rx.port}/observations"
            # agents batch client-side; ship in a few framed requests
            payload = [encode_observation(r) for r in rows]
            third = max(1, len(payload) // 3)
            for i in range(0, len(payload), third):
                assert _post(url, frame_messages(payload[i : i + third])) == 204
            # a corrupt message rejects the WHOLE request, lands nothing
            n_files = rx.stats["files"]
            assert (
                _post(url, frame_messages([b"\x99garbage"])) == 400
            )
            assert rx.stats["files"] == n_files
            assert rx.stats["rejected"] == 1
            # wrong path 404s
            assert _post(f"http://127.0.0.1:{rx.port}/nope", b"") == 404
        finally:
            rx.stop()

        # stream the landed files through the FULL pipeline
        q = start_flow_stream(
            read_received_observations(spark, landing),
            str(tmp_path / "flows"),
            str(tmp_path / "ckpt"),
            pods,
            nodes,
            prefixes,
            DEMO_CFG,
            trigger={"availableNow": True},
        )
        q.awaitTermination(300)

        got = (
            read_flows(spark, str(tmp_path / "flows"))
            .groupBy("connectionClass", "direction")
            .agg(
                F.sum("bytes").alias("bytes"),
                F.sum("packets").alias("packets"),
            )
        )
        # oracle: the same observations through the BATCH pipeline
        accepted, _ = split_rejected(
            label_flows(obs, pods, nodes, prefixes, DEMO_CFG)
        )
        want = (
            summing_aggregate(to_flow_rows(accepted))
            .groupBy("connectionClass", "direction")
            .agg(
                F.sum("bytes").alias("bytes"),
                F.sum("packets").alias("packets"),
            )
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
