"""Observability surface: per-batch metrics listener, reference-named
Prometheus counters, textfile exposition, and stream health — the
engine analogue of the reference's metrics port (reference
cmd/server/main.go:202-211, cmd/server/server.go:17-42)."""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import functions as F

from kubenetmon_spark.observability import (
    BatchMetricsListener,
    append_metrics_parquet,
    metrics_table,
    prometheus_render,
    reference_counters,
    stream_health,
    with_ingest_observation,
    write_textfile,
)
from kubenetmon_spark.streaming import read_observations
from tests.fixtures import observations_df


def test_listener_records_batches_and_observed_metrics(spark, tmp_path):
    obs = observations_df(spark)
    n_total = obs.count()
    # Half the rows get a synthetic reject_reason so observe() splits them.
    obs_dir = str(tmp_path / "obs")
    obs.repartition(2).write.parquet(obs_dir)

    listener = BatchMetricsListener()
    spark.streams.addListener(listener)
    try:
        stream = read_observations(spark, obs_dir).withColumn(
            "reject_reason",
            F.when(F.col("orig_src_port") % 2 == 0, F.lit("synthetic")),
        )
        n_rejected = obs.filter(F.col("orig_src_port") % 2 == 0).count()
        q = (
            with_ingest_observation(stream)
            .writeStream.queryName("obs_metrics_test")
            .format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = listener.wait_for_batches(1)
    finally:
        spark.streams.removeListener(listener)

    rows = [r for r in rows if r["query_name"] == "obs_metrics_test"]
    assert rows, "listener saw no progress events"
    assert sum(r["num_input_rows"] for r in rows) == n_total
    observed = {}
    for r in rows:
        for m in json.loads(r["observed_json"]).values():
            observed["n_labeled"] = observed.get("n_labeled", 0) + m.get("n_labeled", 0)
            observed["n_rejected"] = observed.get("n_rejected", 0) + m.get("n_rejected", 0)
    assert observed == {
        "n_labeled": n_total - n_rejected,
        "n_rejected": n_rejected,
    }

    # The system-table view round-trips the history.
    df = metrics_table(spark, rows)
    assert df.count() == len(rows)
    assert df.filter(F.col("num_input_rows") < 0).count() == 0

    # Day-partitioned persistence (querylog idiom).
    mpath = str(tmp_path / "metrics")
    append_metrics_parquet(spark, rows, mpath)
    back = spark.read.parquet(mpath)
    assert back.count() == len(rows)
    assert "log_date" in back.columns

    # Reference-named counters pick up the observe() split.
    samples = reference_counters(rows)
    by_key = {(s[0], tuple(sorted(s[1].items()))): s[2] for s in samples}
    assert (
        by_key[
            (
                "kubenetmon_server_processed_observations_total",
                (("type", "labeled"),),
            )
        ]
        == n_total - n_rejected
    )
    assert (
        by_key[
            (
                "kubenetmon_server_processed_observations_total",
                (("type", "dropped"),),
            )
        ]
        == n_rejected
    )
    assert (
        by_key[("kubenetmon_worker_batches_total", (("type", "inserted"),))]
        == len(rows)
    )


def test_windowed_pipeline_carries_observed_split(spark, tmp_path):
    """The production eager path with observe_metrics=True: every
    micro-batch's progress carries the labeled/rejected split that
    reference_counters maps to processed/dropped."""
    from kubenetmon_spark.demo import DEMO_CFG, build_flow_inputs
    from kubenetmon_spark.operators.label import label_flows, split_rejected
    from kubenetmon_spark.streaming import (
        start_windowed_flow_stream,
        streaming_network_flows,
    )

    obs, pods, nodes, prefixes = build_flow_inputs(spark, "/root/testdata/sf0.001")
    obs_dir = str(tmp_path / "obs")
    obs.limit(400).repartition(2).write.parquet(obs_dir)

    # batch reference: how many of these rows label vs reject
    batch_labeled = label_flows(
        spark.read.parquet(obs_dir), pods, nodes, prefixes, DEMO_CFG
    )
    acc, dead = split_rejected(batch_labeled)
    n_acc, n_dead = acc.count(), dead.count()

    listener = BatchMetricsListener()
    spark.streams.addListener(listener)
    try:
        stream = spark.readStream.schema(
            spark.read.parquet(obs_dir).schema
        ).parquet(obs_dir)
        flows = streaming_network_flows(
            stream, pods, nodes, prefixes, DEMO_CFG, observe_metrics=True
        )
        q = start_windowed_flow_stream(
            flows,
            str(tmp_path / "flows"),
            str(tmp_path / "ckpt"),
            trigger={"availableNow": True},
            query_name="windowed_obs_test",
        )
        q.awaitTermination(180)
        rows = listener.wait_for_batches(1)
    finally:
        spark.streams.removeListener(listener)

    rows = [r for r in rows if r["query_name"] == "windowed_obs_test"]
    assert rows
    samples = reference_counters(rows)
    by_key = {(s[0], tuple(sorted(s[1].items()))): s[2] for s in samples}
    key = "kubenetmon_server_processed_observations_total"
    assert by_key[(key, (("type", "labeled"),))] == n_acc
    assert by_key[(key, (("type", "dropped"),))] == n_dead


def test_reference_counters_without_observed_metrics():
    rows = [
        {
            "num_input_rows": 70,
            "sink_output_rows": 60,
            "observed_json": "{}",
        },
        {
            "num_input_rows": 30,
            "sink_output_rows": 40,
            "observed_json": "{}",
        },
    ]
    samples = reference_counters(rows)
    names = [(s[0], s[1]) for s in samples]
    # Without observe() metrics there is no labeled/dropped split.
    assert (
        "kubenetmon_server_processed_observations_total",
        {"type": "dropped"},
    ) not in names
    by_key = {(s[0], tuple(sorted(s[1].items()))): s[2] for s in samples}
    assert (
        by_key[
            (
                "kubenetmon_server_processed_observations_total",
                (("type", "labeled"),),
            )
        ]
        == 100
    )
    assert by_key[("kubenetmon_worker_rows_total", (("type", "inserted"),))] == 100
    assert by_key[("kubenetmon_worker_batches_total", (("type", "inserted"),))] == 2

    # foreachBatch sinks report no output rows: the counter is omitted,
    # never rendered as 0/-1.
    unknown = [dict(r, sink_output_rows=None) for r in rows]
    names = {s[0] for s in reference_counters(unknown)}
    assert "kubenetmon_worker_rows_total" not in names
    assert "kubenetmon_worker_batches_total" in names


def test_prometheus_render_format():
    body = prometheus_render(
        [
            ("m_total", {"type": "a"}, 1, "help a", "counter"),
            ("m_total", {"type": 'b"x\n'}, 2, "help a", "counter"),
            ("g", {}, 3.5, "a gauge", "gauge"),
        ]
    )
    lines = body.splitlines()
    # One HELP/TYPE header per metric, immediately before its samples.
    assert lines[0] == "# HELP m_total help a"
    assert lines[1] == "# TYPE m_total counter"
    assert lines[2] == 'm_total{type="a"} 1'
    assert lines[3] == 'm_total{type="b\\"x\\n"} 2'
    assert lines[4] == "# HELP g a gauge"
    assert lines[5] == "# TYPE g gauge"
    assert lines[6] == "g 3.5"
    assert body.endswith("\n")
    # Exactly one header pair per metric name.
    assert sum(1 for l in lines if l.startswith("# TYPE m_total")) == 1
    # Every sample line parses as name{...} value.
    sample_lines = [l for l in lines if not l.startswith("#")]
    for l in sample_lines:
        assert re.match(r"^[a-zA-Z_:][a-zA-Z0-9_:]*(\{.*\})? [-0-9.e+]+$", l), l


def test_write_textfile_atomic(tmp_path):
    path = str(tmp_path / "metrics.prom")
    write_textfile(path, "m 1\n")
    write_textfile(path, "m 2\n")
    with open(path) as f:
        assert f.read() == "m 2\n"
    # No temp droppings left next to the target.
    leftovers = [p for p in os.listdir(tmp_path) if p != "metrics.prom"]
    assert leftovers == []


class _FakeQuery:
    def __init__(self, active, progress=None, exc=None):
        self.isActive = active
        self.lastProgress = progress
        self._exc = exc

    def exception(self):
        return self._exc


def test_stream_health_states():
    assert stream_health(_FakeQuery(False))["status"] == "stopped"
    h = stream_health(_FakeQuery(False, exc=RuntimeError("boom")))
    assert h["status"] == "stopped" and "boom" in h["reasons"][0]
    # Active, no batches yet: starting up is healthy.
    assert stream_health(_FakeQuery(True))["status"] == "ok"

    progress = {
        "name": "q",
        "batchId": 7,
        "timestamp": "2026-08-15T00:00:00.000Z",
        "numInputRows": 10,
        "durationMs": {"triggerExecution": 1_000},
        "stateOperators": [],
        "sink": {"numOutputRows": 10},
    }
    # 10s after the last batch, 1s batches: healthy.
    import datetime as dt

    t0 = dt.datetime(2026, 8, 15, 0, 0, 0, tzinfo=dt.timezone.utc).timestamp()
    assert (
        stream_health(_FakeQuery(True, progress), now_s=t0 + 10)["status"] == "ok"
    )
    # Stale progress: degraded with a reason.
    h = stream_health(_FakeQuery(True, progress), now_s=t0 + 1000)
    assert h["status"] == "degraded" and "last progress" in h["reasons"][0]
    # Slow batches: degraded.
    slow = dict(progress, durationMs={"triggerExecution": 90_000})
    h = stream_health(
        _FakeQuery(True, slow), max_batch_duration_s=60, now_s=t0 + 10
    )
    assert h["status"] == "degraded" and "took" in h["reasons"][0]
