"""Ops observability: per-batch metrics history, Prometheus text
exposition, and stream health — the engine-side analogue of the
reference server's metrics + health surface (reference
cmd/server/main.go:202-211 serves promhttp on ``/metrics``; the
counters live in cmd/server/server.go:17-42 and
pkg/inserter/worker.go:19-66).

Spark-native mapping. The reference is a long-lived gRPC server, so it
exposes an HTTP scrape endpoint. This engine's ingest is a Structured
Streaming query, so the idiomatic equivalents are:

- ``BatchMetricsListener`` — a ``StreamingQueryListener`` that records
  one row per finished micro-batch (Spark's own progress events carry
  input rows, per-stage durations, state-store sizes, sink output rows,
  and any user ``observe()`` metrics). The bounded history doubles as
  the ``system.metrics`` table: ``metrics_table`` turns it into a
  DataFrame, ``append_metrics_parquet`` persists it day-partitioned
  next to the query log (querylog.py idiom).
- ``reference_counters`` — projects the history onto the reference's
  published metric names (``kubenetmon_server_processed_observations_total``,
  ``kubenetmon_worker_rows_total``, ...), so dashboards written against
  the reference keep working.
- ``prometheus_render`` / ``write_textfile`` — the Prometheus text
  exposition format, written atomically for the node-exporter textfile
  collector: the standard way to get metrics from a batch/driver
  process into Prometheus without running an HTTP server.
- ``stream_health`` — the liveness/readiness answer (reference deploys
  probe the metrics port): active? recent progress? batches completing
  inside the trigger budget?

Nothing here touches the data path: listeners observe completed
batches from the driver, and rendering is string formatting.
"""

from __future__ import annotations

import json
import math
import os
import tempfile
import time
from collections import deque
from typing import Any

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - import surface differs across minor versions
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover
    from pyspark.sql.streaming.listener import StreamingQueryListener


METRICS_ROW_SCHEMA = (
    "query_name string, run_id string, batch_id long, event_ts string,"
    " num_input_rows long, input_rows_per_second double,"
    " processed_rows_per_second double, trigger_ms long, add_batch_ms long,"
    " state_rows long, sink_output_rows long, observed_json string"
)


def _progress_row(p: dict) -> dict:
    """One metrics row from a StreamingQueryProgress JSON dict."""
    durations = p.get("durationMs") or {}
    state_rows = sum(
        int(s.get("numRowsTotal") or 0) for s in (p.get("stateOperators") or [])
    )
    sink_rows = (p.get("sink") or {}).get("numOutputRows")
    # foreachBatch and other opaque sinks report -1 ("unknown"), not 0.
    if sink_rows is not None and int(sink_rows) < 0:
        sink_rows = None

    def _f(x):
        if x is None:
            return None
        x = float(x)
        return None if (math.isnan(x) or math.isinf(x)) else x

    return {
        "query_name": p.get("name"),
        "run_id": p.get("runId"),
        "batch_id": int(p.get("batchId") or 0),
        "event_ts": p.get("timestamp"),
        "num_input_rows": int(p.get("numInputRows") or 0),
        "input_rows_per_second": _f(p.get("inputRowsPerSecond")),
        "processed_rows_per_second": _f(p.get("processedRowsPerSecond")),
        "trigger_ms": int(durations.get("triggerExecution") or 0),
        "add_batch_ms": int(durations.get("addBatch") or 0),
        "state_rows": int(state_rows),
        "sink_output_rows": None if sink_rows is None else int(sink_rows),
        "observed_json": json.dumps(p.get("observedMetrics") or {}, sort_keys=True),
    }


class BatchMetricsListener(StreamingQueryListener):
    """Records one dict per finished micro-batch, bounded to ``maxlen``
    (a long-lived driver must not grow without bound — the reference's
    counters are O(1) for the same reason). Attach with
    ``spark.streams.addListener(listener)``; detach with
    ``spark.streams.removeListener(listener)``.

    Thread-safety: Spark delivers listener events from a single
    listener-bus thread, and ``deque`` appends are atomic, so
    ``snapshot()`` from the main thread needs no lock.
    """

    def __init__(self, maxlen: int = 10_000):
        self.history: deque[dict] = deque(maxlen=maxlen)

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event):  # noqa: N802 (Spark API casing)
        pass

    def onQueryProgress(self, event):  # noqa: N802
        # .json is the stable cross-version surface of the progress object.
        self.history.append(_progress_row(json.loads(event.progress.json)))

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    # -- consumption -------------------------------------------------------
    def snapshot(self) -> list[dict]:
        return list(self.history)

    def wait_for_batches(self, n: int = 1, timeout_s: float = 30.0) -> list[dict]:
        """Listener events are delivered asynchronously after the batch
        commits; poll until ``n`` rows arrived (tests and scripts that
        read metrics right after ``awaitTermination`` need this)."""
        deadline = time.monotonic() + timeout_s
        while len(self.history) < n and time.monotonic() < deadline:
            time.sleep(0.05)
        return self.snapshot()


def metrics_table(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """The ``system.metrics``-style DataFrame over listener history."""
    cols = [c.split(" ")[0] for c in METRICS_ROW_SCHEMA.split(", ")]
    data = [tuple(r.get(c) for c in cols) for r in rows]
    return spark.createDataFrame(data, METRICS_ROW_SCHEMA)


def append_metrics_parquet(
    spark: SparkSession, rows: list[dict], path: str
) -> None:
    """Persist listener history day-partitioned (querylog.py idiom):
    ``log_date`` derives from the progress event timestamp, so replays
    land in their original partition."""
    from pyspark.sql import functions as F

    if not rows:
        return
    df = metrics_table(spark, rows).withColumn(
        "log_date", F.substring("event_ts", 1, 10)
    )
    df.write.mode("append").partitionBy("log_date").parquet(path)


# ---------------------------------------------------------------------------
# Prometheus exposition
# ---------------------------------------------------------------------------

def _escape_label(v: Any) -> str:
    return str(v).replace("\\", r"\\").replace('"', r"\"").replace("\n", r"\n")


def prometheus_render(samples: list[tuple]) -> str:
    """Prometheus text exposition format (version 0.0.4 — the format
    promhttp serves in the reference). ``samples`` rows are
    ``(name, labels_dict, value, help_text, metric_type)``; consecutive
    samples of one metric share a single HELP/TYPE header, matching the
    format's "all samples of a metric are grouped" rule."""
    out: list[str] = []
    seen_header: set[str] = set()
    for name, labels, value, help_text, mtype in samples:
        if name not in seen_header:
            out.append(f"# HELP {name} {help_text}")
            out.append(f"# TYPE {name} {mtype}")
            seen_header.add(name)
        if labels:
            inner = ",".join(
                f'{k}="{_escape_label(v)}"' for k, v in sorted(labels.items())
            )
            out.append(f"{name}{{{inner}}} {value}")
        else:
            out.append(f"{name} {value}")
    return "\n".join(out) + "\n"


def write_textfile(path: str, body: str) -> None:
    """Atomic write for the node-exporter textfile collector: the
    collector may scrape mid-write, so the file must appear in one
    rename (tmp file in the same directory, then ``os.replace``)."""
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(body)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def reference_counters(
    rows: list[dict],
    labeled_metric: str = "n_labeled",
    rejected_metric: str = "n_rejected",
) -> list[tuple]:
    """Project listener history onto the reference's metric names so
    existing dashboards keep working (reference cmd/server/server.go:
    17-42 ``kubenetmon_server_*``; pkg/inserter/worker.go:19-66
    ``kubenetmon_worker_*``).

    ``labeled``/``dropped`` counts come from user ``observe()`` metrics
    when the pipeline attaches them (see ``with_ingest_observation``);
    without them, input rows stand in for processed observations —
    the filter/labeling split is then invisible to the counter, exactly
    as it would be to an external scraper.
    """
    batches = len(rows)
    input_rows = sum(r["num_input_rows"] for r in rows)
    known_sink = [
        r["sink_output_rows"] for r in rows if r["sink_output_rows"] is not None
    ]
    sink_rows = sum(known_sink)
    labeled = dropped = None
    observed_any = False
    for r in rows:
        obs = json.loads(r["observed_json"] or "{}")
        for m in obs.values():
            if labeled_metric in m or rejected_metric in m:
                observed_any = True
                labeled = (labeled or 0) + int(m.get(labeled_metric) or 0)
                dropped = (dropped or 0) + int(m.get(rejected_metric) or 0)
    processed = labeled if observed_any else input_rows
    samples = [
        (
            "kubenetmon_server_processed_observations_total",
            {"type": "labeled"},
            int(processed or 0),
            "Number of flows processed by kubenetmon server since start",
            "counter",
        ),
    ]
    if observed_any:
        samples.append(
            (
                "kubenetmon_server_processed_observations_total",
                {"type": "dropped"},
                int(dropped or 0),
                "Number of flows processed by kubenetmon server since start",
                "counter",
            )
        )
    # foreachBatch sinks never report output rows (-1 -> unknown); a
    # counter that silently reads 0 would alarm, so omit it instead.
    if known_sink:
        samples.append(
            (
                "kubenetmon_worker_rows_total",
                {"type": "inserted"},
                int(sink_rows),
                "Total number of rows inserted by kubenetmon workers",
                "counter",
            )
        )
    samples += [
        (
            "kubenetmon_worker_batches_total",
            {"type": "inserted"},
            int(batches),
            "Total number of batches inserted by kubenetmon workers",
            "counter",
        ),
    ]
    return samples


def with_ingest_observation(df: DataFrame, name: str = "kubenetmon_ingest") -> DataFrame:
    """Attach labeled/rejected counters to a (streaming or batch) labeled
    DataFrame via ``observe()`` — they ride the normal execution (no
    second pass) and surface in each progress event's
    ``observedMetrics``, where ``reference_counters`` picks them up.
    Expects the labeler's ``reject_reason`` column."""
    from pyspark.sql import functions as F

    return df.observe(
        name,
        F.count(F.when(F.col("reject_reason").isNull(), 1)).alias("n_labeled"),
        F.count(F.when(F.col("reject_reason").isNotNull(), 1)).alias("n_rejected"),
    )


# ---------------------------------------------------------------------------
# Health
# ---------------------------------------------------------------------------

def stream_health(
    query,
    max_progress_age_s: float = 120.0,
    max_batch_duration_s: float = 60.0,
    now_s: float | None = None,
) -> dict:
    """Liveness answer for one streaming query: ``status`` is ``ok``,
    ``degraded`` (active but slow/stale), or ``stopped``; ``reasons``
    says why. Mirrors what the reference's deployment probes infer from
    the metrics port (reference deploy/helm probes the server process).

    ``now_s`` is injectable for tests (epoch seconds).
    """
    reasons: list[str] = []
    if not query.isActive:
        ex = query.exception()
        return {
            "status": "stopped",
            "reasons": [f"exception: {ex}"] if ex else ["not active"],
        }
    p = query.lastProgress
    if p is None:
        # Active but never completed a batch: starting up.
        return {"status": "ok", "reasons": ["no batches yet"]}
    row = _progress_row(p)
    now = time.time() if now_s is None else now_s
    ts = row["event_ts"]
    if ts:
        # Progress timestamps are ISO-8601 UTC ("2026-08-15T01:00:00.000Z").
        from datetime import datetime, timezone

        age = now - datetime.fromisoformat(ts.replace("Z", "+00:00")).replace(
            tzinfo=timezone.utc
        ).timestamp()
        if age > max_progress_age_s:
            reasons.append(f"last progress {age:.0f}s ago")
    if row["trigger_ms"] > max_batch_duration_s * 1000:
        reasons.append(
            f"batch {row['batch_id']} took {row['trigger_ms'] / 1000:.1f}s"
        )
    return {"status": "degraded" if reasons else "ok", "reasons": reasons}
