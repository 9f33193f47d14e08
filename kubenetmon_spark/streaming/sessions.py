"""Streaming stateful extensions: native session windows and
cumulative-counter deltification.

Neither exists in the reference as code, but both are contracts it
relies on:

- Sessions: the reference's per-connection state lives in the KERNEL
  (conntrack), so the server never sessionizes. A pipeline ingesting
  app-level events on this engine does; Spark's ``session_window``
  gives gap-based sessions with watermark-bounded state.
- Deltification: the conntrack dump ZEROES counters on read
  (reference pkg/collector/collector.go:134, DumpOptions{ZeroCounters:
  true}), which is delta encoding at the source. SURVEY.md §2 S1: "if
  a feed ever supplies cumulative counters, use applyInPandasWithState
  to diff". ``deltify_stream`` is that operator.

Scale posture: both are keyed stateful ops — state is per-key and
watermark/timeout-bounded, shuffled once on the key. ``deltify``'s
state is ONE row (the last cumulative snapshot) per live connection;
eviction via GroupStateTimeout drops idle connections, which also
makes counter-reset detection (new connection reusing a 5-tuple)
explicit: a cumulative value below the stored snapshot restarts from
the new value, the same answer conntrack's zero-on-read gives.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def streaming_session_stats(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-(key, session) event counts via native ``session_window``.

    Append-mode output: a session row becomes final once the watermark
    passes its close. Batch equivalent: operators/sessions.session_stats
    (same gap semantics; the batch form also reports duration from
    second-truncated timestamps).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"), *key_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *key_cols,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
        )
    )


_DELTA_OUT_FIELDS = [
    StructField("ts", TimestampType(), True),
    StructField("bytes_delta", LongType(), True),
    StructField("packets_delta", LongType(), True),
]
_STATE_SCHEMA = StructType(
    [StructField("last_bytes", LongType()), StructField("last_packets", LongType())]
)


def _deltify_group_schema(key_fields: StructType) -> StructType:
    return StructType(list(key_fields.fields) + list(_DELTA_OUT_FIELDS))


def deltify_stream(
    observations: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    bytes_col: str = "bytes_total",
    packets_col: str = "packets_total",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Cumulative per-connection counters -> per-interval deltas.

    Emits one row per input observation with ``bytes_delta`` /
    ``packets_delta``. First observation of a key (or after idle
    eviction / counter reset) contributes its full value — exactly the
    semantics of conntrack's zero-on-read dumps.

    ``idle_timeout`` (e.g. ``"30 minutes"``) bounds state at scale: it
    sets a watermark on ``ts_col`` and evicts a connection's snapshot
    via **event-time** timeout once the watermark passes its last
    observation + timeout. Event time, not processing time, on purpose:
    a processing-time timeout forces the microbatch engine to keep
    scheduling empty batches to re-check wall-clock timers, so a
    ``trigger(availableNow)`` drain never terminates; an event-time
    timeout only fires when new data advances the watermark, is
    deterministic under replay, and costs nothing when the stream is
    idle. ``None`` keeps state forever (exact; fine for bounded key
    cardinality like test/backfill runs).
    """
    key_schema = StructType(
        [observations.schema[c] for c in key_cols]
    )
    out_schema = _deltify_group_schema(key_schema)
    evict = idle_timeout is not None
    timeout_delta = pd.Timedelta(idle_timeout) if evict else None

    def diff(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        last_b, last_p = state.get if state.exists else (0, 0)
        frames = []
        last_ts = None
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            b = pdf[bytes_col].astype("int64")
            p = pdf[packets_col].astype("int64")
            prev_b = b.shift(1).fillna(last_b).astype("int64")
            prev_p = p.shift(1).fillna(last_p).astype("int64")
            db = b - prev_b
            dp = p - prev_p
            # counter reset (value fell): the new cumulative IS the delta
            db = db.where(db >= 0, b)
            dp = dp.where(dp >= 0, p)
            out = pd.DataFrame({"ts": pdf[ts_col], "bytes_delta": db, "packets_delta": dp})
            for i, c in enumerate(key_cols):
                out.insert(i, c, key[i])
            frames.append(out)
            last_b, last_p = int(b.iloc[-1]), int(p.iloc[-1])
            last_ts = pdf[ts_col].iloc[-1]
        state.update((last_b, last_p))
        if evict and last_ts is not None:
            state.setTimeoutTimestamp(
                int((pd.Timestamp(last_ts) + timeout_delta).timestamp() * 1000)
            )
        if frames:
            yield pd.concat(frames, ignore_index=True)

    if evict:
        observations = observations.withWatermark(ts_col, idle_timeout)
    return (
        observations.groupBy(*key_cols)
        .applyInPandasWithState(
            diff,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.EventTimeTimeout
                if evict
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def deltify_batch(
    observations: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    bytes_col: str = "bytes_total",
    packets_col: str = "packets_total",
) -> DataFrame:
    """Batch/backfill form of :func:`deltify_stream` — same arithmetic
    as one window pass (lag per key, reset-aware), for reprocessing
    at-rest cumulative feeds. One shuffle on the connection key."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    b, p = F.col(bytes_col), F.col(packets_col)
    db = b - F.lag(b, 1, 0).over(w)
    dp = p - F.lag(p, 1, 0).over(w)
    return observations.select(
        *key_cols,
        F.col(ts_col).alias("ts"),
        F.when(db >= 0, db).otherwise(b).cast("long").alias("bytes_delta"),
        F.when(dp >= 0, dp).otherwise(p).cast("long").alias("packets_delta"),
    )
