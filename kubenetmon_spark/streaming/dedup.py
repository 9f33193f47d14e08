"""Row-level streaming deduplication and watermarked stream-stream joins.

The reference achieves insert idempotence with a per-batch
``insert_deduplication_token`` (reference pkg/inserter/worker.go:248): a
*whole batch* re-sent on retry is dropped by ClickHouse. That protects
against inserter retries but not against the agent re-sending individual
observations (at-least-once gRPC delivery after a reconnect, reference
cmd/server/main.go:190-195 forces reconnects every 300 s). Spark's
``dropDuplicatesWithinWatermark`` gives the finer-grained guarantee the
reference cannot express: one state entry per dedup key, expired once the
event-time watermark passes, so re-deliveries within the horizon are
dropped **row-by-row** with bounded state.

Stream-stream correlation (``interval_join_streams``) is the Spark-native
form of "join two live feeds on key within a time bound" — e.g. matching
the out-direction observation of a flow with its in-direction twin, or
observations with a stream of pod lifecycle events. Both sides are
watermarked; Spark buffers only rows inside the interval bound, so state
is O(rate x interval), independent of stream length.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    event_time_col: str = "collection_time",
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop re-delivered rows whose dedup key reappears within ``delay``.

    ``keys`` should identify a delivery (for observations:
    socket 5-tuple + collection_time, NOT the counters — a genuine new
    reading of the same socket has a new collection_time and survives).
    The event-time column need not be part of ``keys``; state for a key
    is dropped once the watermark passes its first-seen time + delay, so
    a duplicate arriving later than ``delay`` after the original is NOT
    dropped — size ``delay`` to the redelivery horizon (gRPC max
    connection age + grace, 300+60 s in the reference's deployment).
    """
    if event_time_col not in keys:
        keys = [*keys, event_time_col]
    return df.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(keys)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    equi_keys: list[tuple[str, str]],
    left_time: str,
    right_time: str,
    lower: str = "INTERVAL 0 SECONDS",
    upper: str = "INTERVAL 5 MINUTES",
    watermark_delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: rows pair when every equi key
    matches and ``right_time`` lands in [left_time + lower,
    left_time + upper].

    Both inputs are watermarked with the same delay; the time-range
    term in the join condition is what lets Spark bound the join state
    (it evicts buffered rows once the other side's watermark clears the
    interval). Outer variants ("left_outer"/"right_outer"/"full_outer")
    emit their null-padded rows only after that eviction point — final,
    exactly once.

    Column-name collisions are the caller's problem by design: project
    and alias each side first (the tests and demo do), exactly as the
    batch join API requires.
    """
    lw = left.withWatermark(left_time, watermark_delay)
    rw = right.withWatermark(right_time, watermark_delay)
    key_conds = [lw[lk] == rw[rk] for lk, rk in equi_keys]
    time_cond = (rw[right_time] >= lw[left_time] + F.expr(lower)) & (
        rw[right_time] <= lw[left_time] + F.expr(upper)
    )
    cond = reduce(lambda a, b: a & b, key_conds, time_cond)
    return lw.join(rw, cond, how)
