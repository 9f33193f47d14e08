"""Gap-based sessionization.

The reference has no session concept (flows are minute-bucketed,
SURVEY.md §2 A2), but any clickstream/training-data pipeline on this
engine needs it: group a key's events into sessions separated by an
inactivity gap, entirely with window functions.

Scale posture: exactly ONE shuffle, on the session key. Both window
passes (the lag that detects gaps and the running sum that numbers
sessions) share the same partitioning, so Catalyst plans a single
Exchange followed by two in-partition Window operators over the same
sort. State per key is a sort buffer of that key's events — bounded by
per-key activity, never by table size; a hot key is one partition's
sort spill, not a cluster problem.

Determinism: ties on the timestamp are broken by ``order_cols`` (pass a
unique id); with a total order per key the session numbering is stable
under any shuffle order.

For streaming, the same semantics come from
``applyInPandasWithState``-style session windows or Spark's native
``session_window``; this operator is the batch/backfill form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_cols: list[str] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Add an integer ``session_col`` (1-based per key) to ``df``.

    A new session starts at a key's first event and whenever the gap
    since the previous event exceeds ``gap_seconds``. Timestamps are
    compared at whole-second resolution (cast to epoch seconds), which
    also makes the split identical across engines whose sub-second
    precision differs.
    """
    # cast through LTZ so TIMESTAMP_NTZ inputs (Spark 4 refuses a direct
    # NTZ -> long cast) and plain timestamps both land on epoch seconds.
    ts_s: Column = F.col(ts_col).cast("timestamp").cast("long")
    order = [ts_s] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(ts_s).over(w)
    new_session = F.when(
        prev.isNull() | ((ts_s - prev) > F.lit(gap_seconds)), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(new_session).over(running))


def session_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-session rollup: (key, session_id, n_events, duration_s)."""
    s = sessionize(df, key_cols, ts_col, gap_seconds, order_cols)
    ts_s = F.col(ts_col).cast("timestamp").cast("long")
    return s.groupBy(*key_cols, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ts_s) - F.min(ts_s)).alias("duration_s"),
    )
