"""Funnel analysis: ClickHouse ``windowFunnel``-style ordered step matching.

The reference's analytics store is ClickHouse, whose funnel surface
(``windowFunnel(window)(ts, cond1, cond2, ...)``) answers "how far through
an ordered sequence of steps did each user get, with every step inside a
time window of the first". The reference repo itself never calls it, but
it is a core capability of the engine class we are reproducing, so it is
first-class here.

Semantics (documented precisely so the DuckDB oracle can mirror them):

    funnel_level(user) = max L such that there exist events e1..eL of the
    user with type(e_i) = steps[i], strictly increasing timestamps, and
    ts(e_L) - ts(e_1) <= window_seconds.

Strictly increasing: two events sharing a timestamp can never chain.
This "exists a chain" definition is equivalent to ClickHouse's default
(non-strict modes aside) and — unlike an imperative scan — has a direct
SQL formulation via EXISTS joins, which the correctness gate exercises.

Plan shape: filter to step events (scan-side, pushed down) -> one hash
shuffle on the user key -> Arrow-batched per-user DP. State per user is
one timestamp per funnel level, so a 100 TB event log funnels with
shuffle volume = step events only and O(levels) memory per key.

The DP keeps, per level i, the **latest** chain-start timestamp among
chains reaching level i using only events processed so far. Exchange
argument for correctness: a later start can extend in every case an
earlier start can (the window constraint ``t - start <= window`` only
loosens as start grows, and event-order feasibility is guaranteed by
processing events in timestamp order with per-timestamp snapshots for
strictness). So "exists a chain to level i" == "DP filled seen[i]".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def window_funnel(
    events: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_cols: list[str] | None = None,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel depth for an ordered step sequence within a window.

    Returns ``user_cols + [funnel_level]`` with one row per user that has
    at least one event of any step type (level 0 = has step events but no
    step-1 event started a chain).

    ``steps`` must be distinct event types.
    """
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    user_cols = user_cols or ["user_id"]

    step_idx = F.when(F.col(type_col) == steps[0], 0)
    for i, s in enumerate(steps[1:], start=1):
        step_idx = step_idx.when(F.col(type_col) == s, i)

    # Scan-side reduction: only step events reach the shuffle.
    slim = events.filter(F.col(type_col).isin(list(steps))).select(
        *user_cols,
        F.col(ts_col).alias("_ts"),
        step_idx.cast("int").alias("_step"),
    )

    out_schema = StructType(
        [slim.schema[c] for c in user_cols]
        + [StructField("funnel_level", LongType(), False)]
    )
    n_steps = len(steps)
    window_us = int(window_seconds) * 1_000_000

    def dp(key, pdf):
        import numpy as np
        import pandas as pd

        ts = pdf["_ts"].values.astype("datetime64[us]").astype("int64")
        st = pdf["_step"].values
        order = np.argsort(ts, kind="stable")
        ts, st = ts[order], st[order]

        seen = [None] * n_steps  # latest chain-start ts reaching level i
        i, n = 0, len(ts)
        while i < n:
            j = i
            while j < n and ts[j] == ts[i]:
                j += 1
            snapshot = list(seen)  # state from strictly-earlier timestamps
            t = ts[i]
            for p in range(i, j):
                k = int(st[p])
                if k == 0:
                    if seen[0] is None or t > seen[0]:
                        seen[0] = t
                elif snapshot[k - 1] is not None and t - snapshot[k - 1] <= window_us:
                    if seen[k] is None or snapshot[k - 1] > seen[k]:
                        seen[k] = snapshot[k - 1]
            i = j

        level = 0
        for lvl in range(n_steps, 0, -1):
            if seen[lvl - 1] is not None:
                level = lvl
                break
        return pd.DataFrame([list(key) + [level]], columns=list(out_schema.names))

    return slim.groupBy(*user_cols).applyInPandas(dp, out_schema)


def sequence_count(
    events: DataFrame,
    first: str,
    then: str,
    window_seconds: int,
    user_cols: list[str] | None = None,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user count of ``first -> then`` conversions within a window —
    the ClickHouse ``sequenceCount('(?1)(?2)')`` two-step shape, defined
    set-wise so SQL can mirror it: the number of ``then`` events that
    have at least one ``first`` event strictly before them and within
    ``window_seconds``.

    Pure built-in expressions: per-user sorted merge is expressed as a
    range join of ``then`` events against the per-user latest eligible
    ``first`` event via a window function — no Python, one shuffle.
    """
    user_cols = user_cols or ["user_id"]
    from pyspark.sql.window import Window

    # Integer microseconds make "strictly earlier" exact: a rangeBetween
    # upper bound of -1 us excludes ties, where a rowsBetween(-1) frame
    # would include or exclude an equal-ts `first` depending on tie order
    # (and masking the max would lose a strictly-earlier `first`).
    slim = events.filter(F.col(type_col).isin([first, then])).select(
        *user_cols,
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.col(type_col).alias("_tp"),
    )
    w = (
        Window.partitionBy(*user_cols)
        .orderBy("_us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    last_first = F.max(F.when(F.col("_tp") == first, F.col("_us"))).over(w)
    window_us = int(window_seconds) * 1_000_000
    conv = (
        slim.withColumn("_lf", last_first)
        .filter(
            (F.col("_tp") == then)
            & F.col("_lf").isNotNull()
            & (F.col("_us") - F.col("_lf") <= F.lit(window_us))
        )
        .groupBy(*user_cols)
        .agg(F.count(F.lit(1)).alias("n_conversions"))
    )
    return conv
