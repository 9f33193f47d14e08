"""Streaming funnel: the windowFunnel DP as incremental keyed state.

The batch form (`operators/funnel.py`) re-expresses the per-user DP as
cascaded window functions over one sort — ideal when all events are on
disk. A live conversion dashboard instead wants the CURRENT funnel depth
per user updated per micro-batch. The DP state is tiny and mergeable in
arrival order: one "latest chain-start" timestamp per level. That makes
it a textbook ``applyInPandasWithState`` operator:

- state per user = n_steps int64 timestamps (+ last-seen ts + late
  counter): O(levels), watermark-independent, bounded by live users;
- each micro-batch folds its (within-batch sorted) events into the
  state with the identical recurrence the batch operator uses;
- output mode "update": one row per touched user per batch with the
  current ``funnel_level``.

Ordering contract: the DP is exact iff each user's events are processed
in non-decreasing event-time order. Within a batch we sort; ACROSS
batches an event at-or-before the user's high-water ts cannot be folded
retroactively (its chains may already be superseded), so it is counted
in ``n_late`` and skipped — the same drop-don't-reorder stance as the
engine's watermarked aggregations, made observable per key. Equal-ts
events split across batches therefore never chain (batch form: never
chain either — semantics agree).

Timeout policy: ``NoTimeout`` by default; pass ``idle_timeout`` to evict
users idle past a watermark horizon via **event-time** timers (never
processing-time — see streaming/sessions.py's availableNow-hang note).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def streaming_window_funnel(
    events: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_cols: list[str] | None = None,
    ts_col: str = "ts",
    type_col: str = "event_type",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Per-user funnel depth, updated each micro-batch.

    Output rows: ``user_cols + [funnel_level, n_late]`` for every user
    touched by the batch. ``funnel_level``/``n_late`` are cumulative.
    """
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    user_cols = user_cols or ["user_id"]
    n_steps = len(steps)
    window_us = int(window_seconds) * 1_000_000
    step_of = {s: i for i, s in enumerate(steps)}

    slim = events.filter(F.col(type_col).isin(list(steps))).select(
        *user_cols,
        F.col(ts_col).alias("_ts"),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.col(type_col).alias("_tp"),
    )
    if idle_timeout is not None:
        # watermark must ride a timestamp column that is still present
        # at the stateful operator
        slim = slim.withWatermark("_ts", idle_timeout)

    key_fields = [slim.schema[c] for c in user_cols]
    out_schema = StructType(
        key_fields
        + [
            StructField("funnel_level", LongType(), False),
            StructField("n_late", LongType(), False),
        ]
    )
    state_schema = StructType(
        [StructField(f"s{i}", LongType()) for i in range(n_steps)]
        + [StructField("last_us", LongType()), StructField("n_late", LongType())]
    )

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            st = list(state.get)
            seen = [None if v is None or v < 0 else v for v in st[:n_steps]]
            last_us, n_late = st[n_steps] or -1, st[n_steps + 1] or 0
        else:
            seen = [None] * n_steps
            last_us, n_late = -1, 0

        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            pdf = pdf.sort_values("_us", kind="mergesort")
            us = pdf["_us"].to_numpy()
            tp = pdf["_tp"].to_numpy()
            i, n = 0, len(us)
            while i < n:
                t = int(us[i])
                j = i
                while j < n and us[j] == us[i]:
                    j += 1
                if t <= last_us:
                    n_late += j - i
                    i = j
                    continue
                snapshot = list(seen)
                for p in range(i, j):
                    k = step_of[tp[p]]
                    if k == 0:
                        if seen[0] is None or t > seen[0]:
                            seen[0] = t
                    elif (
                        snapshot[k - 1] is not None
                        and t - snapshot[k - 1] <= window_us
                    ):
                        if seen[k] is None or snapshot[k - 1] > seen[k]:
                            seen[k] = snapshot[k - 1]
                last_us = t
                i = j

        if not touched:
            return
        state.update(
            tuple(-1 if v is None else int(v) for v in seen)
            + (int(last_us), int(n_late))
        )
        if idle_timeout is not None:
            state.setTimeoutTimestamp(
                int(
                    (
                        pd.Timestamp(last_us, unit="us") + pd.Timedelta(idle_timeout)
                    ).timestamp()
                    * 1000
                )
            )
        level = 0
        for lvl in range(n_steps, 0, -1):
            if seen[lvl - 1] is not None:
                level = lvl
                break
        yield pd.DataFrame(
            [list(key) + [level, int(n_late)]], columns=list(out_schema.names)
        )

    return slim.groupBy(*user_cols).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
