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

Plan shape: filter to step events (scan-side, pushed down) -> ONE hash
shuffle + ONE sort on (user, ts) -> L-1 cascaded window functions over
the SAME window spec (Spark computes them in a single pass over the
sorted partition) -> per-user aggregate. Everything stays JVM-side; no
Python, no per-group overhead. State per (user, level) is one running
max, so a 100 TB event log funnels with shuffle volume = step events
only.

The recurrence (a DP over events in time order) keeps, per level i, the
**latest** chain-start timestamp among chains reaching level i using
only strictly-earlier events:

    prev_s[0](e) = max ts of step-1 events strictly before e
    start[i](e)  = prev_s[i-1](e)   if e is a step-(i+1) event and
                                       ts(e) - prev_s[i-1](e) <= window
    prev_s[i](e) = max start[i] over events strictly before e

Exchange argument for correctness: a later chain-start can extend in
every case an earlier one can (the window constraint ``t - start <=
window`` only loosens as start grows; event-order feasibility is given
by the strictly-earlier window frame). So "exists a chain to level i+1"
== "start[i] is non-null somewhere", and ``rangeBetween(unbounded, -1)``
over integer microseconds makes "strictly earlier" exact — ties never
chain, independent of tie order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    from pyspark.sql.window import Window

    step_idx = F.when(F.col(type_col) == steps[0], 0)
    for i, s in enumerate(steps[1:], start=1):
        step_idx = step_idx.when(F.col(type_col) == s, i)

    # Scan-side reduction: only step events reach the shuffle.
    slim = events.filter(F.col(type_col).isin(list(steps))).select(
        *user_cols,
        F.unix_micros(F.col(ts_col)).alias("_us"),
        step_idx.cast("int").alias("_step"),
    )

    n_steps = len(steps)
    window_us = int(window_seconds) * 1_000_000
    strictly_before = (
        Window.partitionBy(*user_cols)
        .orderBy("_us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )

    # prev_s[i-1] -> start[i] cascade; every window shares one spec, so
    # the physical plan is a single Exchange + Sort + one Window node.
    out = slim
    prev = F.max(F.when(F.col("_step") == 0, F.col("_us"))).over(strictly_before)
    level_flags = [F.max((F.col("_step") == 0).cast("int")).alias("_l1")]
    for i in range(1, n_steps):
        out = out.withColumn(f"_p{i - 1}", prev)
        start_i = F.when(
            (F.col("_step") == i)
            & F.col(f"_p{i - 1}").isNotNull()
            & (F.col("_us") - F.col(f"_p{i - 1}") <= window_us),
            F.col(f"_p{i - 1}"),
        )
        out = out.withColumn(f"_s{i}", start_i)
        prev = F.max(F.col(f"_s{i}")).over(strictly_before)
        level_flags.append(
            F.max(F.col(f"_s{i}").isNotNull().cast("int")).alias(f"_l{i + 1}")
        )

    per_user = out.groupBy(*user_cols).agg(*level_flags)
    level = F.lit(0)
    for i in range(1, n_steps + 1):
        level = F.when(F.col(f"_l{i}") == 1, i).otherwise(level)
    return per_user.select(
        *user_cols, level.cast("long").alias("funnel_level")
    )


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


def retention(
    events: DataFrame,
    conds: list,
    user_cols: list[str] | None = None,
) -> DataFrame:
    """ClickHouse ``retention(cond1, cond2, ...)`` analogue.

    Per user, emits ``r1..rN`` 0/1 flags: ``r1`` = cond1 held on some
    event; ``r{i}`` (i>1) = cond1 AND cond_i each held on some event
    (ClickHouse's exact contract — every later flag is gated on the
    first/anchor condition only, with no time-ordering requirement).
    ``conds`` are boolean Columns over the event row.

    Plan: a single hash aggregation with map-side combine — each
    condition folds to a per-user max(0/1) in one pass; shuffle rows
    carry N small ints per user. No window, no join; at 100 TB this is
    as cheap as a group-by count.
    """
    user_cols = user_cols or ["user_id"]
    aggs = [
        F.max(F.when(c, F.lit(1)).otherwise(F.lit(0))).alias(f"_c{i}")
        for i, c in enumerate(conds)
    ]
    g = events.groupBy(*user_cols).agg(*aggs)
    out = [F.col("_c0").alias("r1")] + [
        (F.col("_c0") * F.col(f"_c{i}")).cast("int").alias(f"r{i + 1}")
        for i in range(1, len(conds))
    ]
    return g.select(*user_cols, *out)


def sequence_match(
    events: DataFrame,
    steps: list[str],
    user_cols: list[str] | None = None,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2)...')`` analogue: per user,
    did events of the given types occur in order (strictly increasing
    timestamps, any events in between)?

    Defined as window_funnel with an effectively unbounded window, so
    it inherits the funnel's one-shuffle cascaded-window plan and its
    exact tie semantics (equal timestamps never chain). Returns
    ``user_cols + [matched]`` for every user with >=1 step event.
    """
    # ~136 years in seconds; * 1e6 us stays far inside int64.
    unbounded = 1 << 32
    lv = window_funnel(
        events, steps, unbounded, user_cols=user_cols, ts_col=ts_col,
        type_col=type_col,
    )
    return lv.select(
        *(user_cols or ["user_id"]),
        (F.col("funnel_level") >= len(steps)).alias("matched"),
    )


def sequence_next_node(
    events: DataFrame,
    base_steps: list[str],
    user_cols: list[str] | None = None,
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """ClickHouse ``sequenceNextNode`` (head/first_match flavor):
    per user, the event type that directly FOLLOWS the first
    occurrence of the exact consecutive chain ``base_steps`` in the
    user's time-ordered event sequence; users whose chain is never
    followed by anything (or never matched) are absent.

    "Consecutive" means adjacent in the user's event sequence (no other
    events in between) — stricter than window_funnel's "exists a
    chain". Implemented with lag() stacks over one (user, ts, tiebreak)
    sort: event at position i matches if the k-th lag's type equals
    base_steps[-1-k] for every k. The follower is then the matching
    position's OWN type where the match anchors at lag(1).

    One shuffle+sort; L-1 lag columns evaluate in a single window pass.
    """
    user_cols = user_cols or ["user_id"]
    from pyspark.sql.window import Window

    L = len(base_steps)
    if L == 0:
        raise ValueError("base_steps must be non-empty")
    w = Window.partitionBy(*user_cols).orderBy(
        F.unix_micros(F.col(ts_col)), tiebreak_col
    )
    # chain of length L ends at lag 1 .. lag L relative to the follower row
    cond = F.lit(True)
    for k in range(1, L + 1):
        cond = cond & (
            F.lag(F.col(type_col), k).over(w) == base_steps[L - k]
        )
    matched = (
        events.withColumn("_is_next", cond)
        .filter(F.col("_is_next"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*user_cols).orderBy(
                    F.unix_micros(F.col(ts_col)), tiebreak_col
                )
            ),
        )
        .filter(F.col("_rn") == 1)
    )
    return matched.select(*user_cols, F.col(type_col).alias("next_node"))


def window_funnel_strict_order(
    events: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_cols: list[str] | None = None,
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """ClickHouse ``windowFunnel(..., 'strict_order')``: the step chain
    must be CONSECUTIVE in the user's full event sequence — any other
    event in between interrupts it (vs the default mode's
    "exists a chain" semantics in :func:`window_funnel`).

    Adjacency makes the depth a fixed lag pattern: an event at position
    i closes a depth-d chain iff its d-1 immediate predecessors are
    exactly steps[0..d-2] (in order) and it is steps[d-1], with the
    chain fitting in the time window. depth(i) is computed from L lag
    stacks over ONE (user, ts, tiebreak) sort; the per-user funnel
    level is the max depth. Still one shuffle, one window pass.
    """
    user_cols = user_cols or ["user_id"]
    from pyspark.sql.window import Window

    L = len(steps)
    w = Window.partitionBy(*user_cols).orderBy(
        F.unix_micros(F.col(ts_col)), tiebreak_col
    )
    lag_type = [F.col(type_col)] + [
        F.lag(type_col, k).over(w) for k in range(1, L)
    ]
    lag_us = [F.unix_micros(F.col(ts_col))] + [
        F.lag(F.unix_micros(F.col(ts_col)), k).over(w) for k in range(1, L)
    ]
    window_us = int(window_seconds) * 1_000_000
    # depth d closed at this row: predecessors k=d-1..1 hold steps[d-1-k],
    # current row holds steps[d-1], and the span fits the window
    depth = F.lit(0)
    for d in range(1, L + 1):
        cond = lag_type[0] == steps[d - 1]
        for k in range(1, d):
            cond = cond & (lag_type[k] == steps[d - 1 - k])
        cond = cond & (
            (lag_us[0] - lag_us[d - 1]) <= F.lit(window_us)
        )
        depth = F.when(cond, F.lit(d)).otherwise(depth)
    slim = events.filter(F.col(type_col).isNotNull())
    return (
        slim.withColumn("_depth", depth)
        .groupBy(*user_cols)
        .agg(F.max("_depth").alias("funnel_level"))
    )


def sequence_match_timed(
    events: DataFrame,
    steps: list[str],
    max_gaps_seconds: list[int],
    user_cols: list[str] | None = None,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1)(?t<=g1)(?2)(?t<=g2)(?3)...')``:
    does a strictly-time-ordered chain step1 -> step2 -> ... exist where
    each ADJACENT gap is <= its bound (seconds)?

    Exactness argument for the greedy cascade: for a ``<=`` gap, among
    all feasible completions of steps 1..i strictly before an event, the
    LATEST one minimizes the gap — so if the running max fails the
    bound, every earlier completion fails it too. Hence one running-max
    window per step decides existence exactly. (``?t>=`` gaps would need
    the symmetric running-min and are not part of this operator.)

    Plan: one shuffle+sort on (user, ts); all windows share the frame,
    so the physical plan is a single Exchange + Sort + Window cascade —
    same shape as window_funnel (funnel.py), which mirrors the
    reference-class ClickHouse sequenceMatch implementation note in
    MIGRATION.md. Returns ``user_cols + [matched]``.
    """
    if len(max_gaps_seconds) != len(steps) - 1:
        raise ValueError("need exactly len(steps)-1 gap bounds")
    if len(set(steps)) != len(steps):
        raise ValueError("steps must be distinct event types")
    user_cols = user_cols or ["user_id"]
    from pyspark.sql.window import Window

    step_idx = F.when(F.col(type_col) == steps[0], 0)
    for i, s in enumerate(steps[1:], start=1):
        step_idx = step_idx.when(F.col(type_col) == s, i)

    slim = events.filter(F.col(type_col).isin(list(steps))).select(
        *user_cols,
        F.unix_micros(F.col(ts_col)).alias("_us"),
        step_idx.cast("int").alias("_step"),
    )

    strictly_before = (
        Window.partitionBy(*user_cols)
        .orderBy("_us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )

    out = slim
    # completion time of a 1-chain is the step-0 event's own time
    done = F.when(F.col("_step") == 0, F.col("_us"))
    out = out.withColumn("_d0", done)
    for i in range(1, len(steps)):
        prev = F.max(F.col(f"_d{i - 1}")).over(strictly_before)
        gap_us = int(max_gaps_seconds[i - 1]) * 1_000_000
        out = out.withColumn(f"_p{i}", prev)
        out = out.withColumn(
            f"_d{i}",
            F.when(
                (F.col("_step") == i)
                & F.col(f"_p{i}").isNotNull()
                & (F.col("_us") - F.col(f"_p{i}") <= gap_us),
                F.col("_us"),
            ),
        )
    last = len(steps) - 1
    return out.groupBy(*user_cols).agg(
        F.max(F.col(f"_d{last}").isNotNull()).alias("matched")
    )


def window_funnel_durations(
    events: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_cols: list[str] | None = None,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """``window_funnel`` plus TIME-TO-CONVERT: for fully-converted
    users, ``min_convert_us`` is the exact minimum duration over all
    valid chains (first step -> last step), null below full depth.

    Exactness argument: the cascade propagates, at each final-step
    event time t, the MAX chain anchor among chains completing by t —
    the max anchor gives the min duration ending at t, so the min over
    final-step events of (t − anchor) is the true minimum over ALL
    valid chains (same greedy invariant as window_funnel's depth, see
    its docstring; the q84 oracle states the equivalent declaratively
    as a MIN over the EXISTS-chain join).

    Same plan as window_funnel: one Exchange+Sort, one Window cascade,
    one hash agg — duration adds expressions, not passes.
    """
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    user_cols = user_cols or ["user_id"]
    from pyspark.sql.window import Window

    step_idx = F.when(F.col(type_col) == steps[0], 0)
    for i, s in enumerate(steps[1:], start=1):
        step_idx = step_idx.when(F.col(type_col) == s, i)
    slim = events.filter(F.col(type_col).isin(list(steps))).select(
        *user_cols,
        F.unix_micros(F.col(ts_col)).alias("_us"),
        step_idx.cast("int").alias("_step"),
    )
    n_steps = len(steps)
    window_us = int(window_seconds) * 1_000_000
    strictly_before = (
        Window.partitionBy(*user_cols)
        .orderBy("_us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    out = slim
    prev = F.max(F.when(F.col("_step") == 0, F.col("_us"))).over(
        strictly_before
    )
    level_flags = [F.max((F.col("_step") == 0).cast("int")).alias("_l1")]
    for i in range(1, n_steps):
        out = out.withColumn(f"_p{i - 1}", prev)
        start_i = F.when(
            (F.col("_step") == i)
            & F.col(f"_p{i - 1}").isNotNull()
            & (F.col("_us") - F.col(f"_p{i - 1}") <= window_us),
            F.col(f"_p{i - 1}"),
        )
        out = out.withColumn(f"_s{i}", start_i)
        prev = F.max(F.col(f"_s{i}")).over(strictly_before)
        level_flags.append(
            F.max(F.col(f"_s{i}").isNotNull().cast("int")).alias(
                f"_l{i + 1}"
            )
        )
    final = n_steps - 1
    dur = F.min(
        F.when(
            F.col(f"_s{final}").isNotNull(),
            F.col("_us") - F.col(f"_s{final}"),
        )
    ).alias("_dur")
    per_user = out.groupBy(*user_cols).agg(*level_flags, dur)
    level = F.lit(0)
    for i in range(1, n_steps + 1):
        level = F.when(F.col(f"_l{i}") == 1, i).otherwise(level)
    return per_user.select(
        *user_cols,
        level.cast("long").alias("funnel_level"),
        F.when(F.col(f"_l{n_steps}") == 1, F.col("_dur"))
        .cast("long")
        .alias("min_convert_us"),
    )
