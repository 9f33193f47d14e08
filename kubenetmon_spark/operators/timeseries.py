"""Time-series densification (gap filling).

The reference's fact table simply has no row for a minute with no
traffic (SummingMergeTree stores what arrives — SURVEY.md §2 A1/A2);
dashboards and rate calculations over it need the missing buckets made
explicit. ``densify`` materializes the full (series key x time bucket)
grid and left-joins the observed aggregates onto it.

Scale posture: the grid is built from a ``sequence()`` + ``explode``
over ONE row per series key — generation is O(buckets) and happens
executor-side with no shuffle. The join back to observed buckets is an
equi-join on (key, bucket); the observed side was just aggregated on
exactly that key, so AQE reuses its partitioning, and the grid side is
the small one (broadcast) for any realistic bucket count. Nothing here
touches raw fact rows: densify AFTER aggregation, never before.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bucket_grid(
    keys: DataFrame,
    start_end: DataFrame,
    step: str = "1 hour",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Cross product of ``keys`` rows with every bucket in [start, end].

    ``start_end`` is a 1-row DataFrame with ``start``/``end`` timestamp
    columns (both inclusive, already truncated to the bucket size).
    """
    span = start_end.select(
        F.explode(
            F.sequence("start", "end", F.expr(f"INTERVAL {step}"))
        ).alias(bucket_col)
    )
    return keys.crossJoin(span)


def densify(
    observed: DataFrame,
    keys: DataFrame,
    start_end: DataFrame,
    bucket_col: str,
    fill: dict[str, float | int] | None = None,
    step: str = "1 hour",
) -> DataFrame:
    """Left-join ``observed`` onto the full grid, filling absent buckets.

    ``observed`` must be keyed by (keys' columns + ``bucket_col``) —
    i.e. already aggregated. ``fill`` maps measure columns to the value
    an empty bucket takes (default 0 for every non-key column).
    """
    grid = bucket_grid(keys, start_end, step, bucket_col)
    key_cols = keys.columns + [bucket_col]
    out = grid.join(observed, on=key_cols, how="left")
    measures = fill or {c: 0 for c in observed.columns if c not in key_cols}
    for c, v in measures.items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out


def delta_sum(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    out_col: str = "delta_sum",
) -> DataFrame:
    """ClickHouse ``deltaSum`` analogue: per key, the sum of POSITIVE
    arithmetic differences between consecutive values in time order.
    Negative differences are ignored; the first value contributes
    nothing (it has no predecessor) — both exactly ClickHouse's
    contract (reference's analytics engine surface; the repo itself
    defines only sum() queries, README.md:180-185).

    Determinism: callers pass an integer ``value_col`` (e.g. cents) and
    a unique ``tiebreak_col`` so equal timestamps order identically in
    every engine. Plan shape: ONE hash shuffle + sort on
    (key, ts, tiebreak), a lag() and a sum() computed in the same
    window pass — all JVM-side, whole-stage codegen. At 100 TB the
    shuffle carries only (key, ts, tiebreak, value) — project before
    calling.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    d = F.col(value_col) - F.lag(value_col).over(w)
    return (
        df.withColumn("_d", F.when(d > 0, d))
        .groupBy(*key_cols)
        .agg(F.coalesce(F.sum("_d"), F.lit(0)).alias(out_col))
    )


def lttb_downsample(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    n_buckets: int,
    tiebreak_col: str,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (ClickHouse
    ``largestTriangleThreeBuckets``), parallel variant.

    Per series key, splits the time-ordered points into ``n_buckets``
    equal-count buckets (first and last point are their own buckets,
    as in the classic algorithm) and keeps, from each middle bucket,
    the point forming the largest triangle with the NEIGHBOR BUCKET
    AVERAGES. Classic LTTB anchors on the previously *selected* point,
    which is inherently sequential; anchoring both sides on bucket
    averages (the same approximation LTTB already uses for the right
    anchor) makes every bucket independent — embarrassingly parallel,
    deterministic, and visually near-identical. Documented deviation.

    Exactness: ``ts_col``/``value_col`` must be integers (epoch
    seconds / cents). The doubled triangle area against average
    anchors is compared after multiplying through by the two bucket
    counts, so the argmax is over exact int64 cross products — no
    float division anywhere, same winner in any engine. Overflow
    bound: |area2 * n_prev * n_next| <= (n*span_t) * (n*span_v) * 2;
    keep bucket_count * value-range products under ~1e18.

    Plan: one shuffle+sort for row_number, per-bucket partial sums
    (map-side combined), a lag/lead over the tiny bucket-level frame,
    one co-partitioned join back, and a max_by per bucket. Shuffle
    volume beyond the first sort is O(keys * buckets), not O(rows).

    Returns ``key_cols + [bucket, ts, value, tiebreak]`` — the kept
    points, ≤ n_buckets per key.
    """
    if n_buckets < 3:
        raise ValueError("n_buckets must be >= 3")
    wk = Window.partitionBy(*key_cols).orderBy("_t", "_tb")
    wn = Window.partitionBy(*key_cols)
    pts = df.select(
        *key_cols,
        F.col(ts_col).cast("long").alias("_t"),
        F.col(value_col).cast("long").alias("_v"),
        F.col(tiebreak_col).alias("_tb"),
    ).withColumn("_rn", F.row_number().over(wk)).withColumn(
        "_n", F.count(F.lit(1)).over(wn)
    )
    # bucket 0 = first point, bucket n_buckets-1 = last point, middles
    # spread evenly by rank (count-equal buckets, the LTTB convention).
    pts = pts.withColumn(
        "_b",
        F.when(F.col("_rn") == 1, F.lit(0))
        .when(F.col("_rn") == F.col("_n"), F.lit(n_buckets - 1))
        .otherwise(
            F.floor(
                ((F.col("_rn") - 2) * (n_buckets - 2))
                / F.greatest(F.col("_n") - 2, F.lit(1))
            )
            + 1
        ),
    )
    sums = pts.groupBy(*key_cols, "_b").agg(
        F.sum("_t").alias("_st"),
        F.sum("_v").alias("_sv"),
        F.count(F.lit(1)).alias("_c"),
    )
    wb = Window.partitionBy(*key_cols).orderBy("_b")
    anchors = sums.select(
        *key_cols,
        "_b",
        F.lag("_st").over(wb).alias("_pt"),
        F.lag("_sv").over(wb).alias("_pv"),
        F.lag("_c").over(wb).alias("_pc"),
        F.lead("_st").over(wb).alias("_nt"),
        F.lead("_sv").over(wb).alias("_nv"),
        F.lead("_c").over(wb).alias("_nc"),
    )
    mid = pts.filter((F.col("_b") > 0) & (F.col("_b") < n_buckets - 1)).join(
        anchors, on=[*key_cols, "_b"]
    )
    # area2 * pc * nc = (sum_pt - pc*t)*(sum_nv - nc*v) - (sum_nt - nc*t)*(sum_pv - pc*v)
    #
    # DECIMAL(38,0), not BIGINT: each factor is bucket_count x
    # coordinate-spread; with epoch-seconds t and 100 TB bucket counts
    # the cross product overflows int64 (found by the sf1 scaling run).
    # Decimal keeps the argmax exact — the oracle mirrors with HUGEINT.
    def _d(c):
        return c.cast("decimal(20,0)")

    a2 = F.abs(
        (_d(F.col("_pt")) - _d(F.col("_pc")) * _d(F.col("_t")))
        * (_d(F.col("_nv")) - _d(F.col("_nc")) * _d(F.col("_v")))
        - (_d(F.col("_nt")) - _d(F.col("_nc")) * _d(F.col("_t")))
        * (_d(F.col("_pv")) - _d(F.col("_pc")) * _d(F.col("_v")))
    )
    picked = (
        mid.withColumn("_a2", a2)
        .groupBy(*key_cols, "_b")
        .agg(
            F.max_by(
                F.struct("_t", "_v", "_tb"),
                # max area; ties -> earliest point, exactly and portably
                F.struct(F.col("_a2"), (-F.col("_rn")).alias("_neg")),
            ).alias("_p")
        )
        .select(*key_cols, "_b", "_p._t", "_p._v", "_p._tb")
    )
    ends = pts.filter(
        (F.col("_b") == 0) | (F.col("_b") == n_buckets - 1)
    ).select(*key_cols, "_b", "_t", "_v", "_tb")
    return (
        picked.unionByName(ends)
        .select(
            *key_cols,
            F.col("_b").alias("bucket"),
            F.col("_t").alias(ts_col),
            F.col("_v").alias(value_col),
            F.col("_tb").alias(tiebreak_col),
        )
    )


def interval_union_length(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    tiebreak_col: str,
    out_col: str = "union_len",
) -> DataFrame:
    """ClickHouse ``intervalLengthSum``: per key, the total length of
    the UNION of [start, end) intervals — overlaps counted once.

    Classic sweep as window algebra: sort intervals by start, carry the
    running max of previous ends; each interval contributes
    max(0, end - max(start, running_prev_end)). Summing those
    contributions equals the union length (every covered point is
    counted exactly by the first interval that covers it). Integer
    endpoints -> exact in any engine; one shuffle+sort per key, the
    lag-style running max and the final sum share the partitioning.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(start_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(end_col).over(w)
    contrib = F.greatest(
        F.lit(0),
        F.col(end_col) - F.greatest(F.col(start_col), F.coalesce(prev_end, F.col(start_col))),
    )
    return (
        df.withColumn("_c", contrib)
        .groupBy(*key_cols)
        .agg(F.sum("_c").cast("long").alias(out_col))
    )


def max_intersections(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """ClickHouse ``maxIntersections`` / ``maxIntersectionsPosition``:
    per key, the maximum number of [start, end) intervals covering any
    single point, and the smallest such point.

    Sweep line as window algebra: each interval emits (+1 at start,
    -1 at end); the running sum ordered by (point, delta) — closes
    before opens at the same point, the half-open convention — is the
    coverage depth just after each point. Integer points and depths,
    so any engine agrees exactly. One shuffle+sort per key; the final
    argmin-of-argmax is a plain hash agg over the swept rows.
    """
    pts = df.select(
        *key_cols,
        F.explode(
            F.array(
                F.struct(
                    F.col(start_col).cast("long").alias("p"),
                    F.lit(1).alias("d"),
                ),
                F.struct(
                    F.col(end_col).cast("long").alias("p"),
                    F.lit(-1).alias("d"),
                ),
            )
        ).alias("_e"),
        F.col(tiebreak_col).alias("_tb"),
    ).select(*key_cols, F.col("_e.p").alias("_p"), F.col("_e.d").alias("_d"), "_tb")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_p", "_d", "_tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    depth = pts.withColumn("_depth", F.sum("_d").over(w)).withColumn(
        "_gmax", F.max("_depth").over(Window.partitionBy(*key_cols))
    )
    return depth.groupBy(*key_cols).agg(
        F.max("_depth").cast("long").alias("max_intersections"),
        F.min(F.when(F.col("_depth") == F.col("_gmax"), F.col("_p")))
        .cast("long")
        .alias("position"),
    )


def _floor_div(num, den):
    """Exact floor(num/den) for integer columns with |num| < 2^52:
    the double quotient of two exactly-representable integers can only
    cross a floor boundary if the true remainder is 0, and an exact
    multiple divides exactly in IEEE 754. Floor semantics (toward -inf)
    — NOT Spark's `div`, which truncates toward zero for negatives and
    would disagree with SQL engines' `//` on every negative detrended
    value."""
    return F.floor(num.cast("double") / den).cast("long")


def interpolate_linear(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    out_col: str = "y_filled",
) -> DataFrame:
    """Linear gap interpolation over a numeric axis — the missing third
    of ClickHouse's ``ORDER BY ... WITH FILL`` family (STEP = densify,
    carry-forward = arrayFillForward idiom, INTERPOLATE = this): null
    ``y_col`` rows get ``prev + floor((next-prev)*(x-px)/(nx-px))``
    between their nearest non-null anchors; anchors pass through;
    leading/trailing nulls (no anchor on one side) stay null.

    Exact-integer contract: y values are integers and the floor-div
    uses the same IEEE-exact double quotient as ``_floor_div`` (|num| <
    2^52), so results hash-match any SQL engine. One shuffle + one sort
    per key: both window passes share the (key, x) sort order, Catalyst
    runs them over a single exchange.
    """
    anchor = F.when(
        F.col(y_col).isNotNull(),
        F.struct(F.col(x_col).cast("long").alias("x"), F.col(y_col).cast("long").alias("y")),
    )
    wprev = (
        Window.partitionBy(*key_cols)
        .orderBy(x_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wnext = (
        Window.partitionBy(*key_cols)
        .orderBy(x_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    p = F.last(anchor, ignorenulls=True).over(wprev)
    n = F.first(anchor, ignorenulls=True).over(wnext)
    filled = (
        F.when(F.col(y_col).isNotNull(), F.col(y_col).cast("long"))
        .when(
            p.isNotNull() & n.isNotNull() & (n["x"] != p["x"]),
            p["y"]
            + _floor_div(
                (n["y"] - p["y"]) * (F.col(x_col).cast("long") - p["x"]),
                n["x"] - p["x"],
            ),
        )
    )
    return df.withColumn(out_col, filled)


def seasonal_decompose(
    df: DataFrame,
    group_cols: list[str],
    ord_col: str,
    value_col: str,
    period: int,
) -> DataFrame:
    """Classical additive seasonal-trend decomposition (the moving-
    average method inside every STL-family tool; ClickHouse ships it as
    ``seriesDecomposeSTL``). Rows are consecutive series steps per
    group, ordered by ``ord_col``.

    Adds: ``idx`` (0-based step), ``phase`` (= idx % period),
    ``trend_num`` (trend scaled by ``trend_den`` = period for odd
    periods, 2*period for even — the standard 2xP centered MA), and
    ``detr_num`` (= trend_den * x − trend_num, the detrended value at
    the same scale). Scaled INTEGER arithmetic throughout — no float
    sum-order hazard; boundary rows without a full window get NULL
    trend/detrended, exactly like R's ``decompose``.

    Scale: every window shares the one (group, ord) sort — a single
    Exchange+Sort pass; no joins, no driver state. Decompose AFTER
    bucket aggregation (series steps, not raw facts), so volume is
    #groups x #steps.
    """
    if period < 2:
        raise ValueError("period must be >= 2")
    w = Window.partitionBy(*group_cols).orderBy(ord_col)
    half = period // 2
    span = w.rowsBetween(-half, half)
    x = F.col(value_col)
    out = df.withColumn("idx", F.row_number().over(w) - 1)
    if period % 2 == 1:
        trend_den = period
        full = period
        tnum = F.sum(x).over(span)
    else:
        trend_den = 2 * period
        full = period + 1
        tnum = (
            2 * F.sum(x).over(span)
            - F.lag(x, half).over(w)
            - F.lead(x, half).over(w)
        )
    defined = F.count(x).over(span) == full
    out = out.withColumn("trend_num", F.when(defined, tnum))
    return (
        out.withColumn("phase", F.col("idx") % period)
        .withColumn(
            "detr_num",
            F.when(defined, F.lit(trend_den) * x - F.col("trend_num")),
        )
        .withColumn("trend_den", F.lit(trend_den))
    )


def seasonal_profile(
    df: DataFrame,
    group_cols: list[str],
    ord_col: str,
    value_col: str,
    period: int,
) -> DataFrame:
    """Per-phase seasonal component from ``seasonal_decompose``:
    one row per (group, phase) with ``n`` contributing steps, the exact
    integer ``s_detr`` (sum of scaled detrended values), and
    ``seasonal_milli`` = floor(mean detrended * 1000) — the additive
    seasonal index in milli-units. Second (tiny) shuffle: one row per
    group x phase."""
    d = seasonal_decompose(df, group_cols, ord_col, value_col, period)
    den = 2 * period if period % 2 == 0 else period
    return (
        d.filter(F.col("detr_num").isNotNull())
        .groupBy(*group_cols, "phase")
        .agg(
            F.count("*").alias("n"),
            F.sum("detr_num").alias("s_detr"),
        )
        .withColumn(
            "seasonal_milli",
            _floor_div(F.col("s_detr") * 1000, F.col("n") * den),
        )
    )


def detect_period(
    df: DataFrame,
    group_cols: list[str],
    ord_col: str,
    value_col: str,
    min_lag: int = 2,
    max_lag: int = 36,
) -> DataFrame:
    """Dominant-period detection per series (ClickHouse
    ``seriesPeriodDetectFFT``'s job) via the raw autocovariance argmax
    — O(n * n_lags) exact integer work instead of a float FFT, so the
    verdict is reproducible bit-for-bit on any engine/partitioning.

    Values are mean-centered in scaled integers (y = n*x − sum, i.e.
    centered then scaled by n — scale does not move an argmax), then
    for each lag L in [min_lag, max_lag] the autocovariance
    ``sum(y_t * y_{t+L})`` is taken over all available pairs; the
    winning lag (ties → smallest L) is returned per group with its
    score and pair count.

    Overflow contract: |y| <= n * max|x|; the product sum needs
    (n*max|x|)^2 * n < 2^63 — holds for series up to ~100k steps of
    counts; for larger magnitudes pre-scale value_col down.

    Scale: one (group, ord) sort to index; the lag join is an
    equi-join on (group, idx+L) after an explode of the ~35 lags —
    shuffle volume = n_rows * n_lags, partitioned on the natural key;
    the per-(group, lag) aggregation and argmax are tiny.
    """
    if not (1 <= min_lag <= max_lag):
        raise ValueError("need 1 <= min_lag <= max_lag")
    w = Window.partitionBy(*group_cols)
    wo = w.orderBy(ord_col)
    x = F.col(value_col)
    s = (
        df.withColumn("_idx", F.row_number().over(wo) - 1)
        .withColumn("_n", F.count(x).over(w))
        .withColumn("_s", F.sum(x).over(w))
        .select(
            *group_cols,
            "_idx",
            (F.col("_n") * x - F.col("_s")).alias("_y"),
        )
    )
    lags = s.withColumn(
        "_lag", F.explode(F.sequence(F.lit(min_lag), F.lit(max_lag)))
    ).withColumn("_tgt", F.col("_idx") + F.col("_lag"))
    right = s.select(
        *[F.col(c).alias(f"_r_{c}") for c in group_cols],
        F.col("_idx").alias("_r_idx"),
        F.col("_y").alias("_r_y"),
    )
    cond = [lags[c] == right[f"_r_{c}"] for c in group_cols] + [
        lags["_tgt"] == right["_r_idx"]
    ]
    per_lag = (
        lags.join(right, cond)
        .groupBy(*group_cols, "_lag")
        .agg(
            F.sum(F.col("_y") * F.col("_r_y")).alias("_ac"),
            F.count("*").alias("_pairs"),
        )
    )
    best = per_lag.groupBy(*group_cols).agg(
        F.max(
            F.struct(
                F.col("_ac").alias("ac"),
                (-F.col("_lag")).alias("neg_lag"),
                F.col("_pairs").alias("pairs"),
            )
        ).alias("_b")
    )
    return best.select(
        *group_cols,
        (-F.col("_b.neg_lag")).cast("long").alias("best_lag"),
        F.col("_b.ac").alias("autocov"),
        F.col("_b.pairs").alias("n_pairs"),
    )


def seasonal_forecast(
    df: DataFrame,
    group_cols: list[str],
    ord_col: str,
    value_col: str,
    period: int,
    horizon: int,
) -> DataFrame:
    """Seasonal-naive forecast on top of ``seasonal_decompose``:
    ŷ(T+h) = last defined trend + seasonal index of the target phase —
    the standard baseline every fancier forecaster must beat, and the
    capacity-planning shape for the flow table ("what does next
    Tuesday 14:00 look like").

    Emits (group, h, phase, forecast_milli) for h = 1..horizon, in
    exact scaled-integer arithmetic end to end (trend at trend_den
    scale, seasonal in milli-units, floor division only at the final
    milli rescale).

    Scale: decompose's one sort + two tiny aggregations (last-trend
    argmax and the phase profile are #groups(+x period) rows); the
    horizon explode is driver-free and adds horizon rows per group.
    """
    d = seasonal_decompose(df, group_cols, ord_col, value_col, period)
    den = 2 * period if period % 2 == 0 else period
    last = d.groupBy(*group_cols).agg(
        F.max("idx").alias("last_idx"),
        F.max_by(
            "trend_num", F.when(F.col("trend_num").isNotNull(), F.col("idx"))
        ).alias("last_trend"),
    )
    prof = (
        d.filter(F.col("detr_num").isNotNull())
        .groupBy(*group_cols, "phase")
        .agg(F.count("*").alias("n"), F.sum("detr_num").alias("s_detr"))
    )
    fc = last.withColumn(
        "h", F.explode(F.sequence(F.lit(1), F.lit(horizon)))
    ).withColumn("phase", (F.col("last_idx") + F.col("h")) % period)
    out = fc.join(prof, [*group_cols, "phase"], "left")
    return out.select(
        *group_cols,
        "h",
        "phase",
        (
            _floor_div(F.col("last_trend") * 1000, F.lit(den))
            + F.coalesce(
                _floor_div(F.col("s_detr") * 1000, F.col("n") * den),
                F.lit(0),
            )
        ).alias("forecast_milli"),
    )


def seasonal_anomalies(
    df: DataFrame,
    group_cols: list[str],
    ord_col: str,
    value_col: str,
    period: int,
    k_tenths: int = 30,
) -> DataFrame:
    """Seasonally-adjusted anomaly detection: a step is anomalous when
    its residual (value − trend − seasonal index) exceeds k standard
    deviations of the group's residuals — the "traffic at 3am looks
    like 3pm" alarm a metering pipeline wants, with the daily shape
    removed first so peak hours don't false-positive.

    EXACT integer decision rule: with residuals r_i in trend_den scale
    and σ² = Σr²/n, the test |r| > (k/10)·σ squares and
    cross-multiplies once to
        100 · r² · n  >  k² · Σr²
    (k in tenths), so no square roots and no floats ever happen; ties
    (=) are not anomalous. The residual scale cancels on both sides.

    Overflow contract: |r| ≤ trend_den·max|x|; 100·n·r²_max < 2^63
    holds for counts series up to ~1e5 steps — pre-scale larger
    magnitudes.

    Returns per-step rows with ``resid_num`` (residual at trend_den
    scale; the phase mean is floor-divided once) and ``is_anomaly``;
    boundary steps without a defined trend are excluded (no residual
    exists there).
    """
    d = seasonal_decompose(df, group_cols, ord_col, value_col, period)
    den = 2 * period if period % 2 == 0 else period
    prof = (
        d.filter(F.col("detr_num").isNotNull())
        .groupBy(*group_cols, "phase")
        .agg(
            F.count("*").alias("_np"),
            F.sum("detr_num").alias("_sd"),
        )
    )
    r = (
        d.filter(F.col("detr_num").isNotNull())
        .join(prof, [*group_cols, "phase"])
        .withColumn(
            "resid_num",
            F.col("detr_num")
            - _floor_div(F.col("_sd"), F.col("_np")),
        )
    )
    w = Window.partitionBy(*group_cols)
    r = r.withColumn(
        "_n", F.count("*").over(w)
    ).withColumn("_ss", F.sum(F.col("resid_num") * F.col("resid_num")).over(w))
    return r.withColumn(
        "is_anomaly",
        100 * F.col("resid_num") * F.col("resid_num") * F.col("_n")
        > F.lit(k_tenths * k_tenths) * F.col("_ss"),
    ).select(
        *group_cols, "idx", "phase", F.col(value_col), "resid_num",
        "is_anomaly",
    )


def cusum_changepoint(
    series: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Single changepoint per series by the classic CUSUM argmax, in
    EXACT integer arithmetic (the q195 idiom: multiply deviations
    through by n so no mean division ever happens): with per-series
    total T over n points, the cumulative deviation at step i is

        S_i = n * sum(x_1..x_i) - i * T        (integers throughout)

    and the changepoint is the order position maximizing ``|S_i|``
    (ties -> earliest). Returns one row per series:
    ``(series, cp_idx, cp_<order_col>, max_abs_dev, n_points)`` where
    ``max_abs_dev`` carries the ×n scale (divide by n² for the
    mean-shift units; kept integer for engine-exact comparison).

    Scale posture: one fact-scale aggregation builds the series table;
    every window after it runs over #series × #steps rows sharing one
    (series, order) sort — the q195/q203 plan family. Detection is
    offline/batch; the streaming path feeds the same series table via
    the minute rollup.
    """
    w = Window.partitionBy(series_col).orderBy(order_col)
    wall = Window.partitionBy(series_col)
    s = (
        series.withColumn("_cum", F.sum(value_col).over(w))
        .withColumn("_idx", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wall))
        .withColumn("_t", F.sum(value_col).over(wall))
        .withColumn(
            "_dev",
            F.abs(
                F.col("_n").cast("decimal(38,0)") * F.col("_cum")
                - F.col("_idx").cast("decimal(38,0)") * F.col("_t")
            ),
        )
    )
    return (
        s.groupBy(series_col)
        .agg(
            F.max_by(
                F.col("_idx"), F.struct(F.col("_dev"), -F.col("_idx"))
            ).alias("cp_idx"),
            F.max_by(
                F.col(order_col), F.struct(F.col("_dev"), -F.col("_idx"))
            ).alias(f"cp_{order_col}"),
            F.max("_dev").cast("decimal(38,0)").alias("max_abs_dev"),
            F.max("_n").alias("n_points"),
        )
        .orderBy(series_col)
    )


def time_decayed_sum(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    tau_s: int,
) -> DataFrame:
    """ClickHouse ``exponentialTimeDecayedSum`` analogue, engine-exact:
    decay depends on WALL TIME elapsed between events (unlike the
    row-order EMA of ``q90``), realized as one floor-halving per full
    ``tau_s`` seconds elapsed:

        S_i = (S_{i-1} >> min((t_i - t_{i-1}) div tau, 63)) + x_i

    Integer shifts everywhere — no transcendental decay factor, so the
    result is bit-identical across engines (the q90 floor-fold idiom,
    time-generalized). Shift capped at 63 because Java ``>>`` on longs
    wraps the shift amount at 64 while DuckDB saturates to 0; below 63
    both agree, and 63 halvings of any bounded sum is already 0.

    ``value_col`` must be a NON-NEGATIVE long (arithmetic shift ==
    floor halving only then); callers bound it (the gate uses
    ``pmod(value_cents, 100000)``).

    Scale posture: one shuffle to the group key; per-group arrays are
    micro-batch sized (the q90/q55 ordered-fold family). The fold runs
    in whole-stage codegen via ``aggregate()`` — no Python.
    """
    o = df.select(
        *group_cols,
        F.col(ts_col).cast("long").alias("_t"),
        F.col(tiebreak_col).alias("_tb"),
        F.col(value_col).cast("long").alias("_x"),
    )
    arr = F.array_sort(F.collect_list(F.struct("_t", "_tb", "_x")))
    g = o.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"), arr.alias("_arr")
    )
    tau = F.lit(int(tau_s))

    def step(s, i):
        prev_t = F.element_at(F.col("_arr"), i)["_t"]
        delta = s["_t"] - prev_t
        # exact integer quotient: subtract the remainder first so the
        # double division is over an exact multiple of tau
        q = ((delta - F.pmod(delta, tau)) / tau).cast("long")
        d = F.when(i == 0, F.lit(0)).otherwise(F.least(q, F.lit(63)))
        return F.struct(d.alias("d"), s["_x"].alias("x"))

    steps = F.transform(F.col("_arr"), step)
    dec = F.aggregate(
        F.slice(steps, 2, F.size(steps) - 1),
        F.element_at(steps, 1)["x"],
        # F.shiftright only takes a literal int shift in the Python API;
        # call_function reaches the SQL ShiftRight which takes any expr
        lambda acc, e: F.call_function("shiftright", acc, e["d"]) + e["x"],
    )
    return g.select(
        *group_cols, "n", dec.cast("long").alias("decayed_sum")
    ).orderBy(*group_cols)


def time_decayed_max(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    tau_s: int,
) -> DataFrame:
    """ClickHouse ``exponentialTimeDecayedMax`` analogue — the max twin
    of ``time_decayed_sum`` under the same engine-exact halving decay:

        M_i = max(M_{i-1} >> min((t_i - t_{i-1}) div tau, 63), x_i)

    "What is the peak, where old peaks fade by half per tau elapsed" —
    the alerting read (a spike an hour ago should not mask a smaller
    spike now forever). Same contracts as ``time_decayed_sum``:
    non-negative long values, one shuffle to the group key, codegen
    fold, shift capped at 63.
    """
    o = df.select(
        *group_cols,
        F.col(ts_col).cast("long").alias("_t"),
        F.col(tiebreak_col).alias("_tb"),
        F.col(value_col).cast("long").alias("_x"),
    )
    arr = F.array_sort(F.collect_list(F.struct("_t", "_tb", "_x")))
    g = o.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"), arr.alias("_arr")
    )
    tau = F.lit(int(tau_s))

    def step(s, i):
        prev_t = F.element_at(F.col("_arr"), i)["_t"]
        delta = s["_t"] - prev_t
        q = ((delta - F.pmod(delta, tau)) / tau).cast("long")
        d = F.when(i == 0, F.lit(0)).otherwise(F.least(q, F.lit(63)))
        return F.struct(d.alias("d"), s["_x"].alias("x"))

    steps = F.transform(F.col("_arr"), step)
    dec = F.aggregate(
        F.slice(steps, 2, F.size(steps) - 1),
        F.element_at(steps, 1)["x"],
        lambda acc, e: F.greatest(
            F.call_function("shiftright", acc, e["d"]), e["x"]
        ),
    )
    return g.select(
        *group_cols, "n", dec.cast("long").alias("decayed_max")
    ).orderBy(*group_cols)


def time_decayed_count_avg(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    tau_s: int,
) -> DataFrame:
    """ClickHouse ``exponentialTimeDecayedCount`` + ``...Avg`` analogues,
    completing the exponentialTimeDecayed* family (q291 Sum, q292 Max)
    under the same engine-exact halving decay:

        C_i = (C_{i-1} >> d_i) + 1          (Count: every event weighs 1)
        A_i = S_i * 10000 div C_i           (Avg, in basis points)

    where ``d_i = min((t_i - t_{i-1}) div tau, 63)`` and ``S`` is the
    q291 decayed sum. "How many recent events / what's the recent mean,
    where recency fades by half per tau elapsed" — the rate-vs-volume
    read of the same decay.

    Both folds run over ONE sorted per-group array in ONE aggregation
    (one shuffle total, codegen ``aggregate()``, no Python); same
    contracts as ``time_decayed_sum``: non-negative long values, shift
    capped at 63 (Java wraps long shifts at 64, DuckDB saturates —
    below 63 they agree).
    """
    o = df.select(
        *group_cols,
        F.col(ts_col).cast("long").alias("_t"),
        F.col(tiebreak_col).alias("_tb"),
        F.col(value_col).cast("long").alias("_x"),
    )
    arr = F.array_sort(F.collect_list(F.struct("_t", "_tb", "_x")))
    g = o.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"), arr.alias("_arr")
    )
    tau = F.lit(int(tau_s))

    def step(s, i):
        prev_t = F.element_at(F.col("_arr"), i)["_t"]
        delta = s["_t"] - prev_t
        q = ((delta - F.pmod(delta, tau)) / tau).cast("long")
        d = F.when(i == 0, F.lit(0)).otherwise(F.least(q, F.lit(63)))
        return F.struct(d.alias("d"), s["_x"].alias("x"))

    steps = F.transform(F.col("_arr"), step)
    tail = F.slice(steps, 2, F.size(steps) - 1)
    dsum = F.aggregate(
        tail,
        F.element_at(steps, 1)["x"],
        lambda acc, e: F.call_function("shiftright", acc, e["d"]) + e["x"],
    )
    dcount = F.aggregate(
        tail,
        F.lit(1).cast("long"),
        lambda acc, e: F.call_function("shiftright", acc, e["d"]) + F.lit(1),
    )
    return (
        g.select(
            *group_cols,
            "n",
            dcount.cast("long").alias("decayed_count"),
            dsum.cast("long").alias("decayed_sum"),
        )
        .withColumn(
            "decayed_avg_bp",
            F.expr("(decayed_sum * 10000) div nullif(decayed_count, 0)"),
        )
        .orderBy(*group_cols)
    )


def promql_to_grid(
    samples: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    start_s: int,
    n_buckets: int,
    step_s: int,
    window_s: int,
) -> DataFrame:
    """ClickHouse's ``timeSeries*ToGrid`` family (PromQL evaluation
    semantics re-expressed as one distributed pass): resample-with-
    staleness, ``delta``, ``increase``, ``rate`` and ``irate`` of a
    counter series, evaluated at every grid point ``t_i = start_s +
    i*step_s`` (``i < n_buckets``) over the trailing window
    ``(t_i - window_s, t_i]``.

    Inputs: ``samples`` carries ``key_cols``, an epoch-second BIGINT
    ``ts_col`` UNIQUE per key (pre-aggregate duplicate timestamps), and
    an integer counter ``value_col``. Output per (key, bucket_ts):

    SPARSE GRID (documented deviation from ClickHouse's dense grid):
    a (key, bucket) whose trailing window contains NO sample emits NO
    ROW — the coverage fan-out is sample-driven, so empty buckets are
    never materialized. That is the scale-correct shape (a dense
    n_keys x n_buckets grid over a 100 TB corpus is mostly empty rows)
    and what the streaming upsert (streaming/rates.py) depends on;
    consumers needing the dense grid densify with
    :func:`fill_time_grid` / ``WITH FILL`` (q39) after. Every emitted
    row therefore has ``n_samples >= 1``.

    - ``n_samples`` — samples in the window (>= 1 by the above).
    - ``last_v``   — latest sample value (timeSeriesResampleToGridWithStaleness
      with staleness = window_s).
    - ``delta``    — last - first (gauge delta), NULL when n < 2.
    - ``increase`` — counter increase, reset-adjusted exactly like
      PromQL: (last - first) + sum(prev_v) over in-window consecutive
      sample pairs where the counter dropped. NULL when n < 2.
    - ``rate_bp``  — floor(increase * 10000 / (last_ts - first_ts)).
      Deliberate deviation from PromQL, documented: the rate is exact
      over the OBSERVED span instead of boundary-extrapolated to the
      window, keeping the whole family in exact integer arithmetic
      (hash-matchable against any SQL engine). NULL when n < 2.
    - ``irate_bp`` — floor(pair_increase * 10000 / pair_duration) of
      the LATEST consecutive pair with both endpoints in-window
      (PromQL irate, same reset rule: a drop counts from 0). NULL if
      no such pair.

    Scale posture (the 100 TB question): no range join, no
    per-grid-point scan, and ONE pass over the series. Each sample
    covers the grid points whose window contains it — a bounded
    ``sequence()`` explode of exactly ceil(window_s/step_s) grid
    indices per row — and each consecutive pair likewise; BOTH
    coverage fan-outs are emitted from the same post-lag row (one
    array concat, one explode), so the plan is: one scan, one
    key-partitioned sort for the lag window, one (key, bucket)
    hash-agg with conditional aggregates. No self-join, no second
    scan, nothing collects to the driver. Cost O(rows * window/step).

    Reference: ClickHouse timeSeriesResampleToGridWithStaleness /
    timeSeriesRateToGrid / timeSeriesDeltaToGrid / timeSeriesInstantRateToGrid;
    kubenetmon dashboards compute exactly these per-pod rates over the
    SummingMergeTree minute rollup (SURVEY.md section 2 A2/A4).
    """
    ts = F.col(ts_col).cast("long")
    v = F.col(value_col).cast("long")
    start = F.lit(int(start_s)).cast("long")
    step = F.lit(int(step_s)).cast("long")
    win = F.lit(int(window_s)).cast("long")
    last_i = F.lit(int(n_buckets) - 1).cast("long")

    def _cover(lo_ts, hi_ts):
        # grid indices i with lo_ts <= t_i <= hi_ts, clamped to the grid
        i_lo = F.greatest(
            F.lit(0).cast("long"),
            _floor_div(lo_ts - start + step - F.lit(1), step),
        )
        i_hi = F.least(last_i, _floor_div(hi_ts - start, step))
        return F.when(i_lo <= i_hi, F.sequence(i_lo, i_hi)).otherwise(
            F.array().cast("array<bigint>")
        )

    # ---- one pass: lag, then emit both coverage fan-outs together ----
    w = Window.partitionBy(*key_cols).orderBy("_ts")
    lagged = (
        samples.select(*key_cols, ts.alias("_ts"), v.alias("_v"))
        .withColumn("_pts", F.lag("_ts").over(w))
        .withColumn("_pv", F.lag("_v").over(w))
    )
    # sample at ts is in window of t iff ts <= t < ts + window;
    # pair (pts, ts) is fully in window iff ts <= t < pts + window
    sample_ev = F.transform(
        _cover(F.col("_ts"), F.col("_ts") + win - F.lit(1)),
        lambda i: F.struct(
            i.alias("_i"),
            F.lit(False).alias("_is_pair"),
            F.col("_ts").alias("_ets"),
            F.col("_v").alias("_ev"),
            F.lit(None).cast("long").alias("_reset_add"),
            F.lit(None).cast("long").alias("_pair_inc"),
            F.lit(None).cast("long").alias("_pair_dur"),
        ),
    )
    pair_ev = F.when(
        F.col("_pts").isNotNull(),
        F.transform(
            _cover(F.col("_ts"), F.col("_pts") + win - F.lit(1)),
            lambda i: F.struct(
                i.alias("_i"),
                F.lit(True).alias("_is_pair"),
                F.col("_ts").alias("_ets"),
                F.lit(None).cast("long").alias("_ev"),
                F.when(F.col("_v") < F.col("_pv"), F.col("_pv"))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("_reset_add"),
                F.when(
                    F.col("_v") >= F.col("_pv"), F.col("_v") - F.col("_pv")
                )
                .otherwise(F.col("_v"))
                .cast("long")
                .alias("_pair_inc"),
                (F.col("_ts") - F.col("_pts")).alias("_pair_dur"),
            ),
        ),
    ).otherwise(F.array().cast(
        "array<struct<_i:bigint,_is_pair:boolean,_ets:bigint,_ev:bigint,"
        "_reset_add:bigint,_pair_inc:bigint,_pair_dur:bigint>>"
    ))
    ev = lagged.select(
        *key_cols,
        F.explode(F.concat(sample_ev, pair_ev)).alias("_e"),
    ).select(*key_cols, "_e.*")

    is_s = ~F.col("_is_pair")
    agg = ev.groupBy(*key_cols, "_i").agg(
        F.sum(F.when(is_s, 1).otherwise(0)).cast("long").alias("n_samples"),
        F.max(F.when(is_s, F.struct("_ets", "_ev"))).alias("_last"),
        F.min(F.when(is_s, F.struct("_ets", "_ev"))).alias("_first"),
        F.coalesce(F.sum("_reset_add"), F.lit(0)).alias("_resets"),
        F.max(
            F.when(
                F.col("_is_pair"),
                F.struct("_ets", "_pair_inc", "_pair_dur"),
            )
        ).alias("_lp"),
    )

    two = F.col("n_samples") >= 2
    inc = F.col("_last._ev") - F.col("_first._ev") + F.col("_resets")
    out = agg.select(
        *key_cols,
        (start + F.col("_i") * step).alias("bucket_ts"),
        "n_samples",
        F.col("_last._ev").alias("last_v"),
        F.when(two, F.col("_last._ev") - F.col("_first._ev")).alias("delta"),
        F.when(two, inc).alias("increase"),
        F.when(
            two,
            _floor_div(
                inc * F.lit(10000),
                F.col("_last._ets") - F.col("_first._ets"),
            ),
        ).alias("rate_bp"),
        _floor_div(
            F.col("_lp._pair_inc") * F.lit(10000), F.col("_lp._pair_dur")
        ).alias("irate_bp"),
    )
    return out
