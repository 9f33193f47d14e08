"""Aggregation helpers beyond plain groupBy-sum.

Skew posture: for algebraic aggregates (sum/count/min/max) Spark's partial
(map-side) aggregation already neutralizes heavy-hitter keys. The cases
that DO blow up on hot keys are holistic aggregates — exact distinct
counts, collect_list — where one reducer receives every row of the hot
key. ``two_phase_count_distinct`` is the standard fix: shuffle once on
(key, value) — hot keys spread across reducers by value — then count
per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _join_groups_nullsafe(
    left: DataFrame, right: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Inner join on group keys with ``eqNullSafe`` per key, keeping the
    LEFT side's key columns — ``join(on=[cols])`` uses plain equality,
    which silently drops NULL group keys that the upstream groupBy kept."""
    r = right
    for g in group_cols:
        r = r.withColumnRenamed(g, f"_r_{g}")
    cond = F.lit(True)
    for g in group_cols:
        cond = cond & left[g].eqNullSafe(r[f"_r_{g}"])
    return left.join(r, cond).drop(*[f"_r_{g}" for g in group_cols])


def two_phase_count_distinct(
    df: DataFrame, keys: list[str], value_col: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Exact COUNT(DISTINCT value) GROUP BY keys, skew-safe.

    Phase 1 groups by (keys..., value) — the hot key's rows distribute
    across reducers by value, bounding any single reducer by the key's
    distinct-value count, not its row count. Phase 2 counts the surviving
    rows per key. Identical result to countDistinct, different shuffle
    shape; use when a key can hold a large fraction of all rows.

    NULL handling matches ``groupBy(keys).agg(countDistinct(value))``
    exactly: rows are NOT pre-filtered, so a key whose values are all
    NULL still forms a phase-1 group and emits ``out_col = 0`` (phase 2
    uses ``count(value_col)``, which skips the NULL-value row). A
    pre-filter would silently drop such keys — a lossy difference for
    drop-in swaps. One skew note: a hot key's NULL rows all land on one
    reducer in phase 1 (NULL is a single "value"), same as any other
    single hot value.
    """
    return (
        df.groupBy(*keys, value_col)
        .agg(F.lit(1).alias("_one"))
        .groupBy(*keys)
        .agg(F.count(F.col(value_col)).alias(out_col))
    )


def exact_moments(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    decimals: int = 2,
) -> DataFrame:
    """Order-independent moment sums for 2-decimal measures, as exact
    integers: n, sum (1e2 units), sum of squares (1e4 units), min/max.

    Downstream stats derive in one driver-side step — mean = sum_e2 /
    (100 n), variance = (n*sumsq_e4*1e0 - sum_e2^2) / (1e4 n^2) — but the
    distributed aggregation itself never touches a float, so the result
    is identical under any shuffle/merge order and any engine (the
    ClickHouse-style varSamp/quantile surface, split into its exact
    algebraic core). Plain partial-aggregating shuffle; skew-neutral.
    """
    v = F.col(value_col).cast(f"decimal(18,{decimals})")
    e = 10**decimals
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(v) * e).cast("bigint").alias("sum_e2"),
        (F.sum(v * v) * e * e).cast("bigint").alias("sumsq_e4"),
        (F.min(v) * e).cast("bigint").alias("min_e2"),
        (F.max(v) * e).cast("bigint").alias("max_e2"),
    )


def width_bucket_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    bucket_width_e2: int,
    decimals: int = 2,
) -> DataFrame:
    """Fixed-width histogram over a 2-decimal measure: bucket = value in
    1e2 units // bucket_width_e2 (integer floor — engine-exact), counts
    per (group, bucket). One partial-aggregating shuffle whose key
    cardinality is groups x buckets, independent of row count."""
    v_e2 = (F.col(value_col).cast(f"decimal(18,{decimals})") * (10**decimals)).cast(
        "bigint"
    )
    # floor via pmod + integral div, not floor(double/): a double
    # quotient is only floor-exact below 2^53, and a bare `div`
    # truncates toward zero (wrong bucket for negative values).
    # (v - pmod(v, w)) is exactly divisible by w with pmod always
    # non-negative, so the composite IS the mathematical floor at any
    # int64 magnitude.
    w = int(bucket_width_e2)
    # Collision-proof temp name: withColumn silently REPLACES an existing
    # column, which would corrupt a caller's `_ve2` (and misgroup if it
    # were in group_cols). Uniquify instead of assuming.
    tmp = "_ve2"
    while tmp in df.columns:
        tmp = "_" + tmp
    keyed = df.withColumn(tmp, v_e2)
    return keyed.groupBy(
        *group_cols,
        F.expr(f"(`{tmp}` - pmod(`{tmp}`, {w})) div {w}").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))


def map_aggregate(
    df: DataFrame,
    map_col: str,
    group_cols: list[str],
    how: str = "sum",
    out_col: str | None = None,
) -> DataFrame:
    """ClickHouse ``sumMap`` / ``minMap`` / ``maxMap`` analogue:
    element-wise aggregation of a MapType column's values by key,
    per group. The reference's ``connectionFlags`` is exactly such a
    map column (test/network_flows_0.sql:9); ClickHouse aggregates it
    with the *Map combinators — Spark has no map-merging aggregate, so
    this is the idiomatic two-level composition.

    Result map entries are key-sorted (``map_from_entries`` over
    ``array_sort``), so downstream canonical-JSON serialization is
    deterministic.

    Plan: explode(map_entries) -> groupBy(group+key) with map-side
    combine (the only full shuffle, volume = total map entries) ->
    groupBy(group) collect of the ALREADY-AGGREGATED per-key rows
    (second shuffle carries one row per distinct (group, key) — tiny).
    Both aggregations are hash aggs; nothing leaves the JVM.
    """
    out_col = out_col or f"{how}_map"
    out = map_aggregate_many(df, map_col, group_cols, [how])
    return out.withColumnRenamed(f"{how}_map", out_col)


def map_aggregate_many(
    df: DataFrame,
    map_col: str,
    group_cols: list[str],
    hows: list[str],
) -> DataFrame:
    """Several *Map combinators (e.g. ``minMap`` AND ``maxMap``) from
    ONE explode + two-level hash agg: the per-key aggregation computes
    every requested reduction in the same shuffle, and the regroup
    builds all result maps from the same collected rows. Running
    ``map_aggregate`` N times would cost N explodes, 2N exchanges, and
    N−1 joins; this is always 2 exchanges regardless of len(hows).

    Output columns are named ``{how}_map``, entries key-sorted.
    """
    aggs = {"sum": F.sum, "min": F.min, "max": F.max}
    bad = [h for h in hows if h not in aggs]
    if bad or not hows:
        raise ValueError(f"hows must be non-empty, from {sorted(aggs)}")
    e = df.select(*group_cols, F.explode(map_col).alias("_k", "_v"))
    per_key = e.groupBy(*group_cols, "_k").agg(
        *[aggs[h]("_v").alias(f"_{h}") for h in hows]
    )

    def entries(h):
        return F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("_k").alias("key"), F.col(f"_{h}").alias("value")
                )
            )
        )

    return per_key.groupBy(*group_cols).agg(
        *[F.map_from_entries(entries(h)).alias(f"{h}_map") for h in hows]
    )


def weighted_quantile_exact(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    percents: list[int],
) -> DataFrame:
    """ClickHouse ``quantileExactWeighted`` analogue: per group, for
    each integer percent p, the smallest value whose cumulative weight
    reaches p% of the group's total weight (CH's lower-bound rule).

    Integer-exact: the reach test is ``100*cumw >= p*totw`` — no float
    division, so results are identical in any engine. Values and
    weights must be integers (cents / counts).

    Plan: ONE shuffle+sort on (group, value); the running cumulative
    weight and the full-partition total are two frames over the same
    sort (single Window pass), then a hash agg computes every
    percentile as a conditional min in one pass. Ties in value are
    harmless: any tie-order yields the same selected VALUE.
    """
    from pyspark.sql.window import Window

    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*group_cols)
    c = df.withColumn("_cumw", F.sum(weight_col).over(wcum)).withColumn(
        "_totw", F.sum(weight_col).over(wtot)
    )
    aggs = [
        F.min(
            F.when(
                F.col("_cumw") * 100 >= F.col("_totw") * p, F.col(value_col)
            )
        ).alias(f"p{p}")
        for p in percents
    ]
    return c.groupBy(*group_cols).agg(*aggs)


def bitmap_aggregate(
    df: DataFrame,
    group_cols: list[str],
    set_col: str,
    elem_col: str,
) -> DataFrame:
    """ClickHouse ``groupBitmapAnd`` / ``groupBitmapOr`` /
    ``groupBitmapXor`` cardinalities, per group: each distinct value of
    ``set_col`` defines one bitmap holding its distinct ``elem_col``
    values; the three results are |intersection of all bitmaps|,
    |union|, and |symmetric difference| (elements present in an ODD
    number of bitmaps).

    No roaring bitmaps needed — multiplicity counting is exact and
    distributed: for each element, k = number of distinct sets
    containing it, K = number of sets in the group; then
    AND counts k = K, OR counts all, XOR counts odd k.

    Plan: one distinct-triple agg (the only shuffle proportional to
    data volume), a per-element count agg and a per-group set count agg
    both hash-partitioned on the group key, then a co-partitioned join
    + final agg — every shuffle after the first carries at most one row
    per distinct element or group.
    """
    trip = df.select(*group_cols, set_col, elem_col).distinct()
    per_elem = trip.groupBy(*group_cols, elem_col).agg(
        F.count(F.lit(1)).alias("_k")
    )
    n_sets = trip.groupBy(*group_cols).agg(
        F.count_distinct(F.col(set_col)).alias("_nk")
    )
    # null-SAFE join-back: groupBy keeps a NULL group key, but the plain
    # equi-join would drop it — the NULL group's cardinalities would
    # silently vanish from the result.
    joined = _join_groups_nullsafe(per_elem, n_sets, group_cols)
    return joined.groupBy(*group_cols).agg(
        F.max("_nk").cast("long").alias("n_sets"),
        F.count(F.when(F.col("_k") == F.col("_nk"), 1)).alias("and_card"),
        F.count(F.lit(1)).alias("or_card"),
        F.count(F.when(F.col("_k") % 2 == 1, 1)).alias("xor_card"),
    )


def timing_bucket(value: Column) -> Column:
    """ClickHouse ``quantileTiming`` value mapping: millisecond timings
    are stored exactly below 1024, in width-16 buckets from 1024 to
    30000, and saturate at 30000 above that (negatives clamp to 0).
    Pure integer expression — identical in any engine.

    Reference semantics: ClickHouse QuantileTiming state
    (docs/sql-reference/aggregate-functions/reference/quantiletiming.md:
    'values over 30,000 ms' + the 16 ms precision band).
    """
    v = F.greatest(value.cast("bigint"), F.lit(0))
    return (
        F.when(v < 1024, v)
        .when(v <= 30000, (v - (v % 16)))
        .otherwise(F.lit(30000))
    )


def quantile_timing(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percents: list[int],
) -> DataFrame:
    """``quantileTiming(p)(v)`` per group: the timing-bucket map above,
    then the exact lower-bound weighted quantile over bucket counts.

    Plan: one hash agg shrinks the input to <= ~3000 distinct buckets
    per group BEFORE the quantile's shuffle+sort — at 100 TB the sort
    runs over bucket histograms, not raw rows (the same state-compression
    trick ClickHouse's QuantileTiming struct plays in memory).
    """
    counts = (
        df.select(*group_cols, timing_bucket(F.col(value_col)).alias("_tb"))
        .groupBy(*group_cols, "_tb")
        .agg(F.count(F.lit(1)).alias("_w"))
    )
    out = weighted_quantile_exact(counts, group_cols, "_tb", "_w", percents)
    return out


def group_array_sample(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int,
    salt: str = "s0",
) -> DataFrame:
    """Deterministic ``groupArraySample(k)`` analogue: per group, k
    distinct elements chosen by md5 rank — a uniform-looking but
    REPRODUCIBLE draw (ClickHouse's is seeded-random; a deterministic
    engine wants the same sample on every run and every engine).

    Plan: distinct -> one window rank per group over the hash order ->
    filter rank <= k -> collect sorted. The rank sort runs over
    DISTINCT (group, value) pairs only, so a 100 TB fact table with a
    bounded value domain ranks a bounded set.

    Returns one row per group with ``sample`` (sorted array).
    """
    from pyspark.sql.window import Window

    h = F.md5(F.concat_ws("|", F.col(value_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(*group_cols).orderBy(h, F.col(value_col))
    return (
        # NULL values filtered up front (the ClickHouse aggregate
        # convention): a NULL used to win a rank slot and then vanish
        # from collect_list, silently shrinking the sample below k
        df.select(*group_cols, value_col)
        .filter(F.col(value_col).isNotNull())
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list(value_col)).alias("sample"))
    )


#: lower-eighth .. full block — sparkbar's 8 levels
_SPARK_BLOCKS = "▁▂▃▄▅▆▇█"


def sparkbar(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    width: int = 10,
) -> DataFrame:
    """ClickHouse ``sparkbar(width)(x, y)``: per group, a ``width``-char
    unicode bar chart of y summed over equal x buckets spanning
    [min(x), max(x)].

    Integer-exact rendering convention (pinned; ClickHouse's own
    scaling is float): bucket = ``(x - min_x) * width div span`` clamped
    to width-1; level = ``1 + (y_bucket * 7) div max_y`` (so the max
    bucket is the full block, any positive bucket at least the lowest
    eighth); empty buckets render a space.

    Plan: per-group min/max agg (rows = |groups|) joined back, one
    (group, bucket) sum, one final per-group assembly — the only
    data-volume shuffle is the bucket sum.
    """
    mm = df.groupBy(*group_cols).agg(
        F.min(x_col).alias("_minx"), F.max(x_col).alias("_maxx")
    )
    # null-safe join-back, same reason as bitmap_aggregate: a NULL
    # group key must keep its bar instead of silently dropping
    j = _join_groups_nullsafe(df, mm, group_cols)
    # `div` (true integer division), never float `/`: a double quotient
    # can round across an integer boundary for large values
    bucket = F.expr(
        f"least(cast({width - 1} as bigint),"
        f" (({x_col} - _minx) * {width}) div (_maxx - _minx + 1))"
    )
    sums = (
        j.withColumn("_b", bucket)
        .groupBy(*group_cols, "_b")
        .agg(F.sum(y_col).alias("_y"))
    )
    asm = sums.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_b"), F.col("_y")))
        ).alias("_m")
    )
    chars = F.expr(
        f"transform(sequence(0, {width - 1}), i -> CASE"
        " WHEN element_at(_m, cast(i as bigint)) IS NULL"
        "   OR element_at(_m, cast(i as bigint)) <= 0 THEN ' '"
        " ELSE substring('" + _SPARK_BLOCKS + "',"
        " cast(1 + (element_at(_m, cast(i as bigint)) * 7)"
        " div array_max(map_values(_m)) as int), 1) END)"
    )
    return asm.select(
        *group_cols, F.concat_ws("", chars).alias("sparkbar")
    )


def agg_foreach(
    df: DataFrame,
    group_cols: list[str],
    array_col: str,
    value: Column | None = None,
) -> DataFrame:
    """ClickHouse ``-ForEach`` combinator (``sumForEach``, ``avgForEach``,
    ``countForEach``): aggregate array columns ELEMENT-WISE per group,
    returning arrays of per-position sums/counts (ragged arrays fine —
    each position counts only the rows that reach it, the ClickHouse
    rule).

    ``value`` optionally transforms each element before summing (e.g.
    integer scaling for engine-exact floats); it receives the exploded
    element column.

    Plan: posexplode → ONE shuffle to (group, pos) with map-side partial
    aggregation → per-group fold of at most array-dim rows into the
    result arrays (bounded by the array dimension, never by row count).
    Returns group_cols + ``sums`` (array<long>) + ``counts``
    (array<long>) ordered by position.
    """
    e = df.select(*group_cols, F.posexplode(F.col(array_col)))
    v = F.col("col") if value is None else value
    per = e.groupBy(*group_cols, "pos").agg(
        F.sum(v).alias("_v"), F.count("*").alias("_n")
    )
    packed = F.array_sort(F.collect_list(F.struct("pos", "_v", "_n")))
    return (
        per.groupBy(*group_cols)
        .agg(packed.alias("_p"))
        .select(
            *group_cols,
            F.transform(F.col("_p"), lambda s: s["_v"]).alias("sums"),
            F.transform(F.col("_p"), lambda s: s["_n"]).alias("counts"),
        )
    )


def agg_resample(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    start: int,
    end: int,
    step: int = 1,
) -> DataFrame:
    """ClickHouse's ``-Resample`` aggregate combinator
    (``sumResample(start, end, step)(x, key)``): per group, the
    aggregate is split into ``ceil((end-start)/step)`` buckets by the
    integer resample key (bucket j covers ``start + j*step <= key <
    start + (j+1)*step``; rows outside [start, end) are dropped), and
    the result is ONE ARRAY per group with a 0/0 default for empty
    buckets — exactly how ClickHouse renders missing resample slots.

    Output: group cols + ``sums`` / ``counts`` arrays (bigint,
    position j = bucket j).

    Scale posture: one hash agg on (group, bucket) — map-side partials
    absorb the fan-in, the per-group assembly folds at most
    ceil((end-start)/step) rows (a constant) via map_from_entries +
    a sequence transform; no window, no explode of the grid against
    fact rows.

    Reference: ClickHouse aggregate-combinators#-resample; the
    kubenetmon analogue is per-pod traffic split into size/time bands
    in one pass.
    """
    if step <= 0 or end <= start:
        raise ValueError("need step > 0 and end > start")
    nb = (int(end) - int(start) + int(step) - 1) // int(step)
    # key - start is non-negative after the range filter, so integral
    # `div` IS floor — and stays exact past 2^53 where floor(double/)
    # silently drifts.
    bucket = F.expr(
        f"(CAST({key_col} AS BIGINT) - {int(start)}) div {int(step)}"
    )
    g = (
        df.filter(
            (F.col(key_col) >= F.lit(int(start)))
            & (F.col(key_col) < F.lit(int(end)))
        )
        .groupBy(*group_cols, bucket.alias("_b"))
        .agg(
            F.sum(F.col(value_col).cast("long")).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    m_s = F.map_from_entries(
        F.collect_list(F.struct(F.col("_b"), F.col("_s")))
    )
    m_n = F.map_from_entries(
        F.collect_list(F.struct(F.col("_b"), F.col("_n")))
    )
    idx = F.sequence(F.lit(0).cast("long"), F.lit(nb - 1).cast("long"))
    return g.groupBy(*group_cols).agg(
        m_s.alias("_ms"), m_n.alias("_mn")
    ).select(
        *group_cols,
        F.transform(
            idx, lambda j: F.coalesce(F.element_at(F.col("_ms"), j), F.lit(0))
        ).alias("sums"),
        F.transform(
            idx,
            lambda j: F.coalesce(
                F.element_at(F.col("_mn"), j), F.lit(0).cast("long")
            ),
        ).alias("counts"),
    )
