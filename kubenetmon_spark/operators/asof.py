"""As-of (time-travel) join — match each left row to the most recent
right row at or before its timestamp, per key.

Spark has no native ASOF JOIN; the naive range-join formulation
(``l.ts >= r.ts`` + row_number) explodes to O(|L|·|R|) per key. This
implementation uses the scalable union+window form: one shuffle on the
key, one ordered pass —

1. union both sides with a side tag (right rows sort before left rows at
   equal timestamps, giving inclusive 'at-or-before' semantics);
2. ``last(right_payload, ignorenulls=True)`` over an unbounded-preceding
   window carries the latest right payload forward;
3. keep only left rows.

Cost: one hash shuffle + one sort per key group — the same shape as any
windowed aggregation, skew handled by AQE. Beyond-reference surface
(the reference has no non-equi time join; SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _contains_map(dt) -> bool:
    """True if the type (recursively) contains a MapType — the one
    common type Spark cannot sort by."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    asof_ts_col: str = "asof_ts",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the payload columns of the
    most recent ``right`` row with ``right.ts_col <= left.ts_col`` and equal
    ``on`` keys (null when no prior right row exists).

    ``right_cols`` defaults to every right column not in ``on`` + ts; the
    matched right timestamp is exposed as ``asof_ts_col``.

    ``tolerance_seconds`` (pandas ``merge_asof(tolerance=...)`` /
    ClickHouse dictGet-with-TTL shape): a match older than the bound is
    DISCARDED — the row survives with null payload. Applied as a
    post-window predicate, so the plan shape (one shuffle + one sort)
    is unchanged; for a numeric ``ts_col`` the bound is in the column's
    own units.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(on) | {ts_col}]
    left_payload = set(left.columns) - set(on) - {ts_col}
    clash = (set(right_cols) | {asof_ts_col}) & left_payload
    if clash:
        # Silently emitting two columns with one name poisons every
        # downstream select with AMBIGUOUS_REFERENCE — fail here, where
        # the caller can rename or narrow right_cols.
        raise ValueError(
            f"right_cols/asof_ts_col collide with left columns: {sorted(clash)}"
        )
    payload = F.struct(F.col(ts_col).alias("_ts"), *[F.col(c) for c in right_cols])

    # right rows carry their payload; left rows carry null payload
    r = right.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
    )
    left_only_cols = [c for c in left.columns if c not in set(on) | {ts_col}]
    l = left.select(
        *on,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *left_only_cols,
    )
    r = r.select(
        *on,
        ts_col,
        "_side",
        "_payload",
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_only_cols],
    )
    u = l.unionByName(r)
    # Tiebreak among right rows sharing (on, ts): order by the payload
    # struct itself (nulls first, so left rows keep sorting after right
    # rows at equal ts) whenever the payload is orderable — without it,
    # which duplicate wins depends on partitioning/merge order. A payload
    # containing a map is unorderable; those fall back to the 2-key sort
    # and duplicate (on, ts) right rows resolve arbitrarily there.
    order_keys = [F.col(ts_col).asc(), F.col("_side").asc()]
    if not _contains_map(r.schema["_payload"].dataType):
        order_keys.append(F.col("_payload").asc_nulls_first())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_payload", ignorenulls=True).over(w))
    if tolerance_seconds is not None:
        ts_type = dict(u.dtypes)[ts_col]
        if ts_type.startswith("timestamp"):
            gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(
                F.col("_m._ts")
            )
            bound = int(tolerance_seconds) * 1_000_000
        else:
            gap = F.col(ts_col) - F.col("_m._ts")
            bound = tolerance_seconds
        matched = matched.withColumn(
            "_m", F.when(gap <= bound, F.col("_m"))
        )
    out = matched.filter(F.col("_side") == 1).select(
        *on,
        ts_col,
        *left_only_cols,
        F.col("_m._ts").alias(asof_ts_col),
        *[F.col(f"_m.{c}").alias(c) for c in right_cols],
    )
    return out
