"""ClickHouse join-strictness analogues.

ClickHouse's ``ANY`` strictness (``ANY LEFT JOIN``) returns at most one
right-side row per left row — Spark joins are always ``ALL`` strictness,
so ANY must be expressed as a deterministic right-side dedup BEFORE the
join. That composition is also the scale-correct plan: deduping first
shrinks the build side (often down to broadcast range) and guarantees
the join can never explode row counts, where a naive join + post-dedup
would shuffle the multiplied rows first.

The reference itself performs exactly this shape in its informer
lookups (pkg/watcher/watcher.go:123-143 returns the FIRST pod for an
IP; the labeler errors on >1) — dims.py handles that guarded variant;
this module provides the general any-match contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def any_left_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    pick_order: Column,
    broadcast_right: bool = True,
) -> DataFrame:
    """LEFT JOIN with ClickHouse ANY strictness: at most one right row
    per join key, the one minimizing ``pick_order`` (pass a single
    unique expression — e.g. a packed int64 key — so the pick is total
    and engine-portable).

    Plan: the right side reduces to one row per key via a single
    min_by hash aggregation (map-side combined), then joins — broadcast
    by default since an ANY right side is a dimension by construction;
    set ``broadcast_right=False`` for dims beyond broadcast size (the
    equi-join then shuffles both sides on the key).
    """
    payload = [c for c in right.columns if c not in on]
    deduped = right.groupBy(*on).agg(
        F.min_by(F.struct(*payload), pick_order).alias("_p")
    ).select(*on, "_p.*")
    if broadcast_right:
        deduped = F.broadcast(deduped)
    return left.join(deduped, on=on, how="left")


def paste_join(
    left: DataFrame,
    right: DataFrame,
    order_left: list[str],
    order_right: list[str],
    pos_col: str = "pos",
) -> DataFrame:
    """ClickHouse ``PASTE JOIN``: zip two relations row-by-row after
    ordering each side (row N joins row N; result length = the shorter
    side). Column names must be disjoint.

    Positional joins need a GLOBAL row index. ``row_number()`` without
    a partition key would collapse to one partition — the anti-pattern —
    so each side is sorted (distributed range sort) and indexed with
    ``zipWithIndex`` (one pass computing per-partition offsets). This is
    one of the few operations where dropping to the RDD layer is the
    scale-correct move; the join back is a plain equi-join on the index.

    Reference: ClickHouse docs/sql-reference/statements/select/join
    (PASTE JOIN ordering caveat applies there too: positional semantics
    are only meaningful with an explicit order, which this API demands).
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"paste_join requires disjoint columns: {overlap}")

    from pyspark.sql.types import LongType, StructField

    def index(df: DataFrame, order: list[str]) -> DataFrame:
        sdf = df.orderBy(*order)
        schema = sdf.schema.add(StructField(pos_col, LongType(), False))
        rdd = sdf.rdd.zipWithIndex().map(lambda t: tuple(t[0]) + (t[1],))
        return df.sparkSession.createDataFrame(rdd, schema)

    li = index(left, order_left)
    ri = index(right, order_right)
    return li.join(ri, pos_col, "inner")
