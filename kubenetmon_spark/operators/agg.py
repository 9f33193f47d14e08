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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def two_phase_count_distinct(
    df: DataFrame, keys: list[str], value_col: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Exact COUNT(DISTINCT value) GROUP BY keys, skew-safe.

    Phase 1 groups by (keys..., value) — the hot key's rows distribute
    across reducers by value, bounding any single reducer by the key's
    distinct-value count, not its row count. Phase 2 counts the surviving
    rows per key. Identical result to countDistinct, different shuffle
    shape; use when a key can hold a large fraction of all rows.
    """
    return (
        df.groupBy(*keys, value_col)
        .agg(F.lit(1).alias("_one"))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
