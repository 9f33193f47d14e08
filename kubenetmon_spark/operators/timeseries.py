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
