"""Slowly-changing-dimension history from periodic snapshots (SCD type 2).

The reference re-reads its dimensions on a timer — k8s informer caches
for pods/nodes (reference pkg/watcher/watcher.go:52-120) and a daily
cloud-range refresh (reference pkg/labeler/remote.go:99-126) — and
always joins against "now". For REPROCESSING history at 100 TB you need
the dimension AS OF each fact's timestamp, which means converting the
snapshot stream into validity intervals:

    (key, attrs..., snapshot_ts)  ->  (key, attrs..., valid_from, valid_to)

keeping one interval per run of consecutive snapshots with identical
attributes. Facts then join with ``fact.ts >= valid_from AND fact.ts <
valid_to`` (or the as-of join, operators/asof.py).

Scale posture: one shuffle on the dimension key (window lag to detect
attribute changes + running sum to number versions — same single-sort
pattern as sessionization); dimensions are small relative to facts, so
this never touches fact rows. The change detector compares a
``struct`` of the tracked columns, which keeps NULL-safe equality
(struct equality is null-safe in Spark) without per-column plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Open-interval sentinel. NOT the SQL-conventional 9999-12-31: pandas /
# Arrow nanosecond timestamps top out at 2262-04-11, so a 9999 sentinel
# poisons every toPandas()/Arrow hop downstream (including any Pandas-UDF
# stage a caller composes after this). 2200-01-01 is safely beyond any
# fact timestamp and survives ns conversion.
FAR_FUTURE = "2200-01-01 00:00:00"


def scd2_from_snapshots(
    snapshots: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str = "snapshot_ts",
) -> DataFrame:
    """Collapse per-snapshot rows into SCD2 validity intervals.

    ``valid_from`` = first snapshot where the attribute tuple appeared
    (in its run); ``valid_to`` = the next change's timestamp, or
    ``FAR_FUTURE`` for the current version. A key absent from later
    snapshots keeps its last interval open — deletions, if tracked,
    should be modeled as a tombstone attribute in the snapshot source.
    """
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    # eqNullSafe, not !=: a struct comparison with a NULL attribute
    # field yields NULL, so a null->value (or value->null) transition
    # would silently NOT count as a change and two different versions
    # would merge into one run (with first() then picking an arbitrary
    # one). Null-safe equality makes every transition a boundary; the
    # first row's null lag also lands on the changed side for free.
    changed = F.when(
        ~F.lag(attrs).over(w).eqNullSafe(attrs), 1
    ).otherwise(0)
    run = Window.partitionBy(*key_cols).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    versioned = snapshots.withColumn("_ver", F.sum(changed).over(run))
    per_ver = versioned.groupBy(*key_cols, "_ver").agg(
        *[F.first(c).alias(c) for c in attr_cols],
        F.min(ts_col).alias("valid_from"),
    )
    nxt = Window.partitionBy(*key_cols).orderBy("_ver")
    return per_ver.withColumn(
        "valid_to",
        F.coalesce(
            F.lead("valid_from").over(nxt),
            F.lit(FAR_FUTURE).cast("timestamp"),
        ),
    ).drop("_ver")


def scd2_apply_batch(
    scd2: DataFrame,
    snapshots: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str = "snapshot_ts",
) -> DataFrame:
    """Incrementally fold a new snapshot batch into an existing SCD2
    table — the continuous-refresh shape (the reference's informer
    re-lists on a timer; reference pkg/watcher/watcher.go:52-120, daily
    cloud-range refresh pkg/labeler/remote.go:99-126).

    Equivalent to ``scd2_from_snapshots`` over the full concatenated
    history (property-tested), but touches only the OPEN intervals of
    keys present in the batch: closed history and untouched keys pass
    through unshuffled, so a refresh costs O(batch + touched open
    tails), not O(history) — the difference between a dimension refresh
    and a dimension rebuild at 100 TB of accumulated history.

    Precondition (append-only time): every batch ``ts_col`` must be >=
    the existing history's max snapshot time for its key. Out-of-order
    snapshots need the full rebuild path.
    """
    open_iv = scd2.filter(F.col("valid_to") == F.lit(FAR_FUTURE).cast("timestamp"))
    closed = scd2.filter(F.col("valid_to") != F.lit(FAR_FUTURE).cast("timestamp"))
    touched = snapshots.select(*key_cols).distinct()
    # untouched keys keep their open interval verbatim
    keep_open = open_iv.join(F.broadcast(touched), key_cols, "left_anti")
    # a touched key's open interval re-enters the collapse as a pseudo
    # snapshot at its own valid_from: an unchanged batch row extends the
    # run (same valid_from survives the MIN), a changed one closes it
    pseudo = open_iv.join(F.broadcast(touched), key_cols, "left_semi").select(
        *key_cols, F.col("valid_from").alias(ts_col), *attr_cols
    )
    redone = scd2_from_snapshots(
        pseudo.unionByName(snapshots.select(*key_cols, ts_col, *attr_cols)),
        key_cols,
        attr_cols,
        ts_col,
    )
    return closed.unionByName(keep_open).unionByName(redone)


def as_of_dimension(
    scd2: DataFrame, ts, key_cols: list[str] | None = None
) -> DataFrame:
    """The dimension as it existed at time ``ts`` (a literal or Column):
    one row per key, ready to broadcast-join exactly like a live
    informer cache."""
    t = F.lit(ts).cast("timestamp") if not hasattr(ts, "_jc") else ts
    return scd2.filter((F.col("valid_from") <= t) & (t < F.col("valid_to"))).drop(
        "valid_from", "valid_to"
    )
