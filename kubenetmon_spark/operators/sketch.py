"""Heavy hitters via per-partition Misra-Gries + exact verification.

"Top talkers" over 100 TB (reference README.md:180-184's headline query)
doesn't need a full groupBy when the answer is the top handful of keys:
a groupBy shuffles EVERY distinct key; the sketch path shuffles only a
candidate set bounded by ``num_counters x partitions``.

Two phases, mirroring the LSH candidates-then-verify pattern:

1. **Sketch** (mapInPandas, no shuffle): each partition keeps a
   Misra-Gries summary of at most ``num_counters`` counters, folded in
   Arrow-batch-sized steps (batch value_counts merged into the summary;
   on overflow, every counter drops by the (num_counters+1)-th largest
   value and non-positive counters evict — the batched form of MG's
   decrement). A key's undercount is bounded by the partition's total
   decrement < n_p/num_counters, so any key with GLOBAL frequency >
   n/num_counters survives in at least one partition (pigeonhole over
   the partition frequencies).
2. **Verify** (one small shuffle): exact counts for candidate keys only
   (semi-join the fact side against the broadcast candidate set), then
   top-k. Counts returned are EXACT; the sketch only decides
   candidacy, and cannot miss any key with frequency >= n/num_counters.

Pick ``num_counters >= n / (expected k-th heaviest count)`` — the
default 256 is complete for any key holding >= 0.4% of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


def _fold_mg(counters: dict, batch_counts, num_counters: int) -> dict:
    """Merge a batch's exact counts into a Misra-Gries summary."""
    for v, c in batch_counts.items():
        counters[v] = counters.get(v, 0) + int(c)
    if len(counters) > num_counters:
        t = sorted(counters.values(), reverse=True)[num_counters]
        counters = {k: n - t for k, n in counters.items() if n - t > 0}
    return counters


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    num_counters: int = 256,
) -> DataFrame:
    """Exact counts of the top-``k`` keys, found without shuffling every
    distinct key. Returns (key_col, n) ordered by n desc, key asc.
    Complete whenever the k-th heaviest key holds > 1/num_counters of
    all rows; raise ``num_counters`` for flatter distributions."""
    sketch_schema = StructType([StructField("key", StringType(), True)])

    def sketch(batches):
        import pandas as pd

        counters: dict = {}
        for b in batches:
            counters = _fold_mg(counters, b[key_col].value_counts(), num_counters)
        yield pd.DataFrame({"key": list(counters.keys())})

    candidates = (
        df.select(F.col(key_col).cast("string").alias(key_col))
        .mapInPandas(sketch, sketch_schema)
        .select(F.col("key").alias(key_col))
        .distinct()
    )
    exact = (
        df.select(F.col(key_col).cast("string").alias(key_col))
        .join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return exact.orderBy(F.desc("n"), F.asc(key_col)).limit(k)


def uniq_state(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
    out_col: str = "uniq_sketch",
) -> DataFrame:
    """ClickHouse ``uniqState`` analogue: per group, a MERGEABLE
    distinct-count sketch (Apache DataSketches HLL via Spark's
    ``hll_sketch_agg``) stored as bytes. Persist these per partition
    (e.g. per day) and distinct counts over any date range become a
    sketch union instead of a fact rescan — exactly what
    AggregatingMergeTree buys ClickHouse with the -State/-Merge
    combinators.

    One hash aggregation, map-side combined; sketch size is O(2^lg_k)
    bytes per group regardless of cardinality.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(out_col)
    )


def uniq_merge(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "uniq_sketch",
    out_col: str = "n_distinct_est",
) -> DataFrame:
    """ClickHouse ``uniqMerge``: union per-partition sketches and
    estimate. The shuffle carries one sketch per (partition, group) —
    bytes, not rows. HLL union is associative/commutative at the set
    level, but Spark's sketch packing can vary slightly with merge
    order, so estimates from different partitionings agree within the
    configured error (~1.6% at lg_k=12), not bit-for-bit — treat the
    result as an estimate, never a grouping key."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(True))
        ).alias(out_col)
    )


def heavy_hitters_weighted(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int = 10,
    num_counters: int = 256,
) -> DataFrame:
    """ClickHouse ``topKWeighted``: top-``k`` keys by SUMMED WEIGHT
    (bytes, revenue) rather than row count — the actual top-talkers
    semantics of the README query (reference README.md:180-185).
    Same Misra-Gries candidate pass as :func:`heavy_hitters` but fed
    weighted increments (MG admits arbitrary positive increments), then
    exact weight sums over the surviving candidates only. Complete
    whenever the k-th heaviest key holds > 1/num_counters of the total
    weight."""
    sketch_schema = StructType([StructField("key", StringType(), True)])

    def sketch(batches):
        import pandas as pd

        counters: dict = {}
        for b in batches:
            sums = b.groupby(key_col)[weight_col].sum()
            counters = _fold_mg(counters, sums, num_counters)
        yield pd.DataFrame({"key": list(counters.keys())})

    slim = df.select(
        F.col(key_col).cast("string").alias(key_col), weight_col
    )
    candidates = (
        slim.mapInPandas(sketch, sketch_schema)
        .select(F.col("key").alias(key_col))
        .distinct()
    )
    exact = (
        slim.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.sum(weight_col).cast("long").alias("total_weight"))
    )
    return exact.orderBy(F.desc("total_weight"), F.asc(key_col)).limit(k)
