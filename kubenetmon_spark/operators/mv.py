"""Incremental materialized-aggregate maintenance.

ClickHouse pairs a materialized view with a SummingMergeTree target so a
rollup (per-day per-key totals) stays current as inserts land, without
re-scanning the fact table. The reference relies on exactly this engine
capability for its fact table (reference test/network_flows_0.sql:39-44:
the SummingMergeTree merge IS incremental aggregate maintenance). Spark
has no MV object; the same capability decomposes into two pieces that
are each idiomatic here:

- :func:`merge_rollup` — the algebra: partial aggregates are mergeable
  because every maintained measure is decomposable (sum/count/min/max).
  New data is aggregated alone (small shuffle), unioned with the
  existing partials, and re-summed; never a re-scan of history.
- :func:`refresh_rollup` — the lifecycle: an at-rest rollup table is
  maintained per fact *partition*. Changed partitions are detected from
  file-listing signatures (name, size, mtime) kept beside the rollup, so
  a refresh re-aggregates ONLY partitions whose files changed and
  dynamic-partition-overwrite rewrites just those rollup partitions.
  Maintenance cost scales with the day's churn, not table size — at
  100 TB a daily refresh touches the handful of open date partitions
  and is embarrassingly parallel across them.

avg-style measures are maintained as (sum, count) pairs and divided at
read time; non-decomposable aggregates (exact percentiles, distinct
counts) are out of scope by design — use operators/agg.py's two-phase
distinct or sketches for those.
"""

from __future__ import annotations

import hashlib
import json
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kubenetmon_spark import fs as _fsm
from kubenetmon_spark.fs import join as _join

_STATE_FILE = "_refresh_state.json"


def merge_rollup(
    parts: list[DataFrame], key_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Merge partial aggregates sharing a key — the SummingMergeTree fold.

    Each input must already carry ``key_cols + sum_cols``; typically one
    element is the existing rollup and the other is ``groupBy(key).sum``
    over just-arrived rows. Associative and commutative, so batches can
    land in any order and the result is identical to aggregating the
    union of all underlying fact rows.
    """
    df = reduce(lambda a, b: a.unionByName(b), parts)
    return df.groupBy(*key_cols).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )


def aggregate_delta(
    fact: DataFrame, key_cols: list[str], sum_exprs: dict[str, object]
) -> DataFrame:
    """Aggregate a batch of fact rows into rollup-shaped partials.

    ``sum_exprs`` maps output column -> a Spark Column whose SUM is the
    partial (use ``F.lit(1)`` for row counts). Partials produced here
    feed :func:`merge_rollup`.
    """
    return fact.groupBy(*key_cols).agg(
        *[F.sum(expr).alias(name) for name, expr in sum_exprs.items()]
    )


def _partition_signatures(fact_root: str, partition_col: str) -> dict[str, str]:
    fs = _fsm.get_fs(fact_root)
    sigs: dict[str, str] = {}
    if not fs.is_dir(fact_root):
        return sigs
    for name in fs.list_names(fact_root):
        if not name.startswith(f"{partition_col}="):
            continue
        part = _join(fact_root, name)
        if not fs.is_dir(part):
            continue
        cpart = fs.canonical(part)
        # filter with Spark's hidden rule on EVERY rel segment: staging
        # debris under _replace-*/.crc dirs must not perturb the
        # signature (Spark never reads it, so it is not table churn)
        entries = sorted(
            (rel, size, mtime)
            for f, size, mtime in fs.walk_files(part)
            for rel in [f[len(cpart) :].lstrip("/")]
            if not any(
                _fsm._is_hidden_segment(seg) for seg in rel.split("/")
            )
        )
        digest = hashlib.md5(json.dumps(entries).encode()).hexdigest()
        sigs[name.split("=", 1)[1]] = digest
    return sigs


def refresh_rollup(
    spark: SparkSession,
    fact_path: str,
    rollup_path: str,
    key_cols: list[str],
    sum_exprs: dict[str, object],
    partition_col: str = "date",
) -> list[str]:
    """Incrementally refresh an at-rest rollup of a partitioned fact table.

    Re-aggregates only fact partitions whose file listing changed since
    the last refresh (new files appended, compaction rewrote, retention
    dropped) and rewrites exactly those partitions of the rollup via
    dynamic partition overwrite. ``partition_col`` must be in
    ``key_cols`` so every rollup row belongs to one partition. Returns
    the refreshed partition values.

    Idempotent: a refresh with no fact changes rewrites nothing.
    """
    if partition_col not in key_cols:
        raise ValueError(f"{partition_col!r} must be one of key_cols")
    fs = _fsm.get_fs(rollup_path, spark)
    state_path = _join(rollup_path, _STATE_FILE)

    current = _partition_signatures(fact_path, partition_col)
    previous: dict[str, str] = {}
    if fs.exists(state_path):
        previous = fs.read_json(state_path)

    changed = [p for p, sig in current.items() if previous.get(p) != sig]
    dropped = [p for p in previous if p not in current]

    if changed:
        fact = spark.read.parquet(fact_path).filter(
            F.col(partition_col).isin(changed)
        )
        partials = aggregate_delta(fact, key_cols, sum_exprs)
        (
            partials.repartition(F.col(partition_col))
            .write.mode("overwrite")
            # pinned per-write (sink.py convention), NOT inherited from
            # the session: under the default "static" mode this
            # overwrite would wipe every untouched rollup partition
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(rollup_path)
        )
    for p in dropped:
        # retention dropped the fact partition; mirror it in the rollup
        part_dir = _join(rollup_path, f"{partition_col}={p}")
        if fs.exists(part_dir):
            fs.delete_dir(part_dir)

    fs.mkdirs(rollup_path)
    fs.write_text_atomic(state_path, json.dumps(current, sort_keys=True))
    return sorted(changed + dropped)


def answer_from_rollup(
    spark: SparkSession,
    base_path: str,
    rollups: dict[str, list[str]],
    group_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """ClickHouse AGGREGATE-projection chooser: answer
    ``GROUP BY group_cols SUM(sum_cols)`` from the SMALLEST registered
    rollup that can, falling back to the base fact table.

    ``rollups`` maps rollup path -> its grouping key. A rollup grouped
    by G answers a query grouped by g iff g ⊆ G (sums re-aggregate —
    the partial-aggregate algebra of merge_rollup); among candidates
    the one with the FEWEST key columns wins (coarsest = smallest).

    This is the read-side of the materialized-view pair: refresh_rollup
    maintains the tables, answer_from_rollup routes queries — together
    they are ClickHouse's `PROJECTION (SELECT ... GROUP BY ...)` with
    the chooser made explicit. A dashboard group-by over 100 TB of raw
    flows reads a few MB of rollup instead.
    """
    want = set(group_cols)
    candidates = [
        (len(keys), path)
        for path, keys in rollups.items()
        if want <= set(keys)
    ]
    source = (
        spark.read.parquet(min(candidates)[1])
        if candidates
        else spark.read.parquet(base_path)
    )
    return source.groupBy(*group_cols).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
