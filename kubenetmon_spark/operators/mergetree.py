"""MergeTree-family aggregation contracts beyond Summing.

The reference's fact table is a ``SummingMergeTree`` (reference
test/network_flows_0.sql:39; our analogue is
``operators/flows.py::summing_aggregate`` + ``sink.compact``). ClickHouse
deployments routinely use the two sibling engines for state tables, so a
user switching to this engine needs their contracts too:

- **ReplacingMergeTree**: rows sharing the key are replaced by the one
  with the highest version — upsert semantics at merge time.
- **CollapsingMergeTree**: rows carry a ``sign`` (+1 insert / -1 cancel);
  merge cancels pairs, and correct reads aggregate ``value * sign`` with
  ``HAVING sum(sign) > 0`` — the documented ClickHouse query pattern.

Like the Summing analogue, these are **aggregation contracts, not
storage engines**: each is one hash aggregation on the key (map-side
partial agg applies, shuffle volume = live keys), runnable eagerly on a
stream's foreachBatch or as the compaction step over at-rest partitions.
``replacing_aggregate`` is idempotent (safe as a repeated background
merge); ``collapsing_aggregate`` is the terminal READ fold — partial
collapses at rest keep the sign column and stay re-foldable because
sign-weighted sums are associative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def replacing_aggregate(
    df: DataFrame, key_cols: list[str], version_col: str
) -> DataFrame:
    """Keep the highest-version row per key (ReplacingMergeTree merge).

    Ties on version keep the lexicographically-greatest payload struct —
    deterministic, engine-reproducible (documented ClickHouse leaves
    tie choice undefined; we pin it). Output schema == input schema.
    """
    payload = [c for c in df.columns if c not in key_cols and c != version_col]
    packed = F.struct(F.col(version_col), *[F.col(c) for c in payload])
    agg = df.groupBy(*key_cols).agg(F.max(packed).alias("_top"))
    return agg.select(
        *key_cols,
        F.col(f"_top.{version_col}").alias(version_col),
        *[F.col(f"_top.{c}").alias(c) for c in payload],
    )


def collapsing_aggregate(
    df: DataFrame,
    key_cols: list[str],
    sign_col: str,
    value_cols: list[str],
) -> DataFrame:
    """CollapsingMergeTree read contract: per key, net sign and
    sign-weighted value sums; keys whose inserts and cancels balanced
    out (net sign <= 0) disappear.

    Returns ``key_cols + [net_<v> per value col] + [n_rows]``. This is
    the ClickHouse ``SUM(v * sign) ... HAVING SUM(sign) > 0`` pattern as
    an operator, so callers can't forget the HAVING clause.
    """
    sign = F.col(sign_col)
    out = df.groupBy(*key_cols).agg(
        F.sum(sign).alias("_net_sign"),
        *[F.sum(F.col(v) * sign).alias(f"net_{v}") for v in value_cols],
        F.count(F.lit(1)).alias("n_rows"),
    )
    return out.filter(F.col("_net_sign") > 0).drop("_net_sign")


def versioned_collapsing_latest(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    sign_col: str,
    value_cols: list[str],
) -> DataFrame:
    """VersionedCollapsingMergeTree ``FINAL`` read contract: a (+1) row
    is cancelled ONLY by a (-1) row carrying the SAME version (unlike
    plain Collapsing, where any cancel nets against any insert — that
    difference is what makes Versioned safe under out-of-order
    multi-writer streams). The surviving state per key is the row with
    the highest un-cancelled version.

    Plan: one hash agg on (key, version) nets signs per version, a
    second max_by picks the latest survivor — both shuffles are on the
    same key prefix, so AQE plans the second as a near-local agg.

    Reference: ClickHouse docs/engines/table-engines/mergetree-family/
    versionedcollapsingmergetree.md.
    """
    sign = F.col(sign_col)
    per_version = df.groupBy(*key_cols, version_col).agg(
        F.sum(sign).alias("_net"),
        *[
            F.max(F.when(sign > 0, F.col(v))).alias(v)
            for v in value_cols
        ],
    )
    alive = per_version.filter(F.col("_net") > 0)
    return alive.groupBy(*key_cols).agg(
        F.max(version_col).alias(version_col),
        *[
            F.max_by(F.col(v), F.col(version_col)).alias(v)
            for v in value_cols
        ],
    )
