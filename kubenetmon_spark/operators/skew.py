"""Explicit skew tools: salted joins and salted two-phase aggregation.

AQE's skew-join splitting (on by default, session.py) handles most hot
keys at runtime, but two cases still want explicit salting at 100 TB:
(1) a broadcast-ineligible join where ONE key holds a double-digit
percentage of rows (AQE splits a skewed partition's files, but a single
giant build-side key still hash-clusters), and (2) deterministic plan
shape for SLA-bound jobs where runtime re-planning is unwelcome.

``salted_join`` replicates the SMALL side ``salt_n`` times and spreads
the large side's rows uniformly across the salts — same join result,
hot key sliced ``salt_n`` ways. Cost: small side ×salt_n (keep it
broadcast-sized after replication).

``salted_sum`` is the aggregation analogue (same trick
``operators/agg.py`` uses for COUNT DISTINCT): partial sums per
(key, salt), then a second tiny aggregation folds the salts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key pressure spread over ``salt_n`` buckets.

    The large side gets a random-free, deterministic salt from a hash of
    ALL its columns (uniform, reproducible); the small side is exploded
    to every salt value so each bucket can satisfy the join.

    Join types preserving the SMALL side's unmatched rows (right/full
    outer) are refused: the small side is replicated ``salt_n`` times,
    so each of its unmatched rows would surface ``salt_n`` duplicates.
    """
    if how.replace("_", "").lower() in {"right", "rightouter", "full", "fullouter", "outer"}:
        raise ValueError(
            f"salted_join cannot preserve small-side unmatched rows "
            f"(how={how!r}): the replicated small side would emit "
            f"{salt_n} duplicates per unmatched row"
        )
    lcols = [c for c in large.columns]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in lcols]), F.lit(salt_n))
    l = large.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    return l.join(s, on + ["_salt"], how).drop("_salt")


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
    salt_n: int = 32,
) -> DataFrame:
    """groupBy(key).sum with the reduce of any single key spread over
    ``salt_n`` reducers first. Identical result (sums are associative);
    use when one group holds enough rows that even map-side partial
    aggregation leaves a hot reducer."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_n))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
    )
    return partial.groupBy(*key_cols).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
