"""Deterministic, engine-portable sampling.

``df.sample()`` is seed-dependent AND partitioning-dependent — rerun
the job with different file splits and you get a different sample,
which is unusable for reproducible training-data curation. Hash
sampling fixes that: a row is kept iff a hash of its stable id falls
under the keep threshold. The decision is a pure function of the id,
so it is identical across runs, engines (md5 is md5 everywhere),
partitionings, and scale factors, and a row's fate never depends on
which executor saw it.

Scale posture: a narrow filter on a scan — no shuffle, no state,
pushes down column pruning, and composes with stratification for free
(the hash is uniform within every stratum because it ignores the
stratum column entirely).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 4 hex chars = 65536 buckets; thresholds resolve to 1/65536 granularity.
_BUCKETS = 16**4


def hash_keep(id_col: Column, keep_bp: int) -> Column:
    """Boolean keep-decision: md5(id) falls in the first keep_bp/10000
    of the [0, ffff] hex space. Lexicographic compare on fixed-width
    lowercase hex == numeric compare, and both Spark and DuckDB emit
    lowercase hex md5, so the predicate is engine-portable verbatim.

    keep_bp >= 10000 keeps EVERYTHING: the naive threshold would be
    '10000' — five chars, lexicographically BELOW 'ffff' — silently
    keeping only 1/16 of rows; 'g' sorts above every hex digit."""
    if keep_bp >= 10000:
        threshold = "g"
    else:
        threshold = format(int(_BUCKETS * keep_bp / 10000), "04x")
    return F.substring(F.md5(id_col.cast("string")), 1, 4) < F.lit(threshold)


def deterministic_sample(df: DataFrame, id_col: str, keep_bp: int) -> DataFrame:
    """Keep ~keep_bp/10000 of rows, decided per-row by md5(id)."""
    return df.filter(hash_keep(F.col(id_col), keep_bp))
