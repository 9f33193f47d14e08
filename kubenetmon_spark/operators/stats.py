"""Statistical aggregates: Welch's t-test, Pearson correlation, Shannon
entropy — the ClickHouse ``welchTTest`` / ``corr`` / ``entropy``
aggregate-function family.

Portability design: every statistic is computed FROM EXACT INTEGER SUMS
(counts, sum x, sum x^2, sum xy over fixed-point values). The only
floating-point steps are the final divisions/sqrt/log over those
integers — IEEE-754 operations are correctly rounded, so two engines
given identical integer inputs and the identical expression shape
produce identical doubles. (Spark's built-in ``corr``/``stddev``
accumulate floats in shuffle order and are NOT deterministic — never
use them where results are compared across runs or engines.)

Plan shape: each statistic is one hash aggregation with map-side
combine; integer partial sums are associative, so any partitioning
yields the same sums. Overflow: sum of x^2 must fit int64 — for cents
values |x| <= 1e6 that allows ~1e6 rows per group at worst; rescale the
fixed point for bigger groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sums(x: Column):
    return (
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
    )


def welch_t_test(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    variant_col: str,
    control: str,
    treatment: str,
) -> DataFrame:
    """Welch's unequal-variance t statistic per group between two
    variants of ``variant_col``; ``value_col`` must be integer
    fixed-point. Returns n/mean per variant and ``t_stat``
    (null when either side has < 2 rows or zero variance on both)."""
    x = F.col(value_col)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.when(F.col(variant_col) == control, 1)).alias("n1"),
        F.sum(F.when(F.col(variant_col) == control, x)).alias("sx1"),
        F.sum(F.when(F.col(variant_col) == control, x * x)).alias("sxx1"),
        F.count(F.when(F.col(variant_col) == treatment, 1)).alias("n2"),
        F.sum(F.when(F.col(variant_col) == treatment, x)).alias("sx2"),
        F.sum(F.when(F.col(variant_col) == treatment, x * x)).alias("sxx2"),
    )
    # var_i = (sxx - sx^2/n) / (n - 1); se^2 = var1/n1 + var2/n2
    def var(sxx, sx, n):
        return (F.col(sxx) - F.col(sx) * F.col(sx) / F.col(n)) / (F.col(n) - 1)

    v1, v2 = var("sxx1", "sx1", "n1"), var("sxx2", "sx2", "n2")
    m1 = F.col("sx1") / F.col("n1")
    m2 = F.col("sx2") / F.col("n2")
    se2 = v1 / F.col("n1") + v2 / F.col("n2")
    t = F.when(
        (F.col("n1") >= 2) & (F.col("n2") >= 2) & (se2 > 0),
        (m1 - m2) / F.sqrt(se2),
    )
    return agg.select(
        *group_cols,
        "n1",
        "n2",
        F.round(m1, 6).alias("mean_control"),
        F.round(m2, 6).alias("mean_treatment"),
        F.round(t, 6).alias("t_stat"),
    )


def pearson_corr_exact(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    out_col: str = "corr",
) -> DataFrame:
    """Pearson correlation from exact integer sums:
    (n*sxy - sx*sy) / sqrt((n*sxx - sx^2) * (n*syy - sy^2)).
    Both columns must be integer fixed-point; null when either side is
    constant."""
    x, y = F.col(x_col), F.col(y_col)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    # dx * dy can overflow int64 — convert each exact factor to double
    # FIRST (identical IEEE conversion in any engine), then multiply
    r = F.when(
        (dx > 0) & (dy > 0),
        num / F.sqrt(dx.cast("double") * dy.cast("double")),
    )
    return agg.select(
        *group_cols, "n", F.round(r, 6).alias(out_col)
    )


def shannon_entropy(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "entropy_bits",
) -> DataFrame:
    """Shannon entropy (bits) of ``value_col``'s distribution per group
    — ClickHouse ``entropy``. Two-level aggregation: exact (group,
    value) counts first, then H = log2(N) - sum(c*log2(c))/N, which
    uses only the integer counts so every engine computes identical
    doubles."""
    counts = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    agg = counts.groupBy(*group_cols).agg(
        F.sum("_c").alias("_n"),
        F.sum(F.col("_c") * F.log2("_c")).alias("_clogc"),
    )
    h = F.log2("_n") - F.col("_clogc") / F.col("_n")
    return agg.select(*group_cols, F.round(h, 6).alias(out_col))
