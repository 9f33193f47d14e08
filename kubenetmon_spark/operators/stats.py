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


def mann_whitney_u(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    variant_col: str,
    control: str,
    treatment: str,
) -> DataFrame:
    """Mann-Whitney U (ClickHouse ``mannWhitneyUTest``) with midrank tie
    handling, EXACT: doubled midranks are integers (rank sums stay in
    int64), so U is computed without any float until the final z
    statistic. Returns n1, n2, u1 (doubled-U halved via exact division
    by 2 — doubled U is always even), and z (normal approximation with
    tie correction, rounded; null for degenerate groups).

    Plan: one shuffle+sort of the pooled values per group (the rank
    window), then a hash agg — rank windows and aggregation share the
    partitioning.
    """
    from pyspark.sql.window import Window

    x = F.col(value_col)
    w = Window.partitionBy(*group_cols).orderBy(x)
    # doubled midrank = rank_first + rank_last = 2*rank + (ties-1)
    r_lo = F.rank().over(w)
    cnt_eq = F.count(F.lit(1)).over(
        Window.partitionBy(*group_cols, value_col)
    )
    dbl_midrank = 2 * r_lo + (cnt_eq - 1)
    is1 = F.col(variant_col) == control
    is2 = F.col(variant_col) == treatment
    agg = (
        df.withColumn("_dmr", dbl_midrank)
        .withColumn("_eq", cnt_eq)
        .groupBy(*group_cols)
        .agg(
            F.count(F.when(is1, 1)).alias("n1"),
            F.count(F.when(is2, 1)).alias("n2"),
            F.sum(F.when(is1, F.col("_dmr"))).alias("dblr1"),
            # sum over rows of (t^2 - 1) = sum over tie groups of
            # t*(t^2-1) = the sum(t^3 - t) the tie correction needs
            F.sum((F.col("_eq") * F.col("_eq") - 1)).alias("tie3"),
        )
    )
    n1, n2 = F.col("n1"), F.col("n2")
    n = n1 + n2
    # U1 = R1 - n1(n1+1)/2 with R1 = dblr1/2 (dblr1 always even in sum)
    u1 = (F.col("dblr1") - n1 * (n1 + 1)) / 2
    mu = n1 * n2 / 2
    tie_term = F.col("tie3").cast("double") / (n * (n - 1))
    sigma2 = (n1 * n2).cast("double") / 12 * ((n + 1).cast("double") - tie_term)
    z = F.when((n1 > 0) & (n2 > 0) & (sigma2 > 0), (u1 - mu) / F.sqrt(sigma2))
    return agg.select(
        *group_cols,
        "n1",
        "n2",
        u1.cast("double").alias("u1"),
        F.round(z, 6).alias("z"),
    )


def ks_test(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    variant_col: str,
    control: str,
    treatment: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D (ClickHouse
    ``kolmogorovSmirnovTest``), exact: the ECDF sup-difference is
    max |c1*n2 - c2*n1| over pooled points with integer cumulative
    counts, divided by n1*n2 only at the end — the argmax is over
    exact int64 values, so D is identical in any engine.
    """
    from pyspark.sql.window import Window

    is1 = (F.col(variant_col) == control).cast("long")
    is2 = (F.col(variant_col) == treatment).cast("long")
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy("_x")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*group_cols)
    stepped = (
        df.select(
            *group_cols,
            F.col(value_col).alias("_x"),
            is1.alias("_i1"),
            is2.alias("_i2"),
        )
        # RANGE frame: all rows sharing a value get the FULL cumulative
        # count at that value — the ECDF evaluated at the step, in any
        # tie order
        .withColumn("_c1", F.sum("_i1").over(wcum))
        .withColumn("_c2", F.sum("_i2").over(wcum))
        .withColumn("_n1", F.sum("_i1").over(wtot))
        .withColumn("_n2", F.sum("_i2").over(wtot))
    )
    agg = stepped.groupBy(*group_cols).agg(
        F.max("_n1").alias("n1"),
        F.max("_n2").alias("n2"),
        F.max(
            F.abs(F.col("_c1") * F.col("_n2") - F.col("_c2") * F.col("_n1"))
        ).alias("dnum"),
    )
    d = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0),
        F.col("dnum").cast("double")
        / (F.col("n1") * F.col("n2")).cast("double"),
    )
    return agg.select(*group_cols, "n1", "n2", F.round(d, 6).alias("d_stat"))
