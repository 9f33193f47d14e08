"""Z-order (Morton-curve) clustering for multi-dimensional data skipping.

ClickHouse gets one clustering dimension for free from its ORDER BY key;
queries filtering on a *secondary* column scan everything. The standard
lakehouse answer (Delta/Iceberg OPTIMIZE ZORDER) is to sort files along a
space-filling curve so parquet row-group/file min-max stats stay tight in
EVERY participating dimension at once — a box predicate then prunes most
files no matter which dimension it constrains.

Implementation is pure built-in expressions (codegen, no UDF):

1. quantize each column to ``bits`` bits by min-max scaling (one tiny
   aggregate action computes the mins/maxes — no shuffle of the data);
2. interleave the quantized bits into one long Morton key;
3. range-repartition + sort by the key at write time.

Min-max quantization is the zero-shuffle choice; heavily skewed columns
concentrate keys (Delta's rank-based range-partition-id variant is the
skew-robust alternative at the cost of a per-column global rank). For
IP-like, port-like, and time-like columns — the flow table's secondary
predicates — min-max is the right tradeoff.

At 100 TB this runs inside compaction, per date partition: the curve key
is computed scan-side, the only data movement is the range exchange the
sorted write needs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int | None = None,
    out_col: str = "zkey",
) -> DataFrame:
    """Append a Morton-interleaved clustering key over ``cols``.

    ``bits`` per dimension defaults to the most that fit a signed long
    (63 // len(cols), capped at 16). Null values quantize to bucket 0.
    """
    if not 2 <= len(cols) <= 4:
        raise ValueError("z-ordering needs 2-4 columns")
    if bits is None:
        bits = min(16, 63 // len(cols))
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} cols overflows a long")

    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"max_{c}") for c in cols],
    ).collect()[0]

    top = (1 << bits) - 1
    quantized: list[Column] = []
    for c in cols:
        lo, hi = stats[f"min_{c}"], stats[f"max_{c}"]
        if lo is None or hi is None or hi == lo:
            quantized.append(F.lit(0).cast("long"))
            continue
        scaled = (F.col(c).cast("double") - F.lit(lo)) / F.lit(hi - lo) * top
        q = F.least(F.greatest(F.floor(scaled), F.lit(0)), F.lit(top))
        quantized.append(F.coalesce(q, F.lit(0)).cast("long"))

    # Interleave: output bit (b * n_cols + i) = bit b of column i.
    key: Column = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, q in enumerate(quantized):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * n + i)
    return df.withColumn(out_col, key)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    mode: str = "overwrite",
    bits: int | None = None,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the Morton
    curve of ``cols`` — range partitioning keeps each file a contiguous
    curve segment, the sort keeps row groups tight within the file."""
    keyed = with_zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode(mode)
        .parquet(path)
    )


def morton_encode2(x: Column, y: Column, bits: int = 16) -> Column:
    """ClickHouse ``mortonEncode(x, y)`` — RAW integer bit interleave
    (no quantization; callers bound their inputs to ``bits`` each).
    Output bit 2b is bit b of x, bit 2b+1 is bit b of y — matching the
    quantized key ``with_zorder_key`` builds after scaling.
    """
    key: Column = F.lit(0).cast("long")
    for b in range(bits):
        key = key + F.shiftleft(
            F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b
        )
        key = key + F.shiftleft(
            F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1
        )
    return key


def morton_decode2(key: Column, bits: int = 16) -> tuple[Column, Column]:
    """Inverse of ``morton_encode2``: recover (x, y)."""
    x: Column = F.lit(0).cast("long")
    y: Column = F.lit(0).cast("long")
    for b in range(bits):
        x = x + F.shiftleft(
            F.shiftright(key, 2 * b).bitwiseAND(F.lit(1)), b
        )
        y = y + F.shiftleft(
            F.shiftright(key, 2 * b + 1).bitwiseAND(F.lit(1)), b
        )
    return x, y
