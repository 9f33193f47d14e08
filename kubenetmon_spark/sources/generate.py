"""Deterministic synthetic-table generation — the engine-side analogue
of ClickHouse's ``numbers(N)`` and ``generateRandom()`` table functions.

``numbers`` is ``spark.range`` (distributed, no data movement).
``generate_table`` derives every column from xxhash64(id, seed) — a
pure projection over the range source, so generating 10^12 rows is
embarrassingly parallel with zero shuffle, and the SAME (schema, seed)
always yields the SAME table on any cluster (ClickHouse's
generateRandom has the same property via its seed argument).

Column specs (name -> spec):
- ("int", lo, hi)        uniform integer in [lo, hi]
- ("double2", lo, hi)    2-decimal double in [lo, hi] (cents-exact)
- ("string", prefix, n)  prefix + uniform integer in [0, n)
- ("choice", [values])   uniform pick from a literal list
- ("ts", start_iso, days) second-precision timestamp in a day window
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def numbers(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """ClickHouse ``numbers(N)``: 0..N-1 as column ``number``."""
    rng = spark.range(0, n, numPartitions=partitions) if partitions else spark.range(n)
    return rng.withColumnRenamed("id", "number")


def _h(seed: str, col: str):
    # non-negative 63-bit hash stream, independent per column
    return F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(col)))


def generate_table(
    spark: SparkSession,
    columns: dict[str, tuple],
    n: int,
    seed: str = "s0",
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic fake table: ``n`` rows, columns derived from the
    per-row hash stream (see module docstring for specs)."""
    rng = (
        spark.range(0, n, numPartitions=partitions)
        if partitions
        else spark.range(n)
    )
    out = rng
    for name, spec in columns.items():
        h = _h(seed, name)
        kind = spec[0]
        if kind == "int":
            lo, hi = spec[1], spec[2]
            col = (h % (hi - lo + 1) + lo).cast("bigint")
        elif kind == "double2":
            lo, hi = spec[1], spec[2]
            cents = h % int((hi - lo) * 100 + 1)
            col = (cents.cast("double") / 100 + lo)
        elif kind == "string":
            prefix, card = spec[1], spec[2]
            col = F.concat(F.lit(prefix), (h % card).cast("string"))
        elif kind == "choice":
            vals = spec[1]
            arr = F.array(*[F.lit(v) for v in vals])
            col = F.element_at(arr, (h % len(vals) + 1).cast("int"))
        elif kind == "ts":
            start_iso, days = spec[1], spec[2]
            secs = h % (days * 86400)
            col = F.to_timestamp(F.lit(start_iso)) + F.make_dt_interval(
                secs=secs.cast("double")
            )
        else:
            raise ValueError(f"unknown column spec {spec!r}")
        out = out.withColumn(name, col)
    return out.withColumnRenamed("id", "row_id")
