"""Shared persisted-state read for incremental foreachBatch streams.

Every incremental stream in this package (top-k, timing, moments,
dedup indexes, SCD2 dims, rates) persists its state as parquet and
re-reads it at each micro-batch. Reading that state with a bare
``try/except -> None`` conflates two very different situations:

- the state genuinely does not exist yet (first batch) — None is right;
- the state EXISTS but the read failed (corrupt footer, permission
  blip, listing error) — returning None here silently resets the
  stream's accumulated state and lets the batch overwrite correct
  output with wrong values, with no error ever surfacing.

``read_state_or_none`` makes the distinction explicit: only a missing
path (or a directory holding no data file yet — a crashed first write)
means "no state"; every other failure propagates so the stream stops
loudly instead of corrupting quietly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kubenetmon_spark import fs as _fsm


def bounded_coalesce(df: DataFrame) -> DataFrame:
    """Cap a micro-batch output's file count at one file per 32 cores
    (r7, guide §6): incremental streams write one ``_bid=`` dir per
    batch, and letting each dir inherit the shuffle's partition count
    as its file count multiplies the state table's file census by the
    core count — every subsequent batch re-lists and re-opens all of
    it. One file per 32 cores keeps batch-state files large at any
    cluster size; ``coalesce`` so no extra shuffle."""
    n = max(1, df.sparkSession.sparkContext.defaultParallelism // 32)
    return df.coalesce(n)


def read_state_or_none(
    spark: SparkSession, path: str, base_path: str | None = None
) -> DataFrame | None:
    """The persisted state at ``path``, or None ONLY when no state has
    ever been committed there. Read errors of existing state re-raise.

    The data-file probe ignores files under ``_``/``.``-prefixed
    directories (``_temporary`` left by a crashed first write): Spark's
    reader skips those, so counting them as "state exists" would turn a
    crashed FIRST write into a permanent 'unable to infer schema' error
    on every subsequent batch instead of the documented no-state case.
    Works on URI-form state paths (hdfs/s3a) through the FS adapter."""
    fs = _fsm.get_fs(path, spark)
    if not fs.is_dir(path):
        return None
    if not fs.glob_parquet(path):  # hidden dirs excluded by default
        return None
    reader = spark.read
    if base_path is not None:
        reader = reader.option("basePath", base_path)
    return reader.parquet(path)
