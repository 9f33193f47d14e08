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

import os

from pyspark.sql import DataFrame, SparkSession


def read_state_or_none(
    spark: SparkSession, path: str, base_path: str | None = None
) -> DataFrame | None:
    """The persisted state at ``path``, or None ONLY when no state has
    ever been committed there. Read errors of existing state re-raise."""
    if not os.path.isdir(path):
        return None
    has_part = any(
        f.endswith(".parquet")
        for _, _, files in os.walk(path)
        for f in files
    )
    if not has_part:
        return None
    reader = spark.read
    if base_path is not None:
        reader = reader.option("basePath", base_path)
    return reader.parquet(path)
