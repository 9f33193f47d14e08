"""Schema evolution for parquet tables: ClickHouse's metadata-only
``ALTER TABLE ADD / DROP / RENAME / MODIFY COLUMN`` family.

ClickHouse ALTERs of this family change only table metadata — existing
parts are NOT rewritten; reads materialize the declared schema on the
fly (a part missing an added column serves its DEFAULT; a dropped
column's bytes linger until a merge rewrites the part). The reference
evolves its flow table exactly this way across releases (reference
migrations/ adds columns to network_flows with defaults and relies on
merges to materialize).

The Spark translation keeps the same two-phase contract:

1. **DDL is metadata-only and instant** (:func:`add_column`,
   :func:`drop_column`, :func:`rename_column`, :func:`modify_column`):
   each appends one op to a ``_schema_log.json`` sidecar at the table
   root (underscore-prefixed, so parquet scans never see it). No data
   file is touched — ALTER on a 100 TB table costs one tiny file write,
   exactly like ClickHouse.
2. **Reads apply the log lazily** (:func:`read_evolved`): one
   ``mergeSchema`` read unions every file's physical schema, then the
   ops replay IN ORDER as narrow projections — added columns backfill
   their DEFAULT where files predate the ALTER, renames unify old-name
   and new-name files, MODIFY casts, DROP hides bytes still on disk.
   All pure column expressions: zero shuffle, zero Python, and Catalyst
   prunes/pushes through them.
3. **Materialization is the merge** (:func:`materialize_schema`):
   rewrite the files through the evolved projection and truncate the
   log — after it, plain reads see the evolved schema with no sidecar
   needed. Run it from compaction, exactly when ClickHouse's merges
   would rewrite parts.

Default semantics: an added column's ``default`` is a deterministic SQL
expression (literal or expression over OTHER columns, like ClickHouse
DEFAULT clauses). Rows from files that predate the ADD read the
default via ``coalesce`` — which means an explicit NULL written
after the ADD also reads as the default; declare ``default=None``
(nullable, no backfill) when NULL must be storable, the same choice
ClickHouse forces between ``x T DEFAULT d`` and ``x Nullable(T)``.

Validation happens at READ time, not ALTER time (the DDL functions are
pure sidecar writes with no SparkSession): a DROP/RENAME/MODIFY naming
a column that never existed raises a ``ValueError`` from the next
``read_evolved`` — check the first read after an ALTER, the same way a
bad ClickHouse mutation surfaces in ``system.mutations`` after the
fact rather than failing the ALTER statement.

At 100 TB: ``mergeSchema`` reads every file footer — fine for the
evolved-read path (footers are the index ClickHouse also reads), but
hot dashboards should run against materialized tables; the log is the
bridge between an instant ALTER and the eventual rewrite, not a
permanent tax.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG_NAME = "_schema_log.json"


def _log_path(path: str) -> Path:
    return Path(path) / _LOG_NAME


def schema_log(path: str) -> list[dict]:
    """The ordered ALTER ops recorded for the table (empty if none)."""
    p = _log_path(path)
    if not p.is_file():
        return []
    return json.loads(p.read_text())["ops"]


def _write_log(path: str, ops: list[dict]) -> None:
    # Atomic replace (the cache.py idiom): a concurrent read_evolved
    # must never observe a truncated sidecar mid-write.
    import os

    target = _log_path(path)
    tmp = target.with_name(target.name + f".tmp.{os.getpid()}")
    tmp.write_text(json.dumps({"version": 1, "ops": ops}))
    os.replace(tmp, target)


def _append_op(path: str, op: dict) -> None:
    ops = schema_log(path)
    ops.append(op)
    _write_log(path, ops)


def add_column(
    path: str, column: str, dtype: str, default: str | None = None
) -> None:
    """``ALTER TABLE ADD COLUMN column dtype [DEFAULT default]``.

    ``default`` is a SQL expression string evaluated per row at read
    (cast to ``dtype``); ``None`` means nullable-without-backfill.
    Metadata-only: no file is read or written except the sidecar.
    """
    _append_op(path, {"op": "add", "col": column, "dtype": dtype, "default": default})


def drop_column(path: str, column: str) -> None:
    """``ALTER TABLE DROP COLUMN`` — hides the column immediately; the
    bytes on disk go away at the next :func:`materialize_schema`."""
    _append_op(path, {"op": "drop", "col": column})


def rename_column(path: str, old: str, new: str) -> None:
    """``ALTER TABLE RENAME COLUMN old TO new`` — files written before
    the rename keep the old physical name; reads unify both."""
    _append_op(path, {"op": "rename", "old": old, "new": new})


def modify_column(path: str, column: str, dtype: str) -> None:
    """``ALTER TABLE MODIFY COLUMN column dtype`` — cast-on-read until
    materialized. Casts that cannot represent a value yield NULL (Spark
    ANSI-off cast), so widen, don't narrow, on live tables."""
    _append_op(path, {"op": "modify", "col": column, "dtype": dtype})


def _apply_ops(df: DataFrame, ops: list[dict]) -> DataFrame:
    for op in ops:
        kind = op["op"]
        if kind == "add":
            col, dtype, default = op["col"], op["dtype"], op["default"]
            if default is None:
                filler = F.lit(None).cast(dtype)
            else:
                filler = F.expr(default).cast(dtype)
            if col in df.columns:
                # files written after the ALTER carry real values; files
                # before it surface NULL under mergeSchema -> default
                value = F.coalesce(F.col(col).cast(dtype), filler)
            else:
                value = filler
            df = df.withColumn(col, value)
        elif kind == "drop":
            if op["col"] not in df.columns:
                raise ValueError(
                    f"DROP COLUMN {op['col']!r}: no such column "
                    f"(have {df.columns})"
                )
            df = df.drop(op["col"])
        elif kind == "rename":
            old, new = op["old"], op["new"]
            if old in df.columns and new in df.columns:
                # both physical generations present: unify
                df = df.withColumn(new, F.coalesce(F.col(new), F.col(old))).drop(old)
            elif old in df.columns:
                df = df.withColumnRenamed(old, new)
            elif new in df.columns:
                pass  # every file postdates the rename
            else:
                raise ValueError(
                    f"RENAME COLUMN {old!r}: no such column (have {df.columns})"
                )
        elif kind == "modify":
            if op["col"] not in df.columns:
                raise ValueError(
                    f"MODIFY COLUMN {op['col']!r}: no such column "
                    f"(have {df.columns})"
                )
            df = df.withColumn(op["col"], F.col(op["col"]).cast(op["dtype"]))
        else:
            raise ValueError(f"unknown schema op {kind!r}")
    return df


def apply_schema_log(df: DataFrame, path: str) -> DataFrame:
    """Replay the table's recorded ALTERs onto ``df`` — the streaming
    entry point: a ``readStream`` over an evolving table keeps running
    across ALTERs by reading with the mergeSchema-union schema
    (``spark.read.option("mergeSchema", True).parquet(path).schema``)
    and applying the log per micro-batch (pure projections are
    streaming-legal and stateless). Batch callers use
    :func:`read_evolved`, which wires the same replay to a plain read."""
    return _apply_ops(df, schema_log(path))


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read the table with every recorded ALTER applied, in order.

    One ``mergeSchema`` parquet read + pure column projections — the
    op replay adds no shuffle and no Python, and filters/pruning push
    through it. Equivalent to a plain read when the log is empty."""
    ops = schema_log(path)
    reader = spark.read
    if ops:
        reader = reader.option("mergeSchema", "true")
    return _apply_ops(reader.parquet(path), ops)


def evolved_schema(spark: SparkSession, path: str):
    """The mergeSchema-union PHYSICAL schema of the table's files — what
    a ``readStream`` should be given before :func:`apply_schema_log`
    (the stream reads raw generations; the replay evolves them)."""
    return spark.read.option("mergeSchema", "true").parquet(path).schema


def materialize_schema(
    spark: SparkSession,
    path: str,
    partition_by: list[str] | None = None,
) -> int:
    """Fold the schema log into the data files (the merge that
    ClickHouse would eventually run): rewrite the table through the
    evolved projection, then truncate the log. Plain reads afterwards
    see the evolved schema directly. Returns the number of ops folded.

    Idempotent: with an empty log this is a no-op. ``partition_by``
    re-establishes the table's partition layout (pass the same columns
    the writers use)."""
    ops = schema_log(path)
    if not ops:
        return 0
    # Materialize before overwriting the path being read (compact()'s
    # read-then-overwrite idiom).
    evolved = read_evolved(spark, path).localCheckpoint(eager=True)
    writer = evolved.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    _write_log(path, [])
    return len(ops)
