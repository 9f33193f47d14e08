"""Query-complexity guards: ClickHouse's ``max_rows_to_read`` /
``max_bytes_to_read`` / ``max_result_rows`` / ``result_overflow_mode`` /
``max_execution_time`` settings re-expressed for a Spark engine.

The reference deployment fronts its flow table with ClickHouse, whose
per-query complexity limits (settings/query-complexity surface) are what
stop a runaway dashboard from scanning a year of 100 TB history. A Spark
engine has no built-in equivalent — a bad filter simply launches the
full scan — so this module supplies the same three protection points:

- **Pre-flight scan estimate** (`estimate_scan` / `check_scan_limits`):
  ClickHouse estimates rows/bytes from part-index metadata *before*
  execution and refuses over-limit queries. Here the analogue is the
  parquet FOOTER of the partition-pruned file set: driver-side, bounded
  by file count (not data size — one footer read per file, the same
  O(parts) cost ClickHouse pays), using the identical date-partition
  pruning the scan itself would perform. At 100 TB this is thousands of
  footers, not bytes of fact data.
- **Result-row cap** (`limited_collect(max_result_rows=...)`): fetched
  as ``LIMIT n+1`` so detecting overflow never materializes an
  unbounded result on the driver; ``result_overflow_mode`` mirrors
  ClickHouse's ``throw`` (error) vs ``break`` (truncate to n).
- **Wall-clock cap** (`limited_collect(max_execution_time_s=...)`):
  job-group cancellation (``SparkContext.cancelJobGroup`` with
  ``interruptOnCancel``) — Spark's cooperative kill switch, the
  analogue of ClickHouse killing the query pipeline at the deadline.

Guards compose with the rest of the engine's protection theme
(``jaccard_pairs`` ``max_df`` guard, ``COSINE_EXACT_UNGUARDED_LIMIT``):
the engine refuses predictably-catastrophic work instead of running it.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, Row

from kubenetmon_spark import fs as _fsm


class QueryLimitExceeded(RuntimeError):
    """A query-complexity limit tripped (pre-flight or at runtime)."""


@dataclass(frozen=True)
class ScanEstimate:
    """Pre-flight footprint of a pruned scan, from parquet footers."""

    n_files: int
    n_partitions_scanned: int
    n_partitions_total: int
    rows: int
    bytes_on_disk: int


def _partition_value(part_dir: str) -> str:
    return _fsm.basename(part_dir).split("=", 1)[1]


def estimate_scan(
    path: str,
    *,
    partition_col: str = "date",
    min_value: str | None = None,
    max_value: str | None = None,
    values: list[str] | None = None,
) -> ScanEstimate:
    """Rows/bytes/files a partition-pruned scan would read, WITHOUT
    reading any data: one parquet-footer ``num_rows`` per surviving
    file plus its on-disk size (ClickHouse's ``bytes_on_disk`` notion —
    compressed bytes, the unit its ``max_bytes_to_read`` counts).

    Pruning mirrors the scan: keep ``{partition_col}=v`` directories
    with ``min_value <= v <= max_value`` (string compare — ISO dates
    sort correctly) or ``v in values``. An unpartitioned layout (no
    ``{partition_col}=*`` dirs) is a single pseudo-partition.

    Works on URI-form roots (hdfs/s3a): listing and footer reads go
    through the FS adapter, and footer reads transfer only the byte
    ranges pyarrow seeks to — never the object body.
    """
    import pyarrow.parquet as pq

    fs = _fsm.get_fs(path)
    root = str(path).rstrip("/")
    part_dirs = sorted(
        _fsm.join(root, name)
        for name in (fs.list_names(root) if fs.is_dir(root) else [])
        if name.startswith(f"{partition_col}=")
        and fs.is_dir(_fsm.join(root, name))
    )
    if part_dirs:
        total = len(part_dirs)
        keep = []
        for d in part_dirs:
            v = _partition_value(d)
            if values is not None and v not in values:
                continue
            if min_value is not None and v < min_value:
                continue
            if max_value is not None and v > max_value:
                continue
            keep.append(d)
    else:
        total, keep = 1, [root]

    n_files = rows = nbytes = 0
    for d in keep:
        for f in fs.glob_parquet(d):
            n_files += 1
            with fs.open_seekable(f) as fh:
                rows += pq.ParquetFile(fh).metadata.num_rows
            nbytes += fs.file_size(f)
    return ScanEstimate(
        n_files=n_files,
        n_partitions_scanned=len(keep) if part_dirs else (1 if n_files else 0),
        n_partitions_total=total,
        rows=rows,
        bytes_on_disk=nbytes,
    )


def check_scan_limits(
    path: str,
    *,
    max_rows_to_read: int | None = None,
    max_bytes_to_read: int | None = None,
    partition_col: str = "date",
    min_value: str | None = None,
    max_value: str | None = None,
    values: list[str] | None = None,
) -> ScanEstimate:
    """Pre-flight gate: estimate the pruned scan and refuse over-limit
    queries before a single executor task launches (ClickHouse
    ``max_rows_to_read`` / ``max_bytes_to_read``, default-throw).
    Returns the estimate when within limits."""
    est = estimate_scan(
        path,
        partition_col=partition_col,
        min_value=min_value,
        max_value=max_value,
        values=values,
    )
    if max_rows_to_read is not None and est.rows > max_rows_to_read:
        raise QueryLimitExceeded(
            f"scan would read {est.rows} rows from {est.n_files} files "
            f"({est.n_partitions_scanned}/{est.n_partitions_total} "
            f"partitions), over max_rows_to_read={max_rows_to_read}"
        )
    if max_bytes_to_read is not None and est.bytes_on_disk > max_bytes_to_read:
        raise QueryLimitExceeded(
            f"scan would read {est.bytes_on_disk} bytes on disk, over "
            f"max_bytes_to_read={max_bytes_to_read}"
        )
    return est


def limited_collect(
    df: DataFrame,
    *,
    max_result_rows: int | None = None,
    result_overflow_mode: str = "throw",
    max_execution_time_s: float | None = None,
) -> list[Row]:
    """Collect under ClickHouse-style result/time limits.

    ``max_result_rows`` fetches ``LIMIT n+1`` (overflow detection with a
    bounded driver footprint); on overflow ``result_overflow_mode``
    picks ``'throw'`` (QueryLimitExceeded) or ``'break'`` (return the
    first n, ClickHouse's truncate-and-continue). ``max_execution_time_s``
    runs the job in a job group on a worker thread and cancels the
    group at the deadline — tasks die cooperatively, the session stays
    healthy for the next query."""
    if result_overflow_mode not in ("throw", "break"):
        raise ValueError(f"result_overflow_mode={result_overflow_mode!r}")

    probe = df.limit(max_result_rows + 1) if max_result_rows is not None else df

    if max_execution_time_s is None:
        rows = probe.collect()
    else:
        sc = df.sparkSession.sparkContext
        group = f"guard-{uuid.uuid4().hex}"
        out: list[list[Row]] = []
        err: list[BaseException] = []

        def run() -> None:
            # Job-group properties are thread-local: set INSIDE the
            # worker thread so only this query joins the group.
            sc.setJobGroup(group, "limited_collect", interruptOnCancel=True)
            try:
                out.append(probe.collect())
            except BaseException as e:  # noqa: BLE001 — surfaced below
                err.append(e)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        t.join(max_execution_time_s)
        if t.is_alive():
            sc.cancelJobGroup(group)
            t.join(30)
            raise QueryLimitExceeded(
                f"query exceeded max_execution_time_s={max_execution_time_s}; "
                f"job group {group} cancelled"
            )
        if err:
            raise err[0]
        rows = out[0]

    if max_result_rows is not None and len(rows) > max_result_rows:
        if result_overflow_mode == "throw":
            raise QueryLimitExceeded(
                f"result exceeds max_result_rows={max_result_rows}"
            )
        return rows[:max_result_rows]
    return rows


def check_quota(
    spark,
    log_path: str,
    name: str,
    *,
    window_s: float = 3600.0,
    max_queries: int | None = None,
    max_result_rows: int | None = None,
    now: float | None = None,
) -> dict:
    """ClickHouse quota analogue (``CREATE QUOTA ... FOR INTERVAL 1
    hour MAX queries = N, result_rows = M``): enforce per-principal
    rolling-window limits off the query log (querylog.py's
    ``system.query_log`` table, whose ``name`` column is the
    principal/panel key). Returns the window usage dict when within
    quota; raises QueryLimitExceeded when a subsequent query would
    exceed it.

    The check is one aggregation over the log's recent window — the
    log is one row per query, so this is dashboard-metadata scale, not
    fact scale. Call before ``run_logged`` (the pair is the ClickHouse
    request path: quota check, then execute-and-account).
    """
    import datetime as _dt

    from pyspark.sql import functions as F

    now = time.time() if now is None else now
    cutoff = _dt.datetime.fromtimestamp(
        now - window_s, tz=_dt.timezone.utc
    ).isoformat()
    # Only a log that does not exist yet means zero usage; any OTHER
    # read failure (corrupt file, permissions) must FAIL CLOSED — a
    # quota module that returns zero usage on error silently disables
    # enforcement exactly when the log is being tampered with/broken.
    # The existence probe goes through the FS adapter so URI-form log
    # paths (file:/..., hdfs://, s3a://) stay fail-closed too — a raw
    # os.path.exists would read every URI as "no log" and fail OPEN.
    if not _fsm.get_fs(log_path, spark).exists(log_path):
        return {"queries": 0, "result_rows": 0}
    log = spark.read.parquet(log_path)
    agg = (
        log.filter((F.col("name") == name) & (F.col("started_at") >= cutoff))
        .agg(
            F.count(F.lit(1)).alias("q"),
            F.coalesce(F.sum("n_output_rows"), F.lit(0)).alias("r"),
        )
        .collect()[0]
    )
    usage = {"queries": int(agg.q), "result_rows": int(agg.r)}
    if max_queries is not None and usage["queries"] >= max_queries:
        raise QueryLimitExceeded(
            f"quota: {name} ran {usage['queries']} queries in the last "
            f"{window_s:.0f}s, at/over max_queries={max_queries}"
        )
    if max_result_rows is not None and usage["result_rows"] >= max_result_rows:
        raise QueryLimitExceeded(
            f"quota: {name} produced {usage['result_rows']} result rows "
            f"in the last {window_s:.0f}s, at/over "
            f"max_result_rows={max_result_rows}"
        )
    return usage


class RowPolicies:
    """ClickHouse row policies (``CREATE ROW POLICY ... ON table TO
    user USING expr [AS RESTRICTIVE]``): per-(table, principal)
    row-level security applied as plan-level filters — Catalyst pushes
    them into the scan like any predicate, so policy enforcement rides
    predicate pushdown for free.

    Combination semantics match ClickHouse: PERMISSIVE policies OR
    together (any grants visibility), RESTRICTIVE policies AND on top
    (each must also hold). A table with at least one policy for some
    principal hides ALL rows from principals with no permissive policy
    — the ClickHouse default-deny posture. Tables with no policies are
    unrestricted.
    """

    def __init__(self) -> None:
        self._permissive: dict[tuple[str, str], list[str]] = {}
        self._restrictive: dict[tuple[str, str], list[str]] = {}
        self._tables: set[str] = set()

    def add(
        self,
        table: str,
        principal: str,
        using: str,
        *,
        restrictive: bool = False,
    ) -> "RowPolicies":
        store = self._restrictive if restrictive else self._permissive
        store.setdefault((table, principal), []).append(using)
        self._tables.add(table)
        return self

    def apply(self, df: DataFrame, table: str, principal: str) -> DataFrame:
        """Return ``df`` filtered to what ``principal`` may see of
        ``table``."""
        from pyspark.sql import functions as F

        if table not in self._tables:
            return df
        perm = self._permissive.get((table, principal), [])
        if not perm:
            return df.filter(F.lit(False))  # default deny
        cond = F.expr(" OR ".join(f"({p})" for p in perm))
        for r in self._restrictive.get((table, principal), []):
            cond = cond & F.expr(r)
        return df.filter(cond)


class ColumnPolicies:
    """ClickHouse column-level access (``GRANT SELECT(col, ...) ON
    table TO user`` and column masking): per-(table, principal) column
    grants applied as a plan-level projection — pruned columns never
    leave the scan (Catalyst column pruning), so enforcement is also
    an IO win.

    Semantics: a table with at least one grant for ANY principal is
    protected — principals read only their granted columns; ungranted
    principals get the ClickHouse default-deny (no columns -> error,
    surfaced here as ValueError rather than an empty projection).
    ``mask`` grants keep the column but replace its value (audit
    pipelines that need the shape but not the PII): ``'null'`` nulls
    it, ``'hash'`` replaces with md5 text — deterministic, so joins
    and group-bys on the masked column still work. Tables with no
    policies are unrestricted.
    """

    def __init__(self) -> None:
        self._grants: dict[tuple[str, str], set[str]] = {}
        self._masks: dict[tuple[str, str], dict[str, str]] = {}
        self._tables: set[str] = set()

    def grant(
        self, table: str, principal: str, columns: list[str]
    ) -> "ColumnPolicies":
        self._grants.setdefault((table, principal), set()).update(columns)
        self._tables.add(table)
        return self

    def mask(
        self, table: str, principal: str, column: str, mode: str = "hash"
    ) -> "ColumnPolicies":
        if mode not in ("hash", "null"):
            raise ValueError(f"unknown mask mode {mode!r}")
        self._masks.setdefault((table, principal), {})[column] = mode
        self._tables.add(table)
        return self

    def apply(self, df: DataFrame, table: str, principal: str) -> DataFrame:
        """Project ``df`` down to what ``principal`` may read of
        ``table`` (granted columns as-is, masked columns transformed)."""
        from pyspark.sql import functions as F

        if table not in self._tables:
            return df
        granted = self._grants.get((table, principal), set())
        masks = self._masks.get((table, principal), {})
        if not granted and not masks:
            raise ValueError(
                f"principal {principal!r} has no column grants on "
                f"{table!r} (default deny)"
            )
        cols = []
        for c in df.columns:
            if c in masks:
                if masks[c] == "null":
                    cols.append(
                        F.lit(None).cast(dict(df.dtypes)[c]).alias(c)
                    )
                else:
                    cols.append(F.md5(F.col(c).cast("string")).alias(c))
            elif c in granted:
                cols.append(F.col(c))
        if not cols:
            raise ValueError(
                f"none of {principal!r}'s grants on {table!r} exist in "
                "the DataFrame"
            )
        return df.select(*cols)
