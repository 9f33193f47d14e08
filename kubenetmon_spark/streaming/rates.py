"""Streaming PromQL rates — the continuous form of
``operators/timeseries.py::promql_to_grid`` (ClickHouse's
``timeSeries*ToGrid`` family), i.e. the live per-pod rate/increase
dashboard the reference deployment actually watches.

Design (the repo's established incremental-foreachBatch shape, like
streaming/topk.py and streaming/dedup.py): the stream carries raw
counter SAMPLES (key, event-time epoch-second, cumulative value);
each micro-batch

1. dedups (key, ts) against a persisted bounded SAMPLE BUFFER
   (max-value wins — retried batches are idempotent),
2. recomputes with the batch operator EXACTLY the grid buckets this
   batch's samples can influence — bucket t depends on samples in
   ``(t - window, t]``, so a sample at s touches buckets
   ``[ceil(s/step), floor((s+window-1)/step)]`` and nothing else
   (late samples that land BETWEEN old samples re-split their pair;
   both fragments' coverage stays inside the touched range), and
3. upserts those bucket partitions (dynamic overwrite) and trims the
   buffer to the retention horizon.

Exactness contract: the output table equals the batch
``promql_to_grid`` over ALL samples for every bucket, PROVIDED each
sample arrives within ``lateness_s`` of the max event time already
seen (default: one full window). Samples later than that are DROPPED
at the door — the watermark semantics of every other stream here —
because their touched buckets' peers may already be trimmed.

Bounded state (the 100 TB question): the buffer keeps only samples
with ``ts > max_seen - (lateness + window + 2*step)`` — a fixed time
span per key, independent of stream length; the recompute cost per
batch is O(batch + buffer slice) with the batch operator's one-pass
plan. Nothing collects to the driver except the batch's min/max
event-time scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kubenetmon_spark import fs as _fsm


def _latest_buffer_version(buffer_path: str, spark=None) -> int:
    """Highest COMMITTED buffer version (``v=N`` dir carrying Spark's
    ``_SUCCESS`` marker), or -1 if none. Versions are never overwritten
    in place — a crash mid-write leaves the previous version intact and
    unreferenced garbage at ``v=N+1`` (no ``_SUCCESS``), so replayed
    batches always recompute from committed state instead of silently
    starting over. A missing/other-error directory is an empty buffer
    ONLY when it genuinely does not exist; read failures of a committed
    version propagate (a quota/exactness component must fail loud, not
    reset state). Listing goes through the FS adapter, so URI-form
    buffer roots (hdfs/s3a) behave identically."""
    fs = _fsm.get_fs(buffer_path, spark)
    if not fs.is_dir(buffer_path):
        return -1
    best = -1
    for name in fs.list_names(buffer_path):
        if name.startswith("v=") and fs.is_file(
            _fsm.join(buffer_path, name, "_SUCCESS")
        ):
            try:
                best = max(best, int(name[2:]))
            except ValueError:
                continue
    return best


def read_buffer(spark: SparkSession, buffer_path: str) -> DataFrame | None:
    """The latest committed sample buffer, or None before the first
    batch. (The buffer root holds versioned ``v=N`` subdirs — read
    through this helper, not the root.)

    Concurrent-prune tolerance: the stream retains one superseded
    version behind the latest, but a monitoring read that resolved
    version N can still lose a slow scan to two back-to-back batch
    turnovers — on read failure, re-resolve the latest version once
    and retry before propagating."""
    v = _latest_buffer_version(buffer_path, spark)
    if v < 0:
        return None
    try:
        df = spark.read.parquet(_fsm.join(buffer_path, f"v={v}"))
        df.schema  # force plan resolution while the version exists
        return df
    except Exception:
        v2 = _latest_buffer_version(buffer_path, spark)
        if v2 == v:
            raise  # not a turnover race: fail loud (committed state)
        return spark.read.parquet(_fsm.join(buffer_path, f"v={v2}"))


def start_rates_stream(
    stream: DataFrame,
    out_path: str,
    buffer_path: str,
    checkpoint: str,
    key_cols: list[str],
    ts_col: str = "ts_s",
    value_col: str = "v",
    step_s: int = 60,
    window_s: int = 300,
    lateness_s: int | None = None,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Continuously evaluate resample/delta/increase/rate/irate grid
    buckets from a stream of counter samples. ``ts_col`` is an
    epoch-second BIGINT event time; duplicate (key, ts) samples
    collapse to the max value (idempotent retries)."""
    from kubenetmon_spark.operators.timeseries import promql_to_grid

    step, win = int(step_s), int(window_s)
    late = int(lateness_s) if lateness_s is not None else win
    retain = late + win + 2 * step

    def upsert(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        b = batch.select(
            *key_cols,
            F.col(ts_col).cast("long").alias("_ts"),
            F.col(value_col).cast("long").alias("_v"),
        )
        prev_v = _latest_buffer_version(buffer_path, spark)
        buf = (
            spark.read.parquet(_fsm.join(buffer_path, f"v={prev_v}"))
            if prev_v >= 0
            else None
        )
        prev_max = None
        if buf is not None:
            # The committed version's max event time is exact driver
            # knowledge at commit time (max_seen below) — read it from
            # the version's sidecar instead of launching a scan+agg job
            # per batch; fall back to the agg for buffers written before
            # the sidecar existed (or if the sidecar write was lost).
            fs0 = _fsm.get_fs(buffer_path, spark)
            meta_p = _fsm.join(buffer_path, f"v={prev_v}", "_meta.json")
            try:
                prev_max = fs0.read_json(meta_p).get("max_ts")
            except Exception:
                prev_max = None
            if prev_max is None:
                prev_max = buf.agg(F.max("_ts").alias("m")).collect()[0]["m"]
            if prev_max is not None:
                b = b.filter(F.col("_ts") > prev_max - late)
        merged_plan = (
            (buf.unionByName(b) if buf is not None else b)
            .groupBy(*key_cols, "_ts")
            .agg(F.max("_v").alias("_v"))
        )

        def _grid_over(src: DataFrame) -> DataFrame:
            return promql_to_grid(
                src.select(
                    *key_cols,
                    F.col("_ts").alias(ts_col),
                    F.col("_v").alias(value_col),
                ),
                key_cols,
                ts_col,
                value_col,
                start_s=t_lo,
                n_buckets=n,
                step_s=step,
                window_s=win,
            )

        def _write_buffer(merged: DataFrame) -> None:
            # merged's max is max(buffer max, this batch's hi) — known
            # on the driver already, no extra job over merged.
            # Runs AFTER the grid commit, always: a crash that commits
            # the new buffer version but not the grid would make the
            # replayed batch's prev_max filter drop its own samples.
            max_seen = (
                lohi["hi"]
                if prev_max is None
                else max(prev_max, lohi["hi"])
            )
            # Durable buffer turnover: write a NEW version, never
            # overwrite the one just read — a crash mid-write leaves
            # prev_v committed, so the checkpoint's replay recomputes
            # from real state (the groupBy-max merge is idempotent, so
            # a replay after a crash that DID commit also converges).
            # Prune versions BELOW new_v-1 after the commit: the
            # immediately superseded version survives one turnover so
            # a concurrent monitoring read (read_buffer /
            # tools/rates_scale.py) that resolved it just before this
            # commit is not rmtree'd mid-scan. A crash between write
            # and prune leaves harmless stale versions below the new
            # maximum.
            fs = _fsm.get_fs(buffer_path, spark)
            new_v = prev_v + 1
            # The buffer is bounded state (fixed time span per key) —
            # don't let it inherit the merge shuffle's partition count
            # as its file count (32 tiny files per version locally,
            # re-listed and re-opened every batch). One output file
            # per 32 merge partitions keeps files big at any scale;
            # coalesce, not repartition, so no extra shuffle.
            n_parts = max(1, merged.rdd.getNumPartitions() // 32)
            (
                merged.filter(F.col("_ts") > max_seen - retain)
                .coalesce(n_parts)
                .write.mode("overwrite")
                .parquet(_fsm.join(buffer_path, f"v={new_v}"))
            )
            # Sidecar AFTER the parquet commit: the version only
            # becomes the latest once _SUCCESS exists, and readers
            # fall back to a scan+agg if the sidecar is missing —
            # never trusted blindly.
            fs.write_json_atomic(
                _fsm.join(buffer_path, f"v={new_v}", "_meta.json"),
                {"max_ts": int(max_seen)},
            )
            for name in fs.list_names(buffer_path):
                if not name.startswith("v="):
                    continue
                try:
                    v_num = int(name[2:])
                except ValueError:
                    continue
                if v_num < new_v - 1:
                    fs.delete_dir(_fsm.join(buffer_path, name))

        # Overlap the two independent job chains (guide §2.6, disjoint
        # inputs): the merged-buffer materialization reads (buffer v
        # dir, batch files) while the lohi probe + keep_old staging
        # below read (batch files, the prev grid table). The thread is
        # joined before anything consumes `merged`, and the staging
        # still commits durably BEFORE the grid overwrite — the crash
        # contract is unchanged.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as _pool:
            _fut_merged = _pool.submit(
                lambda: merged_plan.localCheckpoint(eager=True)
            )
            # one scalar agg doubles as the emptiness probe (replaces
            # two take(1) jobs) and feeds the touched-bucket range
            lohi = b.agg(
                F.min("_ts").alias("lo"), F.max("_ts").alias("hi")
            ).collect()[0]
            if lohi["lo"] is None:
                return
            t_lo = -(-lohi["lo"] // step) * step  # first bucket >= lo
            t_hi = ((lohi["hi"] + win - 1) // step) * step
            n = (t_hi - t_lo) // step + 1
            if n <= 0:
                merged = _fut_merged.result()
                _write_buffer(merged)
                return
            # schema-only build against the UNCHECKPOINTED plan
            # (analysis, no job) — the staging needs grid.columns
            # before the checkpoint thread joins; the executed grid
            # below is rebuilt over the checkpointed frame
            grid = _grid_over(merged_plan)
            # Partition the output by UTC DAY, not by bucket: dynamic
            # partition overwrite pays a driver-side commit per
            # partition dir, and a per-bucket layout meant hundreds of
            # commits per batch (measured 11s of a 15s q315 batch at
            # sf0.1, 721 hourly dirs — guide §6 small files/commit
            # cost). Day is the ClickHouse-standard partition unit.
            # Upsert is copy-on-write within the touched days: the
            # batch recomputed buckets [t_lo, t_hi]; rows of the
            # touched days OUTSIDE that range are read back (bounded:
            # keys x buckets-per-day per day, partition-pruned) and
            # rewritten verbatim alongside the fresh grid. Buckets
            # never lose rows (samples only accumulate), so untouched
            # days and un-recomputed buckets are byte-stable.
            d_lo, d_hi = t_lo // 86400, t_hi // 86400
            keep_old = None
            # read_state_or_none below, not a bare read: a crashed
            # FIRST grid write leaves out_path holding only _temporary
            # — the replayed batch must see "no committed grid yet",
            # not die on schema inference (streaming/state.py's
            # documented distinction).
            from kubenetmon_spark.streaming.state import read_state_or_none

            stage = _fsm.join(out_path, "_keep_stage", f"batch={batch_id}")
            fsg = _fsm.get_fs(out_path, spark)
            # The keep_old slice is UNRECOVERABLE once the dynamic
            # overwrite has deleted its partitions (its source samples
            # aged out of the buffer), and the overwrite commit is not
            # atomic: a crash between partition delete and publish
            # would lose those buckets for good (ADVICE r07). So the
            # slice is STAGED DURABLY before the overwrite — under
            # ``_keep_stage/batch=N`` inside the grid dir (underscore
            # prefix: invisible to parquet readers, untouched by the
            # dynamic overwrite) — and the overwrite reads it back
            # from the stage. A replayed batch that finds its own
            # committed stage reuses it VERBATIM and FIRST — before
            # even looking at the (possibly partially-deleted) grid —
            # so recovery holds whatever state the crashed commit
            # left, including every touched day dir gone.
            if fsg.is_file(_fsm.join(stage, "_SUCCESS")):
                keep_old = spark.read.parquet(stage)
            else:
                prev = read_state_or_none(spark, out_path)
                if prev is not None:
                    if "bucket_day" not in prev.columns:
                        raise RuntimeError(
                            f"rates table at {out_path} uses the legacy "
                            "per-bucket partition layout; rebuild it (drop "
                            "the directory and replay the checkpoint) "
                            "before resuming with the day-partitioned sink"
                        )
                    (
                        prev.filter(
                            F.col("bucket_day").between(d_lo, d_hi)
                            & (
                                (F.col("bucket_ts") < t_lo)
                                | (F.col("bucket_ts") > t_hi)
                            )
                        )
                        .select(*grid.columns)
                        .write.mode("overwrite")
                        .parquet(stage)
                    )
                    keep_old = spark.read.parquet(stage)
            # join the overlapped materialization; the grid that
            # EXECUTES reads the checkpointed frame (same schema as the
            # plan the staging used)
            merged = _fut_merged.result()
            grid = _grid_over(merged)
            out = grid if keep_old is None else grid.unionByName(keep_old)
            # exact floor division (pmod >= 0), matching the driver's
            # Python `//` for any sign of bucket_ts
            day = F.expr(
                "(bucket_ts - pmod(bucket_ts, 86400)) div 86400"
            ).alias("bucket_day")
            (
                out.withColumn("bucket_day", day)
                # cluster by day so each task owns whole day dirs —
                # one file per touched day, not tasks x days
                .repartition(F.col("bucket_day"))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket_day")
                .parquet(out_path)
            )
            # grid committed: the stages are transient per-batch state
            # (a replayed batch re-stages), so drop them all
            stage_root = _fsm.join(out_path, "_keep_stage")
            if fsg.is_dir(stage_root):
                fsg.delete_dir(stage_root)
            _write_buffer(merged)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_rates(spark: SparkSession, out_path: str) -> DataFrame:
    """The grid table with its storage partition column dropped and
    ``bucket_ts`` last — the exact column set and order the per-bucket
    layout's readers always saw."""
    df = spark.read.parquet(out_path)
    cols = [c for c in df.columns if c not in ("bucket_day", "bucket_ts")]
    return df.select(*cols, "bucket_ts")
