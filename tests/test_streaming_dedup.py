"""Row-level streaming dedup (dropDuplicatesWithinWatermark) and
watermarked stream-stream interval joins — both drained with availableNow
file streams and compared against their batch-computed answers."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from kubenetmon_spark.streaming.dedup import (
    dedup_within_watermark,
    interval_join_streams,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _drain(df, name, timeout=300):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    return name


def test_dedup_drops_redelivered_rows(spark, tmp_path):
    """The same (flow key, collection_time) delivered in three different
    files (= three micro-batches at maxFilesPerTrigger=1) must come out
    once; a genuinely new reading of the same flow (later
    collection_time) must survive."""
    rows_by_file = [
        # file 1: two flows at t0
        [("f1", T0, 100), ("f2", T0, 7)],
        # file 2: f1@t0 re-delivered (dup), f1@t0+5s is a NEW reading
        [("f1", T0, 100), ("f1", T0 + timedelta(seconds=5), 110)],
        # file 3: both earlier deliveries replayed again
        [("f1", T0, 100), ("f2", T0, 7)],
    ]
    src = tmp_path / "src"
    for i, rows in enumerate(rows_by_file):
        spark.createDataFrame(
            rows, "flow_id string, collection_time timestamp, bytes long"
        ).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema("flow_id string, collection_time timestamp, bytes long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    deduped = dedup_within_watermark(
        stream, ["flow_id"], event_time_col="collection_time", delay="10 minutes"
    )
    table = _drain(deduped, "dedup_out")
    got = sorted(
        (r.flow_id, r.collection_time, r.bytes)
        for r in spark.sql(f"SELECT * FROM {table}").collect()
    )
    assert got == [
        ("f1", T0, 100),
        ("f1", T0 + timedelta(seconds=5), 110),
        ("f2", T0, 7),
    ]


def test_dedup_is_noop_on_unique_rows(spark, tmp_path):
    src = tmp_path / "uniq"
    rows = [(f"f{i}", T0 + timedelta(seconds=i), i) for i in range(20)]
    spark.createDataFrame(
        rows, "flow_id string, collection_time timestamp, bytes long"
    ).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(
        "flow_id string, collection_time timestamp, bytes long"
    ).parquet(str(src))
    table = _drain(dedup_within_watermark(stream, ["flow_id"]), "dedup_uniq")
    assert spark.sql(f"SELECT COUNT(*) FROM {table}").collect()[0][0] == 20


def test_interval_join_matches_batch_join(spark, tmp_path):
    """Out-direction observations paired with their in-direction twin on
    the same flow within [0, 2 minutes]. The streamed answer must equal
    the identical batch join."""
    out_rows = [
        ("fA", T0, 1000),
        ("fB", T0 + timedelta(minutes=1), 50),
        ("fC", T0 + timedelta(minutes=2), 9),  # twin arrives too late
        ("fD", T0 + timedelta(minutes=3), 77),  # no twin at all
    ]
    in_rows = [
        ("fA", T0 + timedelta(seconds=30), 2000),
        ("fB", T0 + timedelta(minutes=2), 60),
        ("fC", T0 + timedelta(minutes=5), 11),  # outside the bound
        ("fE", T0, 5),  # no out side
    ]
    out_schema = "out_flow string, out_time timestamp, out_bytes long"
    in_schema = "in_flow string, in_time timestamp, in_bytes long"
    out_dir, in_dir = tmp_path / "out", tmp_path / "in"
    spark.createDataFrame(out_rows, out_schema).write.parquet(str(out_dir))
    spark.createDataFrame(in_rows, in_schema).write.parquet(str(in_dir))

    out_s = spark.readStream.schema(out_schema).parquet(str(out_dir))
    in_s = spark.readStream.schema(in_schema).parquet(str(in_dir))
    joined = interval_join_streams(
        out_s,
        in_s,
        equi_keys=[("out_flow", "in_flow")],
        left_time="out_time",
        right_time="in_time",
        lower="INTERVAL 0 SECONDS",
        upper="INTERVAL 2 MINUTES",
        watermark_delay="10 minutes",
    )
    table = _drain(joined, "sjoin_out")
    got = sorted(
        (r.out_flow, r.out_bytes, r.in_bytes)
        for r in spark.sql(f"SELECT * FROM {table}").collect()
    )

    out_b = spark.createDataFrame(out_rows, out_schema)
    in_b = spark.createDataFrame(in_rows, in_schema)
    expected = sorted(
        (r.out_flow, r.out_bytes, r.in_bytes)
        for r in out_b.join(
            in_b,
            (out_b["out_flow"] == in_b["in_flow"])
            & (in_b["in_time"] >= out_b["out_time"])
            & (in_b["in_time"] <= out_b["out_time"] + F.expr("INTERVAL 2 MINUTES")),
        ).collect()
    )
    assert got == expected == [("fA", 1000, 2000), ("fB", 50, 60)]


def test_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    """left_outer: out-rows with no in-twin inside the bound must appear
    null-padded once the watermark clears their interval. availableNow
    drains advance the watermark past all data, so every unmatched row
    is final by termination."""
    out_rows = [("fA", T0, 1), ("fZ", T0, 2)]
    in_rows = [("fA", T0 + timedelta(seconds=10), 3)]
    # Null-padded rows emit only once the GLOBAL watermark (min over both
    # sources) clears left_time + upper. Sentinel rows an hour ahead, in a
    # second file per stream (a later micro-batch), advance it; without
    # them an availableNow drain ends with fZ's interval still open and
    # the unmatched row unemitted — that is the documented semantics, not
    # data loss.
    flush_t = T0 + timedelta(hours=1)
    out_schema = "out_flow string, out_time timestamp, out_bytes long"
    in_schema = "in_flow string, in_time timestamp, in_bytes long"
    out_dir, in_dir = tmp_path / "out", tmp_path / "in"
    spark.createDataFrame(out_rows, out_schema).coalesce(1).write.parquet(str(out_dir))
    spark.createDataFrame(in_rows, in_schema).coalesce(1).write.parquet(str(in_dir))
    spark.createDataFrame([("_flush", flush_t, 0)], out_schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(out_dir))
    spark.createDataFrame([("_flush", flush_t, 0)], in_schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    joined = interval_join_streams(
        spark.readStream.schema(out_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(out_dir)),
        spark.readStream.schema(in_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir)),
        equi_keys=[("out_flow", "in_flow")],
        left_time="out_time",
        right_time="in_time",
        upper="INTERVAL 1 MINUTE",
        watermark_delay="0 seconds",
        how="left_outer",
    )
    table = _drain(joined, "sjoin_outer")
    got = sorted(
        (r.out_flow, r.in_bytes)
        for r in spark.sql(f"SELECT * FROM {table}").collect()
        if not r.out_flow.startswith("_flush")
    )
    assert got == [("fA", 3), ("fZ", None)]
