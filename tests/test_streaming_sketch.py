"""Mergeable sketch states under micro-batching: a stream appends
per-batch KMV / quantile-sample states; merging ALL the appended states
must equal the one-shot batch answer bit-for-bit — the
AggregatingMergeTree -State/-Merge contract surviving arbitrary batch
boundaries (each batch contributes a partial state; union = global
because bottom-k of unions of bottom-ks is the global bottom-k)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kubenetmon_spark.operators.sketch import (
    kmv_merge,
    kmv_state,
    quantile_merge,
    quantile_sample_state,
)


@pytest.fixture()
def event_files(spark, tmp_path):
    rows = [
        (i, f"t{i % 3}", f"u{i % 137}", (i * 37) % 1000) for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "eid long, typ string, user string, v long")
    src = str(tmp_path / "events_in")
    df.repartition(6).write.mode("overwrite").parquet(src)
    return src, df


def _run_stream(spark, src, tmp_path, state_fn, out_name):
    out = str(tmp_path / out_name)
    ckpt = str(tmp_path / f"ckpt_{out_name}")
    stream = (
        spark.readStream.schema("eid long, typ string, user string, v long")
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src)
    )

    def process(batch_df, batch_id):
        state_fn(batch_df).write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out)


def test_streamed_kmv_states_merge_to_batch_answer(spark, event_files, tmp_path):
    src, df = event_files
    states = _run_stream(
        spark, src, tmp_path,
        lambda b: kmv_state(b, ["typ"], "user", k=64), "kmv_states",
    )
    assert states.count() >= 6  # one state row per (batch, typ)
    streamed = {
        r.typ: r.n_distinct_est
        for r in kmv_merge(states, ["typ"], k=64).collect()
    }
    batch = {
        r.typ: r.n_distinct_est
        for r in kmv_merge(kmv_state(df, ["typ"], "user", k=64), ["typ"], k=64).collect()
    }
    assert streamed == batch


def test_streamed_quantile_states_merge_to_batch_answer(spark, event_files, tmp_path):
    src, df = event_files
    states = _run_stream(
        spark, src, tmp_path,
        lambda b: quantile_sample_state(b, ["typ"], "v", "eid", k=64),
        "q_states",
    )
    streamed = {
        r.typ: (r.n_sample, r.p50, r.p90)
        for r in quantile_merge(states, ["typ"], [50, 90], k=64).collect()
    }
    batch = {
        r.typ: (r.n_sample, r.p50, r.p90)
        for r in quantile_merge(
            quantile_sample_state(df, ["typ"], "v", "eid", k=64),
            ["typ"], [50, 90], k=64,
        ).collect()
    }
    assert streamed == batch
