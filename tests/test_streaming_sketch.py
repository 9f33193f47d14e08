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


def test_sketch_build_state_is_bounded_pre_shuffle(spark):
    # ADVICE r02: the build must never materialize a whole group in one
    # collect array. The per-partition bottom-k fold runs BEFORE the
    # shuffle, so the rows entering the final per-group collect number
    # at most k x num_partitions — bounded by topology, not group size.
    from kubenetmon_spark.operators.sketch import _partition_bottom_k

    k = 16
    one_group = spark.range(0, 20000, 1, 8).select(
        F.lit("g").alias("typ"),
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 13), 16, 10)
        .cast("long")
        .alias("_h"),
        (F.col("id") % 100).alias("_v"),
    )
    pre = _partition_bottom_k(one_group, ["typ"], k, dedup=False)
    n_pre = pre.count()
    assert n_pre <= k * 8  # bounded: 20k-row group -> <=128 pre-agg rows
    assert n_pre >= k      # at least one full partition's k


def test_bounded_build_states_bit_identical_to_unbounded(spark):
    # the bounded fold must not change the state: compare against a
    # direct unbounded collect_list/collect_set build
    rows = [(i, f"t{i % 3}", f"u{i % 97}", (i * 13) % 500) for i in range(5000)]
    df = spark.createDataFrame(
        rows, "eid long, typ string, user string, v long"
    ).repartition(7)

    got_kmv = {
        r.typ: list(r.kmv_sketch)
        for r in kmv_state(df, ["typ"], "user", k=32).collect()
    }
    want_kmv = {
        r.typ: list(r.s)
        for r in df.select(
            "typ",
            F.conv(F.substring(F.md5(F.col("user").cast("string")), 1, 13), 16, 10)
            .cast("long")
            .alias("_h"),
        )
        .distinct()
        .groupBy("typ")
        .agg(F.slice(F.sort_array(F.collect_set("_h")), 1, 32).alias("s"))
        .collect()
    }
    assert got_kmv == want_kmv

    got_q = {
        r.typ: list(map(tuple, r.q_sample))
        for r in quantile_sample_state(df, ["typ"], "v", "eid", k=32).collect()
    }
    want_q = {
        r.typ: list(map(tuple, r.s))
        for r in df.select(
            "typ",
            F.conv(F.substring(F.md5(F.col("eid").cast("string")), 1, 13), 16, 10)
            .cast("long")
            .alias("_h"),
            F.col("v").alias("_v"),
        )
        .groupBy("typ")
        .agg(
            F.slice(F.sort_array(F.collect_list(F.struct("_h", "_v"))), 1, 32).alias("s")
        )
        .collect()
    }
    assert got_q == want_q


def test_null_group_keys_keep_their_state(spark):
    # Spark groupBy keeps null keys; the per-partition pandas fold must
    # too (pandas groupby drops NaN groups unless dropna=False)
    rows = [(i, None if i % 2 else "t", f"u{i % 50}", i % 100) for i in range(400)]
    df = spark.createDataFrame(
        rows, "eid long, typ string, user string, v long"
    ).repartition(4)
    got = {r.typ for r in kmv_state(df, ["typ"], "user", k=16).collect()}
    assert got == {None, "t"}
    got_q = {
        r.typ
        for r in quantile_sample_state(df, ["typ"], "v", "eid", k=16).collect()
    }
    assert got_q == {None, "t"}


def test_bottom_k_fold_bit_identity_property(spark):
    # hypothesis over the DATA SHAPE: for arbitrary value/key/group
    # distributions and partitionings, the bounded fold must produce
    # byte-identical states to the unbounded build
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 500),        # eid basis (dups possible)
                st.sampled_from(["a", "b", None]),
                st.integers(0, 40),          # user basis
                st.integers(-100, 100),      # value
            ),
            min_size=1,
            max_size=120,
        ),
        st.integers(1, 9),                   # partitions
        st.sampled_from([1, 4, 16]),         # k
    )
    def check(rows, parts, k):
        data = [
            (i * 1000 + eid, typ, f"u{user}", val)
            for i, (eid, typ, user, val) in enumerate(rows)
        ]
        df = spark.createDataFrame(
            data, "eid long, typ string, user string, v long"
        ).repartition(parts)

        got = {
            r.typ: list(r.kmv_sketch)
            for r in kmv_state(df, ["typ"], "user", k=k).collect()
        }
        want = {
            r.typ: list(r.s)
            for r in df.select(
                "typ",
                F.conv(
                    F.substring(F.md5(F.col("user").cast("string")), 1, 13),
                    16,
                    10,
                )
                .cast("long")
                .alias("_h"),
            )
            .distinct()
            .groupBy("typ")
            .agg(F.slice(F.sort_array(F.collect_set("_h")), 1, k).alias("s"))
            .collect()
        }
        assert got == want

    check()
