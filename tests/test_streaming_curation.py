"""Streaming incremental-dedup harness: multi-batch == one batch, and
the index survives restarts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kubenetmon_spark.operators.curation import dedup_lines
from kubenetmon_spark.streaming.curation import start_incremental_dedup_stream

DOCS = [
    (1, "banner\nalpha"),
    (2, "banner\nbeta"),
    (3, "alpha\ngamma"),
    (4, "gamma\ndelta\nbanner"),
]


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_streaming_matches_whole_corpus_dedup(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, src, DOCS[:2])
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = start_incremental_dedup_stream(
        stream, out, idx, ckpt, trigger={"availableNow": True}
    )
    q.awaitTermination(300)

    # second increment, separate run (restart path)
    _write_batch(spark, src, DOCS[2:])
    stream2 = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q2 = start_incremental_dedup_stream(
        stream2, out, idx, ckpt, trigger={"availableNow": True}
    )
    q2.awaitTermination(300)

    whole = {
        r.doc_id: (r.dedup_text, r.n_lines, r.n_kept)
        for r in dedup_lines(
            spark.createDataFrame(DOCS, ["doc_id", "text"]), "doc_id"
        ).collect()
    }
    got = {
        r.doc_id: (r.dedup_text, r.n_lines, r.n_kept)
        for r in spark.read.parquet(out).collect()
    }
    assert got == whole
    # index holds every distinct surviving line exactly once
    lines = [r.line for r in spark.read.parquet(idx).collect()]
    assert sorted(lines) == ["alpha", "banner", "beta", "delta", "gamma"]


def test_fold_bounds_index_dirs_across_many_batches(spark, tmp_path):
    """VERDICT r07 #4: with folding, the index listing stays O(1) in
    batch count. 12 single-doc batches with fold_every=3 must end with
    at most (fold_every + 1) live _bid dirs, a manifest, and EXACTLY
    the same dedup output and index content as the unfolded run."""
    import os

    from kubenetmon_spark.operators.curation import dedup_lines

    docs = [(i, f"common\nuniq{i}") for i in range(12)]
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    for d in docs:
        _write_batch(spark, src, [d])
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = start_incremental_dedup_stream(
        stream, out, idx, str(tmp_path / "ckpt"),
        trigger={"availableNow": True}, fold_every=3,
    )
    q.awaitTermination(300)

    bid_dirs = [n for n in os.listdir(idx) if n.startswith("_bid=")]
    assert len(bid_dirs) <= 4, bid_dirs  # fold_every + 1 fold dir
    assert any(n.startswith("_bid=-") for n in bid_dirs)  # folded gen
    assert os.path.isfile(f"{idx}/_state_manifest.json")

    whole = {
        r.doc_id: (r.dedup_text, r.n_lines, r.n_kept)
        for r in dedup_lines(
            spark.createDataFrame(docs, ["doc_id", "text"]), "doc_id"
        ).collect()
    }
    got = {
        r.doc_id: (r.dedup_text, r.n_lines, r.n_kept)
        for r in spark.read.parquet(out).collect()
    }
    assert got == whole
    lines = [r.line for r in spark.read.parquet(idx).collect()]
    assert sorted(lines) == sorted(
        ["common"] + [f"uniq{i}" for i in range(12)]
    )


def test_fold_survives_restart_and_crashed_fold_is_invisible(
    spark, tmp_path
):
    """A fold generation dir WITHOUT its manifest entry (crash between
    fold write and manifest commit) must be ignored by readers, and a
    restarted stream must keep deduping correctly against folded
    history."""
    from kubenetmon_spark.operators.curation import dedup_lines
    from kubenetmon_spark.streaming.state import read_batch_state

    docs1 = [(i, f"common\nuniq{i}") for i in range(6)]
    docs2 = [(i + 6, f"common\nuniq{i + 6}\nuniq{i}") for i in range(3)]
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    for d in docs1:
        _write_batch(spark, src, [d])

    def run():
        stream = spark.readStream.schema(
            "doc_id long, text string"
        ).option("maxFilesPerTrigger", "1").parquet(src)
        q = start_incremental_dedup_stream(
            stream, out, idx, ckpt,
            trigger={"availableNow": True}, fold_every=3,
        )
        q.awaitTermination(300)

    run()
    # simulate a crashed NEXT fold: a stale generation dir with no
    # manifest entry — readers must not see its (duplicate) rows
    import json

    man = json.load(open(f"{idx}/_state_manifest.json"))
    stale_gen = man["fold_gen"] + 1
    spark.createDataFrame(
        [("common",), ("poison-line",)], "line string"
    ).write.mode("overwrite").parquet(f"{idx}/_bid=-{stale_gen}")
    state = read_batch_state(spark, idx)
    lines = [r.line for r in state.collect()]
    assert "poison-line" not in lines
    assert sorted(set(lines)) == sorted(
        ["common"] + [f"uniq{i}" for i in range(6)]
    )

    # restart with more docs: dedup against folded history still exact
    for d in docs2:
        _write_batch(spark, src, [d])
    run()
    whole = {
        r.doc_id: (r.dedup_text, r.n_lines, r.n_kept)
        for r in dedup_lines(
            spark.createDataFrame(docs1 + docs2, ["doc_id", "text"]),
            "doc_id",
        ).collect()
    }
    got = {
        r.doc_id: (r.dedup_text, r.n_lines, r.n_kept)
        for r in spark.read.parquet(out).collect()
    }
    assert got == whole
