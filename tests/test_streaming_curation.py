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
