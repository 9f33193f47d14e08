"""Incremental embedding (cosine) dedup: engine vs a sequential Python
spec of the survivor-index rules, batch and streamed.

The spec runs at threshold_bp=10000 (exact-direction duplicates), where
the sign-LSH candidate stage has provably total recall — parallel
vectors agree on every hyperplane sign, hence on every band key — so
the engine's banded pipeline must reproduce the all-pairs spec exactly
(the same argument that oracle-pairs gate q285/q273)."""

from __future__ import annotations

import math
import os
import time

from kubenetmon_spark.operators.similarity import cosine_dedup_incremental

T = 10000


def _cos_bp(a: list[float], b: list[float]) -> int:
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return int(round(dot / (na * nb), 4) * 10000)


def _spec(batches: list[list[tuple[int, list[float]]]]) -> list[int]:
    """sequential survivor-index spec: dropped iff exact cosine >= T vs
    any kept index doc, or vs any smaller-id doc within the own batch."""
    kept: dict[int, list[float]] = {}
    for batch in batches:
        vs = dict(batch)
        ids = sorted(vs)
        dropped = {
            i
            for i in ids
            if any(_cos_bp(vs[i], kv) >= T for kv in kept.values())
            or any(_cos_bp(vs[i], vs[j]) >= T for j in ids if j < i)
        }
        kept.update({i: vs[i] for i in ids if i not in dropped})
    return sorted(kept)


V1 = [1.0, 2.0, -1.0, 0.5]
V3 = [2.0, -1.0, 0.0, 0.0]  # orthogonal-ish to V1
V7 = [-0.5, 0.25, 3.0, 1.0]
V11 = [0.0, 0.0, 1.0, -4.0]

BATCH1 = [
    (1, V1),
    (2, [2.0 * x for x in V1]),  # same direction as 1: in-batch drop
    (3, V3),
    (4, V1),                     # exact dup of 1: in-batch drop
    (5, [1.0, 1.0, 1.0, 1.0]),
]
BATCH2 = [
    (6, [0.5 * x for x in V1]),  # cross-batch dup of kept 1
    (7, V7),
    (8, [-x for x in V1]),       # cosine -1 to 1: must SURVIVE
    (9, [3.0 * x for x in V7]),  # in-batch dup of 7
]
BATCH3 = [
    (10, V7),                    # cross-batch dup of kept 7
    (11, V11),
]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_batch_incremental_matches_spec(spark):
    want12 = _spec([BATCH1, BATCH2])
    s1, b1, v1 = cosine_dedup_incremental(
        _df(spark, BATCH1), None, None, threshold_bp=T
    )
    s2, _, _ = cosine_dedup_incremental(
        _df(spark, BATCH2), b1, v1, threshold_bp=T
    )
    got = sorted(
        [r.vec_id for r in s1.collect()] + [r.vec_id for r in s2.collect()]
    )
    assert got == want12
    # sanity on the fixture: it exercises every rule
    assert 2 not in got and 4 not in got  # within-batch scaled + exact dup
    assert 6 not in got                    # cross-batch dup vs index
    assert 9 not in got                    # within-batch-2 scaled dup
    assert 8 in got                        # antipodal direction survives


def test_index_deltas_are_survivors_only(spark):
    s1, b1, v1 = cosine_dedup_incremental(
        _df(spark, BATCH1), None, None, threshold_bp=T
    )
    surv = {r.vec_id for r in s1.collect()}
    assert {r._id for r in v1.collect()} == surv
    assert {r._id for r in b1.collect()} == surv


def test_streaming_cosine_dedup_matches_spec(spark, tmp_path):
    from kubenetmon_spark.streaming.curation import start_cosine_dedup_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    base = time.time()

    def write(rows, mtime):
        _df(spark, rows).coalesce(1).write.mode("append").parquet(src)
        for root, _, files in os.walk(src):
            for f in files:
                p = os.path.join(root, f)
                if os.path.getmtime(p) > mtime:
                    os.utime(p, (mtime, mtime))

    def run():
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = start_cosine_dedup_stream(
            stream, out, idx, ckpt,
            threshold_bp=T, trigger={"availableNow": True},
        )
        q.awaitTermination(300)

    write(BATCH1, base - 300)
    write(BATCH2, base - 200)
    run()
    got = sorted(r.vec_id for r in spark.read.parquet(out).collect())
    assert got == _spec([BATCH1, BATCH2])

    # restart with the same checkpoint: only the new file is processed
    write(BATCH3, base - 100)
    run()
    got = sorted(r.vec_id for r in spark.read.parquet(out).collect())
    assert got == _spec([BATCH1, BATCH2, BATCH3])
    assert 10 not in got and 11 in got


def test_empty_batch(spark):
    empty = _df(spark, []).limit(0)
    s, b, v = cosine_dedup_incremental(empty, None, None, threshold_bp=T)
    assert s.count() == 0 and b.count() == 0 and v.count() == 0


def test_zero_vectors_survive(spark):
    """Zero-norm vectors make cosine NaN; NaN >= threshold is false in
    both engines, so zero vectors always survive (and never match each
    other) — the documented degenerate-input behavior."""
    rows = [(1, [0.0, 0.0, 0.0, 0.0]), (2, [0.0, 0.0, 0.0, 0.0]), (3, V1)]
    s, b, v = cosine_dedup_incremental(
        _df(spark, rows), None, None, threshold_bp=T
    )
    assert sorted(r.vec_id for r in s.collect()) == [1, 2, 3]
