"""Differential tests for the persisted IVF index (q281/q282 operators):
exhaustive-probe search must be EXACTLY brute force, and the batched
form must agree with the single-query form per qid (no cross-query
contamination through shared probe partitions)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kubenetmon_spark.operators.similarity import (
    build_ivf_index,
    ivf_search,
    ivf_search_many,
)

DIM = 8
N = 120
N_CENTROIDS = 6
N_QUERIES = 5


@pytest.fixture(scope="module")
def ivf_fixture(spark, tmp_path_factory):
    rng = np.random.default_rng(282)
    vecs = rng.normal(size=(N, DIM)).round(3)
    qvecs = rng.normal(size=(N_QUERIES, DIM)).round(3)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(N)],
        "vec_id int, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(j, [float(x) for x in qvecs[j]]) for j in range(N_QUERIES)],
        "qid int, qv array<double>",
    )
    idx = str(tmp_path_factory.mktemp("ivf") / "index")
    build_ivf_index(corpus, idx, n_centroids=N_CENTROIDS)
    return idx, vecs, qvecs, queries


def _brute_topk(vecs, qv, k):
    """Engine-identical reference: sequential-fold double dot, round(.,4),
    ties broken by lowest vec_id."""
    scored = []
    for i in range(len(vecs)):
        acc = 0.0
        for a, b in zip(vecs[i], qv):
            acc += float(a) * float(b)
        scored.append((round(acc, 4), i))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [(i, s) for s, i in scored[:k]]


def test_exhaustive_probe_equals_brute_force(spark, ivf_fixture):
    idx, vecs, qvecs, queries = ivf_fixture
    out = ivf_search_many(spark, idx, queries, k=7, n_probe=N_CENTROIDS)
    got = {}
    for r in out.collect():
        got.setdefault(r.qid, []).append((r.score, r.vec_id))
    for qid in range(N_QUERIES):
        mine = [(i, s) for s, i in sorted(got[qid], key=lambda t: (-t[0], t[1]))]
        assert mine == _brute_topk(vecs, qvecs[qid], 7), f"qid={qid}"


def test_batched_matches_single_query(spark, ivf_fixture):
    idx, vecs, qvecs, queries = ivf_fixture
    many = ivf_search_many(spark, idx, queries, k=5, n_probe=2)
    got = {}
    for r in many.collect():
        got.setdefault(r.qid, set()).add((r.vec_id, r.score))
    for qid in range(N_QUERIES):
        single = ivf_search(
            spark, idx, queries.filter(F.col("qid") == qid).select("qv"),
            k=5, n_probe=2,
        )
        expected = {(r.vec_id, r.score) for r in single.collect()}
        assert got.get(qid, set()) == expected, f"qid={qid}"


def test_partial_probe_is_subset_of_exact(spark, ivf_fixture):
    """Pruned search may lose recall but must never invent a neighbor:
    every (vec_id, score) it returns appears in the exhaustive ranking
    with the same score."""
    idx, vecs, qvecs, queries = ivf_fixture
    out = ivf_search_many(spark, idx, queries, k=7, n_probe=2)
    for r in out.collect():
        exact = dict(
            (i, s) for i, s in _brute_topk(vecs, qvecs[r.qid], N)
        )
        assert exact[r.vec_id] == r.score


class TestIvfIndexAppend:
    def test_append_equals_fresh_build(self, spark, ivf_fixture, tmp_path):
        """build(first half) + append(second half) must answer every
        query exactly like the fresh full-corpus index, for any probe
        width — assignment is a pure function of (vector, centroids)."""
        from kubenetmon_spark.operators.similarity import ivf_index_append

        full_idx, vecs, qvecs, queries = ivf_fixture
        corpus = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(N)],
            "vec_id int, embedding array<double>",
        )
        idx = str(tmp_path / "index")
        build_ivf_index(corpus.filter(F.col("vec_id") < 60), idx, n_centroids=N_CENTROIDS)
        ivf_index_append(spark, idx, corpus.filter(F.col("vec_id") >= 60))
        for n_probe in (1, 3, N_CENTROIDS):
            for j in range(N_QUERIES):
                q = queries.filter(F.col("qid") == j).select("qv")
                got = [
                    (r.vec_id, r.score)
                    for r in ivf_search(spark, idx, q, k=7, n_probe=n_probe).collect()
                ]
                want = [
                    (r.vec_id, r.score)
                    for r in ivf_search(
                        spark, full_idx, q, k=7, n_probe=n_probe
                    ).collect()
                ]
                assert got == want, (j, n_probe)

    def test_append_order_invariance_and_stats(self, spark, ivf_fixture, tmp_path):
        from kubenetmon_spark.operators.similarity import (
            ivf_index_append,
            ivf_index_stats,
        )

        full_idx, vecs, _, _ = ivf_fixture
        corpus = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(N)],
            "vec_id int, embedding array<double>",
        )
        idx = str(tmp_path / "index")
        build_ivf_index(corpus.filter(F.col("vec_id") < 40), idx, n_centroids=N_CENTROIDS)
        # append in two batches, larger ids first: order must not matter
        ivf_index_append(spark, idx, corpus.filter(F.col("vec_id") >= 80))
        ivf_index_append(
            spark, idx, corpus.filter((F.col("vec_id") >= 40) & (F.col("vec_id") < 80))
        )
        got = {
            r.centroid: r.n_vectors for r in ivf_index_stats(spark, idx).collect()
        }
        want = {
            r.centroid: r.n_vectors
            for r in ivf_index_stats(spark, full_idx).collect()
        }
        assert got == want
        assert sum(got.values()) == N


def test_rebuild_with_fewer_centroids_leaves_no_stale_partitions(
    spark, tmp_path
):
    # Regression: the index build is a whole-table overwrite, but the
    # engine's sessions default to DYNAMIC partition overwrite — a
    # rebuild with fewer centroids left the dropped centroids' stale
    # assignment partitions on disk, and every later search kept
    # surfacing their vectors. The build now pins static overwrite.
    import numpy as np

    from kubenetmon_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_stats,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 8))
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id int, embedding array<double>",
    )
    idx = str(tmp_path / "index")
    build_ivf_index(corpus, idx, n_centroids=8)
    build_ivf_index(corpus, idx, n_centroids=3)  # rebuild, coarser
    stats = ivf_index_stats(spark, idx).collect()
    assert {r.centroid for r in stats} <= {0, 1, 2}
    assert sum(r.n_vectors for r in stats) == 60  # no stale rows linger
