"""Product-quantization tests: trainer quality, encode exactness vs a
NumPy reference, and ADC search recall against brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kubenetmon_spark.operators.pq import pq_encode, pq_topk, pq_train


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(6, 16)) * 3
    rows = []
    vid = 0
    for c in range(6):
        for _ in range(40):
            rows.append((vid, (centers[c] + rng.normal(scale=0.3, size=16)).tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, np.array([r[1] for r in rows])


def test_train_geometry_and_determinism(spark, clustered):
    df, _ = clustered
    books = pq_train(df, m=4, k=8, n_iter=3)
    assert books.shape == (4, 8, 4)
    books2 = pq_train(df, m=4, k=8, n_iter=3)
    # same deterministic init + same data; float partial-sum order may
    # differ but centroids must agree to high precision
    assert np.allclose(books, books2, atol=1e-8)


def test_train_rejects_bad_geometry(spark, clustered):
    df, _ = clustered
    with pytest.raises(ValueError):
        pq_train(df, m=5, k=4, n_iter=1)  # 16 % 5 != 0


def test_training_reduces_quantization_error(spark, clustered):
    df, V = clustered

    def mse(books):
        m, k, dsub = books.shape
        v = V.reshape(len(V), m, dsub)
        tot = 0.0
        for j in range(m):
            d = ((v[:, j, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            tot += d.min(axis=1).sum()
        return tot

    init_books = pq_train(df, m=4, k=8, n_iter=0) if False else None
    e1 = mse(pq_train(df, m=4, k=8, n_iter=1))
    e5 = mse(pq_train(df, m=4, k=8, n_iter=5))
    assert e5 <= e1 + 1e-9


def test_encode_matches_numpy_reference(spark, clustered):
    df, V = clustered
    books = pq_train(df, m=4, k=8, n_iter=3)
    got = {
        r["vec_id"]: r["pq_code"] for r in pq_encode(df, books).collect()
    }
    m, k, dsub = books.shape
    v = V.reshape(len(V), m, dsub)
    for i in range(len(V)):
        expected = [
            int(((v[i, j] - books[j]) ** 2).sum(axis=1).argmin()) for j in range(m)
        ]
        assert got[i] == expected


def test_adc_recall_against_brute_force(spark, clustered):
    df, V = clustered
    books = pq_train(df, m=8, k=16, n_iter=5)
    enc = pq_encode(df, books).persist()
    q = V[7]  # an actual corpus vector's neighborhood
    got = [r["vec_id"] for r in pq_topk(enc, books, q, topk=10).collect()]
    exact = np.argsort(((V - q) ** 2).sum(axis=1))[:10]
    recall = len(set(got) & set(exact.tolist())) / 10
    assert recall >= 0.7, f"ADC recall@10 too low: {recall}"
    enc.unpersist()


def test_adc_distance_matches_reference(spark, clustered):
    df, V = clustered
    books = pq_train(df, m=4, k=8, n_iter=2)
    enc = pq_encode(df, books)
    q = np.zeros(16)
    got = {r["vec_id"]: r["adc_dist"] for r in pq_topk(enc, books, q, topk=240).collect()}
    m, k, dsub = books.shape
    v = V.reshape(len(V), m, dsub)
    qd = q.reshape(m, dsub)
    table = ((books - qd[:, None, :]) ** 2).sum(axis=2)
    for i in range(len(V)):
        codes = [((v[i, j] - books[j]) ** 2).sum(axis=1).argmin() for j in range(m)]
        expected = sum(table[j, codes[j]] for j in range(m))
        assert got[i] == pytest.approx(expected, rel=1e-12)


def test_compression_ratio(spark, clustered):
    df, V = clustered
    books = pq_train(df, m=8, k=16, n_iter=1)
    enc = pq_encode(df, books)
    row = enc.select("pq_code").first()
    assert len(row["pq_code"]) == 8  # 16 floats -> 8 small ints


class TestIVFPQ:
    def test_residual_training_and_search_recall(self, spark, clustered):
        from kubenetmon_spark.operators.clustering import kmeans_fit
        from kubenetmon_spark.operators.pq import ivfpq_topk, pq_train_residual

        df, V = clustered
        coarse = kmeans_fit(df, k=6, n_iter=5)
        books = pq_train_residual(df, coarse, m=8, k=16, n_iter=4)
        q = V[100]
        got = [
            r["vec_id"]
            for r in ivfpq_topk(df, coarse, books, q, topk=10, n_probe=2).collect()
        ]
        exact = np.argsort(((V - q) ** 2).sum(axis=1))[:10].tolist()
        recall = len(set(got) & set(exact)) / 10
        assert recall >= 0.7, f"IVFPQ recall@10 too low: {recall}"

    def test_probe_pruning_restricts_cells(self, spark, clustered):
        from kubenetmon_spark.operators.clustering import kmeans_assign, kmeans_fit
        from kubenetmon_spark.operators.pq import ivfpq_topk, pq_train_residual

        df, V = clustered
        coarse = kmeans_fit(df, k=6, n_iter=5)
        books = pq_train_residual(df, coarse, m=4, k=8, n_iter=2)
        q = V[0]
        # with n_probe=1 every returned id must live in the query's cell
        got = [
            r["vec_id"]
            for r in ivfpq_topk(df, coarse, books, q, topk=20, n_probe=1).collect()
        ]
        cells = {
            r["vec_id"]: r["cluster"]
            for r in kmeans_assign(df, coarse).select("vec_id", "cluster").collect()
        }
        qcell = int(((coarse - q) ** 2).sum(axis=1).argmin())
        assert got and all(cells[i] == qcell for i in got)

    def test_residuals_quantize_tighter_than_raw(self, spark, clustered):
        """The point of residual encoding: same codebook budget, lower
        reconstruction error than raw-vector PQ."""
        from kubenetmon_spark.operators.clustering import kmeans_assign, kmeans_fit
        from kubenetmon_spark.operators.pq import pq_train, pq_train_residual

        df, V = clustered
        coarse = kmeans_fit(df, k=6, n_iter=5)
        raw_books = pq_train(df, m=4, k=8, n_iter=4)
        res_books = pq_train_residual(df, coarse, m=4, k=8, n_iter=4)

        assign = np.array(
            [
                r["cluster"]
                for r in kmeans_assign(df, coarse).orderBy("vec_id").collect()
            ]
        )

        def recon_err(X, books):
            m, k, dsub = books.shape
            x = X.reshape(len(X), m, dsub)
            tot = 0.0
            for j in range(m):
                d = ((x[:, j, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                tot += d.min(axis=1).sum()
            return tot

        raw_err = recon_err(V, raw_books)
        res_err = recon_err(V - coarse[assign], res_books)
        assert res_err < raw_err


def test_null_embeddings_survive_pipeline(spark, clustered):
    # Regression: one NULL embedding crashed every numpy reshape in the
    # PQ family. Train drops it, encode keeps the row with a NULL code,
    # search never scores it.
    df, _ = clustered
    dirty = df.unionByName(
        spark.createDataFrame([(9999, None)], "vec_id long, embedding array<double>")
    )
    books = pq_train(dirty, m=4, k=8, n_iter=2)
    enc = pq_encode(dirty, books)
    rows = {r.vec_id: r.pq_code for r in enc.collect()}
    assert rows[9999] is None
    assert len(rows) == 241 and rows[0] is not None
    q = [0.0] * 16
    top = pq_topk(enc, books, q, topk=5).collect()
    assert 9999 not in {r.vec_id for r in top}
