"""Product quantization (PQ) for embedding search at the 100 TB scale.

IVF (`similarity.ivf_topk`) prunes WHICH vectors a query scans; int8
quantization (`similarity.quantize_embeddings`) shrinks them 4x. PQ
(Jegou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011) is the third standard lever: split each d-dim vector into
``m`` subvectors, vector-quantize each subspace against its own k-entry
codebook, and store only the m code indices — 64 floats (256 B) become
m=8 bytes, a 32x cut, while distances remain computable directly on the
codes via ADC (asymmetric distance computation: one (m, k) lookup table
per query, then m table lookups + adds per row).

Spark shapes, sized for 1000 executors:

- **Training** is Lloyd's over ALL m subspaces in one pass: per
  iteration, one Arrow scan emits (subspace, cluster) partial sums; one
  m*k-row shuffle reduces them; only m*k*dsub scalars reach the driver.
  Iteration cost is scan-bound and independent of m.
- **Encoding** is a shuffle-free Arrow projection against the broadcast
  codebooks; the code column is what lands at rest (the raw embedding
  column can be dropped or tiered to cold storage).
- **Search** never touches raw vectors: broadcast the query's ADC table,
  one Arrow scan over codes, one k-row sort. Compose with IVF cluster
  partition-pruning for the full FAISS-style IVFPQ layout.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def _check_geometry(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    return dim // m


def pq_train(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train per-subspace codebooks; returns a (m, k, dim/m) array.

    Deterministic init: the k lowest-id vectors, sliced per subspace
    (same convention as ``clustering.kmeans_fit``). Empty clusters keep
    their previous centroid. One scan + one m*k-row shuffle per
    iteration, regardless of m.

    NULL embeddings are dropped before training (one degenerate crawl
    row must not kill the whole fit — the sign-LSH convention in
    operators/similarity.py).
    """
    vectors = vectors.filter(F.col(vec_col).isNotNull())
    first = (
        vectors.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    if len(first) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(first)}")
    dim = len(first[0][1])
    dsub = _check_geometry(dim, m)
    books = np.stack(
        [
            np.array([list(r[1]) for r in first], dtype=np.float64)[
                :, j * dsub : (j + 1) * dsub
            ]
            for j in range(m)
        ]
    )  # (m, k, dsub)

    sc = vectors.sparkSession.sparkContext
    vec_slim = vectors.select(vec_col).persist()
    partial_schema = "subspace int, cluster int, cnt long, vecsum array<double>"

    for _ in range(n_iter):
        bc = sc.broadcast(books)

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cb = bc.value  # (m, k, dsub)
            cb_sq = (cb * cb).sum(axis=2)  # (m, k)
            for b in batches:
                if not len(b):
                    continue
                v = np.array(
                    [np.asarray(x, dtype=np.float64) for x in b[vec_col]]
                ).reshape(len(b), m, dsub)
                rows = []
                for j in range(m):
                    vj = v[:, j, :]  # (n, dsub)
                    d = -2.0 * (vj @ cb[j].T) + cb_sq[j]
                    assign = np.argmin(d, axis=1)
                    for cl in np.unique(assign):
                        mask = assign == cl
                        rows.append(
                            (j, int(cl), int(mask.sum()), vj[mask].sum(axis=0).tolist())
                        )
                yield pd.DataFrame(
                    rows, columns=["subspace", "cluster", "cnt", "vecsum"]
                )

        agg = (
            vec_slim.mapInPandas(partials, schema=partial_schema)
            .groupBy("subspace", "cluster")
            .agg(
                F.sum("cnt").alias("cnt"),
                *[
                    F.sum(F.element_at("vecsum", i + 1)).alias(f"s{i}")
                    for i in range(dsub)
                ],
            )
            .collect()
        )
        new_books = books.copy()
        for row in agg:
            s = np.array([row[f"s{i}"] for i in range(dsub)])
            new_books[row["subspace"], row["cluster"]] = s / row["cnt"]
        bc.destroy()
        books = new_books

    vec_slim.unpersist()
    return books


def pq_encode(
    vectors: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Append the m-byte PQ code (array<int>, one codebook index per
    subspace; ties -> lowest index via argmin). Shuffle-free Arrow scan.
    A NULL embedding keeps its row with a NULL code (the row survives;
    a null array can't be quantized) — no crash, no silent drop."""
    m, k, dsub = codebooks.shape
    sc = vectors.sparkSession.sparkContext
    bc = sc.broadcast(np.asarray(codebooks, dtype=np.float64))

    out_schema = StructType(
        list(vectors.schema.fields)
        + [StructField(out_col, ArrayType(IntegerType()), True)]
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cb = bc.value
        cb_sq = (cb * cb).sum(axis=2)
        for b in batches:
            if not len(b):
                continue
            ok = b[vec_col].notna().to_numpy()
            out = [None] * len(b)
            if ok.any():
                v = np.array(
                    [
                        np.asarray(x, dtype=np.float64)
                        for x in b[vec_col][ok]
                    ]
                ).reshape(int(ok.sum()), m, dsub)
                codes = np.empty((int(ok.sum()), m), dtype=np.int32)
                for j in range(m):
                    d = -2.0 * (v[:, j, :] @ cb[j].T) + cb_sq[j]
                    codes[:, j] = np.argmin(d, axis=1)
                it = iter(codes)
                out = [
                    next(it).tolist() if good else None for good in ok
                ]
            b = b.copy()
            b[out_col] = out
            yield b

    return vectors.mapInPandas(enc, out_schema)


def pq_topk(
    encoded: DataFrame,
    codebooks: np.ndarray,
    query_vec,
    topk: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Approximate top-k nearest (squared L2) via ADC over PQ codes.

    ``query_vec`` is a plain sequence of floats. The (m, k) distance
    table is built driver-side (m*k scalars) and broadcast; scoring is
    one Arrow pass over the code column — the raw embedding column is
    never read. Returns (id_col, adc_dist) ascending, ties by id.
    """
    m, k, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64).reshape(m, dsub)
    table = ((codebooks - q[:, None, :]) ** 2).sum(axis=2)  # (m, k)
    sc = encoded.sparkSession.sparkContext
    bc = sc.broadcast(table)

    out_schema = StructType(
        [
            StructField(id_col, LongType(), True),
            StructField("adc_dist", DoubleType(), True),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = bc.value
        cols = np.arange(m)
        for b in batches:
            if not len(b):
                continue
            codes = np.array([np.asarray(c, dtype=np.int64) for c in b[code_col]])
            dist = t[cols, codes].sum(axis=1)
            yield pd.DataFrame({id_col: b[id_col], "adc_dist": dist})

    return (
        # NULL codes (pq_encode's NULL-embedding rows) are unscoreable:
        # filtered scan-side, never reaching the numpy gather.
        encoded.select(id_col, code_col)
        .filter(F.col(code_col).isNotNull())
        .mapInPandas(score, out_schema)
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(topk)
    )


def ivfpq_topk(
    vectors: DataFrame,
    coarse_centroids: np.ndarray,
    codebooks: np.ndarray,
    query_vec,
    topk: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FAISS-style IVFPQ: coarse quantizer prunes WHICH rows are scanned,
    residual PQ codes decide HOW each scanned row is scored.

    Every vector belongs to its nearest coarse centroid (squared L2);
    its PQ code encodes the RESIDUAL ``v - centroid`` (residuals are
    near zero-mean, so the same codebook budget quantizes them much
    tighter than raw vectors). A query probes its ``n_probe`` nearest
    coarse cells and scores only those rows, each against the ADC table
    of the query's residual in that cell.

    Scale shape: assignment + encoding are one shuffle-free Arrow scan
    (at rest, write ``coarse`` as a partition column and the probe
    becomes a partition-pruned scan of n_probe/n_cells of the data —
    same layout note as ``similarity.ivf_topk``); per-query work is
    n_probe ADC tables (tiny, driver-built) + one scan over the probed
    cells' codes. Train ``codebooks`` on residuals via
    ``pq_train_residual``.
    """
    m, k, dsub = codebooks.shape
    cc = np.asarray(coarse_centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)

    # nearest coarse cells for the query, deterministic ties -> lowest id
    qd = ((cc - q) ** 2).sum(axis=1)
    probe_cells = np.argsort(qd, kind="stable")[:n_probe]
    # one ADC table per probed cell, over the query's residual there
    tables = {}
    for c in probe_cells:
        r = (q - cc[c]).reshape(m, dsub)
        tables[int(c)] = ((codebooks - r[:, None, :]) ** 2).sum(axis=2)

    sc = vectors.sparkSession.sparkContext
    bc = sc.broadcast((cc, np.asarray(codebooks), tables))

    out_schema = StructType(
        [
            StructField(id_col, LongType(), True),
            StructField("adc_dist", DoubleType(), True),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        centroids, cb, tbls = bc.value
        cb_sq = (cb * cb).sum(axis=2)
        cols = np.arange(m)
        for b in batches:
            if not len(b):
                continue
            v = np.array([np.asarray(x, dtype=np.float64) for x in b[vec_col]])
            coarse = ((v[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
            ids = b[id_col].to_numpy()
            out_ids, out_d = [], []
            for c, t in tbls.items():
                mask = coarse == c
                if not mask.any():
                    continue
                res = (v[mask] - centroids[c]).reshape(mask.sum(), m, dsub)
                codes = np.empty((mask.sum(), m), dtype=np.int64)
                for j in range(m):
                    codes[:, j] = (
                        -2.0 * (res[:, j, :] @ cb[j].T) + cb_sq[j]
                    ).argmin(axis=1)
                out_ids.append(ids[mask])
                out_d.append(t[cols, codes].sum(axis=1))
            if out_ids:
                yield pd.DataFrame(
                    {id_col: np.concatenate(out_ids), "adc_dist": np.concatenate(out_d)}
                )

    return (
        vectors.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(score, out_schema)
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(topk)
    )


def pq_train_residual(
    vectors: DataFrame,
    coarse_centroids: np.ndarray,
    m: int = 8,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train PQ codebooks on coarse-quantizer RESIDUALS (the IVFPQ
    convention): subtract each vector's nearest coarse centroid before
    the subspace k-means. Same one-scan-per-iteration shape as
    ``pq_train`` — the residual is computed inside the Arrow stage, so
    no materialized residual column is ever shuffled or stored."""
    cc = np.asarray(coarse_centroids, dtype=np.float64)

    from kubenetmon_spark.operators.clustering import kmeans_assign

    # residuals as a transient projection (never lands at rest);
    # NULL embeddings dropped up front, matching pq_train
    assigned = kmeans_assign(
        vectors.filter(F.col(vec_col).isNotNull()),
        cc,
        id_col=id_col,
        vec_col=vec_col,
    )

    def residualize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            v = np.array([np.asarray(x, dtype=np.float64) for x in b[vec_col]])
            r = v - cc[b["cluster"].to_numpy()]
            b = b.copy()
            b[vec_col] = [row.tolist() for row in r]
            yield b[[id_col, vec_col]]

    res_schema = StructType(
        [vectors.schema[id_col], vectors.schema[vec_col]]
    )
    residuals = assigned.mapInPandas(residualize, res_schema)
    return pq_train(residuals, m=m, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
