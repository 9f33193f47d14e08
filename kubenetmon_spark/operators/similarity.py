"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:
- ``brute_force_topk`` — exact inner-product/cosine top-k: broadcast the
  query, fold the dot product JVM-side (zip_with + aggregate — a
  sequential, deterministic fold, no Python). The baseline and the
  correctness oracle.
- ``signlsh_topk`` — sign-LSH (random-hyperplane) bucketed search: each
  vector gets a b-bit sketch from deterministic md5-derived hyperplanes;
  candidates share the query's bucket (optionally Hamming-adjacent
  buckets); exact re-rank on candidates only. At 100 TB the bucket join
  replaces the full scan; recall is tunable via bits/probes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Deterministic double-precision dot product (sequential fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ))


def brute_force_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "dot",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k by inner product (or cosine) against ONE query vector.

    ``query`` is a 1-row DataFrame with a ``qv`` array column. Scores are
    rounded to ``round_digits`` and ties broken by id so the result is
    fully deterministic (and oracle-comparable).
    """
    joined = vectors.crossJoin(F.broadcast(query))
    score = _dot(F.col(vec_col), F.col("qv"))
    if metric == "cosine":
        score = score / (_norm(F.col(vec_col)) * _norm(F.col("qv")))
    scored = joined.select(
        F.col(id_col), F.round(score, round_digits).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def _sketch_bits(vec: Column, dim: int, bits: int) -> Column:
    """b-bit sign sketch with deterministic pseudo-random hyperplanes.

    Hyperplane p, component i has sign +1 iff md5('p:i') first hex digit
    is >= '8' — a fixed, engine-independent pseudo-random sign matrix.
    """
    total = F.lit(0).cast("long")
    for p in range(bits):
        acc = F.lit(0.0)
        # fold: sum_i sign(p,i) * vec[i]
        signs = F.array(*[
            F.when(
                F.expr(f"substring(md5('{p}:' || {i}), 1, 1)").isin(
                    *"89abcdef"
                ),
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
            for i in range(dim)
        ])
        proj = F.aggregate(
            F.zip_with(vec, signs, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        total = total + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return total


def signlsh_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 8,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k: restrict the exact re-rank to vectors whose
    sign-LSH bucket matches the query's (single-probe).

    Scale path: the sketch is computed once per vector (a linear scan,
    cacheable/materializable as a column), and the query probe is an
    equi-join on the bucket.
    """
    sk = vectors.withColumn("_bucket", _sketch_bits(F.col(vec_col), dim, bits))
    qk = query.withColumn("_bucket", _sketch_bits(F.col("qv"), dim, bits))
    cands = sk.join(F.broadcast(qk), "_bucket", "inner")
    scored = cands.select(
        F.col(id_col), F.round(_dot(F.col(vec_col), F.col("qv")), round_digits).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
