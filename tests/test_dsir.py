"""DSIR importance resampling vs a NumPy/pure-Python reference."""

from __future__ import annotations

import math
import random

from kubenetmon_spark.operators.dsir import (
    dsir_log_weights,
    gumbel_topk,
    hashed_ngram_counts,
)

BUCKETS = 64


def _py_grams(text: str) -> list[str]:
    t = text.strip().split()
    return [g for g in t + [" ".join(p) for p in zip(t, t[1:])] if g]


def _spark_bucket(spark, grams):
    """xxhash64 is JVM-side; fetch the engine's own bucket assignment so
    the reference uses identical feature hashing."""
    df = spark.createDataFrame([(g,) for g in sorted(set(grams))], ["g"])
    from pyspark.sql import functions as F

    return {
        r.g: r.b
        for r in df.select(
            "g", F.pmod(F.xxhash64("g"), F.lit(BUCKETS)).alias("b")
        ).collect()
    }


def _corpora(seed):
    rng = random.Random(seed)
    vocab_raw = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    vocab_tgt = ["alpha", "beta", "target", "quality", "clean"]
    raw = [
        (i, " ".join(rng.choice(vocab_raw + vocab_tgt) for _ in range(12)))
        for i in range(40)
    ]
    tgt = [
        (i, " ".join(rng.choice(vocab_tgt) for _ in range(10)))
        for i in range(10)
    ]
    return raw, tgt


def test_ngram_counts_match_python(spark):
    raw, _ = _corpora(1)
    df = spark.createDataFrame(raw, ["doc_id", "text"])
    got = {
        (r._id, r.bucket): r.cnt
        for r in hashed_ngram_counts(df, "doc_id", buckets=BUCKETS).collect()
    }
    all_grams = [g for _, t in raw for g in _py_grams(t)]
    bucket_of = _spark_bucket(spark, all_grams)
    exp: dict = {}
    for did, text in raw:
        for g in _py_grams(text):
            k = (did, bucket_of[g])
            exp[k] = exp.get(k, 0) + 1
    assert got == exp


def test_log_weights_match_python(spark):
    raw, tgt = _corpora(2)
    raw_df = spark.createDataFrame(raw, ["doc_id", "text"])
    tgt_df = spark.createDataFrame(tgt, ["doc_id", "text"])
    got = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(
            raw_df, tgt_df, "doc_id", buckets=BUCKETS
        ).collect()
    }
    bucket_of = _spark_bucket(
        spark,
        [g for _, t in raw + tgt for g in _py_grams(t)],
    )
    raw_counts: dict = {}
    tgt_counts: dict = {}
    for (corpus, counts) in ((raw, raw_counts), (tgt, tgt_counts)):
        for _, text in corpus:
            for g in _py_grams(text):
                b = bucket_of[g]
                counts[b] = counts.get(b, 0) + 1
    rt, tt = sum(raw_counts.values()), sum(tgt_counts.values())

    def log_ratio(b):
        return (
            math.log(tgt_counts.get(b, 0) + 1)
            - math.log(tt + BUCKETS)
            - math.log(raw_counts.get(b, 0) + 1)
            + math.log(rt + BUCKETS)
        )

    for did, text in raw:
        exp = sum(log_ratio(bucket_of[g]) for g in _py_grams(text))
        assert abs(got[did] - exp) < 1e-9, did


def test_gumbel_topk_deterministic_and_biased(spark):
    raw, tgt = _corpora(3)
    raw_df = spark.createDataFrame(raw, ["doc_id", "text"])
    tgt_df = spark.createDataFrame(tgt, ["doc_id", "text"])
    w = dsir_log_weights(raw_df, tgt_df, "doc_id", buckets=BUCKETS)
    a = sorted(r.doc_id for r in gumbel_topk(w, "doc_id", 10, seed=7).collect())
    b = sorted(r.doc_id for r in gumbel_topk(w, "doc_id", 10, seed=7).collect())
    assert a == b and len(a) == 10
    c = sorted(r.doc_id for r in gumbel_topk(w, "doc_id", 10, seed=8).collect())
    assert a != c  # different seed -> different draw (overwhelmingly)
    # selection is weight-biased: mean weight of selected > corpus mean
    ws = {r.doc_id: r.log_weight for r in w.collect()}
    sel_mean = sum(ws[i] for i in a) / len(a)
    all_mean = sum(ws.values()) / len(ws)
    assert sel_mean > all_mean


def test_gumbel_exact_matches_pure_python_pipeline(spark):
    """The portable-exact sampler must agree BIT FOR BIT with a pure
    Python re-derivation (md5 buckets, fixed-point lns, integer sums)
    — this is the same contract its DuckDB oracle (q113) relies on."""
    import hashlib

    from kubenetmon_spark.functions.fxlog import LN2_FX, fx_ln_int
    from kubenetmon_spark.operators.dsir import dsir_gumbel_sample_exact

    raw, tgt = _corpora(4)
    raw_df = spark.createDataFrame(raw, ["doc_id", "text"])
    tgt_df = spark.createDataFrame(tgt, ["doc_id", "text"])
    buckets, k, seed = 512, 12, 42
    got = [
        (r.doc_id, r.gumbel_key_fx)
        for r in dsir_gumbel_sample_exact(
            raw_df, tgt_df, "doc_id", buckets=buckets, k=k, seed=seed
        ).collect()
    ]

    def md5_52(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)

    raw_counts: dict = {}
    tgt_counts: dict = {}
    doc_feats: dict = {}
    for _, text in tgt:
        for g in _py_grams(text):
            b = md5_52(g) % buckets
            tgt_counts[b] = tgt_counts.get(b, 0) + 1
    for did, text in raw:
        for g in _py_grams(text):
            b = md5_52(g) % buckets
            raw_counts[b] = raw_counts.get(b, 0) + 1
            doc_feats.setdefault(did, {})
            doc_feats[did][b] = doc_feats[did].get(b, 0) + 1
    rt, tt = sum(raw_counts.values()), sum(tgt_counts.values())
    lr = {
        b: fx_ln_int((tgt_counts.get(b, 0) + 1) * (rt + buckets))
        - fx_ln_int((raw_counts[b] + 1) * (tt + buckets))
        for b in raw_counts
    }
    keys = []
    for did, feats in doc_feats.items():
        score = sum(c * lr[b] for b, c in feats.items())
        h = md5_52(f"{did}:{seed}") + 1
        L = max(52 * LN2_FX - fx_ln_int(h), 1)
        keys.append((did, score + 40 * LN2_FX - fx_ln_int(L)))
    exp = sorted(keys, key=lambda x: (-x[1], x[0]))[:k]
    assert sorted(got) == sorted(exp)
    # and stable under repartition (integer sums commute exactly)
    got2 = [
        (r.doc_id, r.gumbel_key_fx)
        for r in dsir_gumbel_sample_exact(
            raw_df.repartition(7), tgt_df.repartition(3), "doc_id",
            buckets=buckets, k=k, seed=seed,
        ).collect()
    ]
    assert sorted(got2) == sorted(exp)


def test_gumbel_exact_seed_changes_sample(spark):
    from kubenetmon_spark.operators.dsir import dsir_gumbel_sample_exact

    raw, tgt = _corpora(6)
    raw_df = spark.createDataFrame(raw, ["doc_id", "text"])
    tgt_df = spark.createDataFrame(tgt, ["doc_id", "text"])
    a = sorted(
        r.doc_id
        for r in dsir_gumbel_sample_exact(
            raw_df, tgt_df, "doc_id", buckets=256, k=10, seed=1
        ).collect()
    )
    b = sorted(
        r.doc_id
        for r in dsir_gumbel_sample_exact(
            raw_df, tgt_df, "doc_id", buckets=256, k=10, seed=2
        ).collect()
    )
    assert len(a) == 10 and a != b


def test_integer_scores_rank_target_like_docs_first(spark):
    from kubenetmon_spark.operators.dsir import dsir_integer_scores

    raw, tgt = _corpora(5)
    # plant two docs that are pure target vocabulary: they must outrank
    # the mixed-vocabulary corpus under the integer importance score
    raw = raw + [
        (1000, "target quality clean target quality clean target"),
        (1001, "quality clean target quality clean target quality"),
    ]
    raw_df = spark.createDataFrame(raw, ["doc_id", "text"])
    tgt_df = spark.createDataFrame(tgt, ["doc_id", "text"])
    top = dsir_integer_scores(
        raw_df, tgt_df, "doc_id", buckets=512, k=5
    ).collect()
    assert {1000, 1001} <= {r.doc_id for r in top}
    # deterministic under repartition
    top2 = dsir_integer_scores(
        raw_df.repartition(7), tgt_df.repartition(3), "doc_id",
        buckets=512, k=5,
    ).collect()
    assert [(r.doc_id, r.score) for r in top] == [
        (r.doc_id, r.score) for r in top2
    ]


def test_subset_fast_path_identical_to_general(spark):
    """r8: target_within_raw=True (target features derived from the raw
    feature pass) must be bit-identical to the general two-pass path —
    for both exact entry points, including NULL-text rows and a target
    sharing only some buckets."""
    from kubenetmon_spark.operators.dsir import (
        dsir_gumbel_sample_exact,
        dsir_integer_scores,
    )

    raw, _ = _corpora(7)
    raw = raw + [(99, None)]  # NULL text survives the pipeline
    df = spark.createDataFrame(raw, "doc_id long, text string")
    target = df.filter("doc_id % 4 = 0")

    for fn, kw in (
        (dsir_integer_scores, {}),
        (dsir_gumbel_sample_exact, {"seed": 3}),
    ):
        general = fn(
            df, target, "doc_id", buckets=BUCKETS, k=15, **kw
        ).collect()
        fast = fn(
            df, target, "doc_id", buckets=BUCKETS, k=15,
            target_within_raw=True, **kw
        ).collect()
        assert [tuple(r) for r in general] == [tuple(r) for r in fast]
