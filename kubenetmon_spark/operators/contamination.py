"""Benchmark decontamination: n-gram containment of eval-set documents
inside corpus documents.

Dedup (operators/dedup.py) asks "are these two corpus docs the same?"
— a symmetric Jaccard question. Decontamination is the asymmetric one a
training pipeline must also answer: "how much of THIS benchmark item
appears inside THAT training document?" — containment = |shared
shingles| / |benchmark shingles|, so a 50-token eval question fully
quoted inside a 10k-token web page still scores 10000 bp where Jaccard
would vanish.

Scale posture: the benchmark side is an eval suite — thousands of docs,
not billions — so its shingle set is broadcast and the corpus-side scan
joins against it with **zero corpus shuffle**; the only exchange is the
per-(corpus doc, benchmark doc) count aggregation over rows that
actually matched a benchmark shingle (rare by construction). The
shingling itself reuses ``shingle_set`` (Arrow-batched; identical
shingle bytes to the dedup/oracle convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kubenetmon_spark.operators.dedup import shingle_set


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_bp: int = 2500,
) -> DataFrame:
    """(corpus_id, bench_id, shared, bench_total, containment_bp) for
    pairs whose containment >= threshold_bp. Integer basis points
    (floor), so results are engine-exact."""
    c_sh = shingle_set(corpus, id_col, text_col, n).select(
        F.col("_id").alias("corpus_id"), "shingle"
    )
    b_sh = shingle_set(benchmark, id_col, text_col, n).select(
        F.col("_id").alias("bench_id"), "shingle"
    )
    b_sizes = b_sh.groupBy("bench_id").agg(F.count(F.lit(1)).alias("bench_total"))
    inter = (
        c_sh.join(F.broadcast(b_sh), "shingle")
        .groupBy("corpus_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        inter.join(F.broadcast(b_sizes), "bench_id")
        .withColumn(
            "containment_bp", F.expr("shared * 10000 DIV bench_total")
        )
        .filter(F.col("containment_bp") >= threshold_bp)
        .select("corpus_id", "bench_id", "shared", "bench_total", "containment_bp")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_bp: int = 2500,
) -> DataFrame:
    """Corpus minus every document containing >= threshold of ANY
    benchmark item — the actual pipeline step (anti-join on the flagged
    ids; the flagged set is tiny and broadcasts)."""
    flagged = (
        contamination_pairs(corpus, benchmark, id_col, text_col, n, threshold_bp)
        .select(F.col("corpus_id").alias("_flagged_id"))
        .distinct()
    )
    return corpus.join(
        F.broadcast(flagged),
        corpus[id_col] == F.col("_flagged_id"),
        "left_anti",
    )
