"""Count-based bigram language model — the deterministic core of a
CCNet/KenLM-style perplexity filter for training-data curation.

Production pipelines score documents with an n-gram LM and drop the
high-perplexity tail. This module implements the same computation shape
with everything oracle-checkable:

- ``train_bigram_counts``: unigram/bigram counts over the corpus — two
  hash aggregations with map-side combine (the one corpus-volume
  shuffle each); vocabulary size from the unigram table.
- ``with_bigram_logprob``: per-document add-one-smoothed score
  ``Σ log2((c(prev,cur) + 1) / (c(prev) + V))``. Each per-pair term is
  rounded to INTEGER MICRO-UNITS before summation, so the per-document
  sum is an exact int64 regardless of aggregation order — float
  addition is commutative but not associative, and a shuffle must never
  change a score. (The lone float step per term is one division and one
  log2 of a small rational; the q129 entropy precedent covers its
  1e-6 rounding.)

Plan shape: tokenization is posexplode (no shuffle); the prev-token
pairing is ONE lag window per doc (shuffle on doc id); count joins are
plain equi-joins (broadcast when the vocabulary is small, AQE decides);
the final per-doc sum shares the doc partitioning.

Swapping in a real trained LM = replacing the count tables; the plan is
unchanged — same stance as the hashed linear scorer (text.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _tokens_pos(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return df.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "tok")
    ).filter(F.col("tok") != "")


def train_bigram_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """(unigrams ``tok, cu``; bigrams ``prev, tok, cb``) over the corpus.

    Bigrams pair adjacent tokens WITHIN a document (no cross-doc pairs):
    one lag window per doc, then a hash agg each.
    """
    t = _tokens_pos(df, text_col, id_col)
    uni = t.groupBy("tok").agg(F.count(F.lit(1)).alias("cu"))
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = t.withColumn("prev", F.lag("tok").over(w)).filter(
        F.col("prev").isNotNull()
    )
    bi = pairs.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("cb"))
    return uni, bi


def with_bigram_logprob(
    df: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document smoothed bigram score: ``lp_micro`` (int64 sum of
    per-pair micro-bits, exact under any aggregation order) and
    ``n_pairs``. Higher (less negative) = more in-distribution; a
    perplexity filter thresholds ``lp_micro / n_pairs``.
    """
    t = _tokens_pos(df, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = t.withColumn("prev", F.lag("tok").over(w)).filter(
        F.col("prev").isNotNull()
    )
    joined = (
        pairs.join(bigrams, ["prev", "tok"], "left")
        .join(
            unigrams.select(F.col("tok").alias("prev"), "cu"),
            "prev",
            "left",
        )
        .withColumn("cb", F.coalesce(F.col("cb"), F.lit(0)))
        .withColumn("cu", F.coalesce(F.col("cu"), F.lit(0)))
    )
    term = F.log2(
        (F.col("cb") + 1).cast("double")
        / (F.col("cu") + vocab_size).cast("double")
    )
    micro = F.round(term * 1_000_000).cast("bigint")
    scores = joined.groupBy(id_col).agg(
        F.sum(micro).alias("lp_micro"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    return df.join(scores, id_col, "left")
