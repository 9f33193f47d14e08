"""Text-analysis operators: token stats, quality scoring, language-marker
scoring, document fingerprinting, SimHash.

All pure built-in-function DataFrame transforms (JVM-side). Ratios are
integer basis points (floor((x*10000)/y)) so results are engine-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = ["the", "a", "of", "and", "to", "in"]

#: marker tokens per language for the n-gram/stopword language heuristic.
DEFAULT_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "und", "die"],
    "fr": ["le", "les", "des"],
    "zh": ["de5", "shi4", "le5"],  # pinyin-ish placeholders
}


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append n_tokens / n_distinct_tokens / n_chars_computed."""
    toks = _tokens(F.col(text_col))
    return (
        df.withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(toks)).cast("long"))
        .withColumn("n_chars_computed", F.length(text_col).cast("long"))
    )


def with_quality(
    df: DataFrame, text_col: str = "text", stopwords: list[str] | None = None
) -> DataFrame:
    """Append quality features: stopword ratio, distinct-token ratio, mean
    token length — all in integer basis points."""
    stopwords = stopwords if stopwords is not None else DEFAULT_STOPWORDS
    toks = _tokens(F.col(text_col))
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    stop_cnt = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n = F.size(toks)
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    return (
        df.withColumn("n_tokens", n.cast("long"))
        .withColumn("stop_count", stop_cnt.cast("long"))
        .withColumn("stop_ratio_bp", F.floor(stop_cnt * 10000 / n).cast("long"))
        .withColumn(
            "distinct_ratio_bp",
            F.floor(F.size(F.array_distinct(toks)) * 10000 / n).cast("long"),
        )
        .withColumn("alpha_chars", alpha_chars.cast("long"))
    )


def with_lang_scores(
    df: DataFrame, text_col: str = "text", markers: dict[str, list[str]] | None = None
) -> DataFrame:
    """Append per-language marker counts and the argmax prediction.

    The heuristic: count marker-token occurrences per language; highest
    count wins, ties broken by fixed language order (sorted keys).
    """
    markers = markers or DEFAULT_LANG_MARKERS
    toks = _tokens(F.col(text_col))
    out = df
    for lang in sorted(markers):
        arr = F.array(*[F.lit(m) for m in markers[lang]])
        out = out.withColumn(
            f"score_{lang}",
            F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long"),
        )
    langs = sorted(markers)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs]) if len(langs) > 1 else F.col(f"score_{langs[0]}")
    pred = F.lit(None).cast("string")
    # first language (sorted order) achieving the max wins
    for lang in reversed(langs):
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    return out.withColumn("pred_lang", pred)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the sorted distinct token
    set (bag-of-words identity, word-order insensitive)."""
    toks = _tokens(F.col(text_col))
    return df.withColumn(
        "fingerprint", F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
    )


def with_simhash16(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """16-bit SimHash over distinct tokens, engine-exact.

    Per distinct token: the first 4 hex digits of md5(token) supply 16
    bits; each bit contributes +1/-1 to its position; the sign of the sum
    is the fingerprint bit. Everything is md5 + CASE/IN — reproducible in
    any SQL engine (the gate's DuckDB oracle computes the identical
    value).

    Returns (id_col, simhash16 long).
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(_tokens(F.col(text_col)))).alias("tok"),
    )
    toks = toks.withColumn("h", F.md5("tok"))
    aggs = []
    for j in range(4):  # hex digit position
        digit = F.expr(f"instr('0123456789abcdef', substring(h, {j + 1}, 1)) - 1")
        toks = toks.withColumn(f"_d{j}", digit)
        for k in range(4):  # bit within digit
            ones = [v for v in range(16) if (v >> k) & 1]
            contrib = F.when(F.col(f"_d{j}").isin(ones), 1).otherwise(-1)
            aggs.append(F.sum(contrib).alias(f"_s{j}_{k}"))
    per_doc = toks.groupBy("_id").agg(*aggs)
    fp = F.lit(0).cast("long")
    for j in range(4):
        for k in range(4):
            bit = F.when(F.col(f"_s{j}_{k}") > 0, 1).otherwise(0)
            fp = fp + bit.cast("long") * F.lit(1 << (4 * j + k)).cast("long")
    return per_doc.select(F.col("_id").alias(id_col), fp.alias("simhash16"))
