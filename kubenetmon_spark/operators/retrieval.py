"""Distributed text retrieval: inverted index, keyword search, BM25.

The reference engine's query surface is SQL over structured flows; a
training-data platform additionally needs lexical retrieval over the
document corpus (find near-matches for a probe set, audit contamination,
build dictionaries). Everything here is expressed with built-in
DataFrame ops — explode, aggregate, broadcast join — so Catalyst keeps
the whole pipeline in codegen and the only shuffles are the per-doc and
per-term aggregations.

Scale posture (100 TB corpus):
- ``tokenize`` is a projection + explode: no shuffle, no Python.
- ``build_inverted_index`` shuffles once on term; posting lists are the
  classic skew hazard (stopword terms), so postings are capped with
  ``max_postings`` (keep-lowest-doc_id semantics, deterministic) the way
  production indexes cap/stop-list hot terms.
- ``keyword_topk``/``bm25_topk`` filter to query terms IMMEDIATELY after
  the explode — the per-(doc,term) aggregate touches only matching
  tokens, never the full token stream. Document lengths (BM25's dl) do
  need a full-corpus pass; at scale that aggregate is computed once and
  reused across queries, which is exactly how ``doc_lengths`` is split
  out here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, token) pairs: lowercased, whitespace-split, empties dropped.

    Whitespace tokenization matches the rest of the text stack
    (operators/text.py) and is exactly reproducible in ANSI SQL, which
    keeps every retrieval query oracle-checkable.
    """
    return (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
                "token"
            ),
        )
        .filter(F.col("token") != "")
    )


def doc_lengths(tokens: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Tokens per document — BM25's dl, one row per doc."""
    return tokens.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))


def build_inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 1,
    max_postings: int | None = None,
) -> DataFrame:
    """term -> (n_docs, total_tf, postings) with postings a sorted doc-id
    array. ``max_postings`` caps hot terms by keeping the lowest doc ids
    (deterministic); ``n_docs``/``total_tf`` still reflect the full
    corpus so scoring stays exact even where postings are truncated.
    """
    per_doc = (
        tokenize(df, text_col, id_col)
        .groupBy("token", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if max_postings is None:
        idx = per_doc.groupBy("token").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tf").alias("total_tf"),
            F.sort_array(F.collect_list(F.col(id_col))).alias("postings"),
        )
    else:
        # Bound BEFORE collecting (same posture as the sketch builds):
        # the rank window sorts with disk spill, so a stopword-grade
        # term never materializes its full posting array in one
        # executor's memory — only the max_postings survivors reach the
        # collect. n_docs/total_tf still aggregate the FULL corpus
        # (window-independent columns), so scoring stays exact.
        from pyspark.sql.window import Window

        w = Window.partitionBy("token").orderBy(F.col(id_col))
        ranked = per_doc.withColumn("_rk", F.row_number().over(w))
        idx = ranked.groupBy("token").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tf").alias("total_tf"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("_rk") <= max_postings, F.col(id_col))
                )
            ).alias("postings"),
        )
    return idx.filter(F.col("n_docs") >= min_docs)


def keyword_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Integer-deterministic keyword retrieval: rank by (#distinct query
    terms present, total tf of query terms, doc id). No floats anywhere,
    so results are engine-portable — this is the oracle-checkable
    counterpart of ``bm25_topk``.
    """
    toks = tokenize(df, text_col, id_col).filter(F.col("token").isin(query_terms))
    return (
        toks.groupBy(id_col)
        .agg(
            F.countDistinct("token").alias("n_match"),
            F.count(F.lit(1)).alias("total_tf"),
        )
        .orderBy(F.desc("n_match"), F.desc("total_tf"), id_col)
        .limit(k)
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranking (Robertson/Sparck Jones idf, the Lucene variant:
    idf = ln(1 + (N - df + 0.5)/(df + 0.5)), always positive).

    Entirely built-in expressions: the idf table is |query| rows and
    broadcast; N/avgdl is a broadcast scalar; the only fact-side work is
    the tf aggregate over query-matching tokens plus the corpus-length
    aggregate. Ties broken by doc id. Scores are doubles — validated in
    tests against an independent NumPy implementation, deliberately NOT
    part of the hash-equality gate (see keyword_topk for that).
    """
    toks = tokenize(df, text_col, id_col)
    dl = doc_lengths(toks, id_col)
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_corpus"),
        F.avg("dl").alias("avgdl"),
    )
    qtoks = toks.filter(F.col("token").isin(query_terms))
    tf = qtoks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats.select("n_corpus"))).select(
        "token",
        F.log(
            F.lit(1.0)
            + (F.col("n_corpus") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(idf), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.sum("term_score").alias("score"))
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def tokenize_positions(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, pos, token) triples (pos is 0-based) — the positional form
    of ``tokenize`` that phrase queries need. Still a pure projection +
    posexplode: no shuffle, no Python."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return df.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "token")
    ).filter(F.col("token") != "")


def phrase_search(
    df: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase occurrence counts per document — the positional-
    index query a BM25/keyword layer can't answer.

    Anchor trick (the classic positional-postings intersection, done as
    one aggregation): a token matching phrase word j at position p
    votes for anchor ``p - j``; an anchor with all k distinct j's
    present is one phrase occurrence. Correct with REPEATED words in
    the phrase (a token joins every offset it serves, and the
    count-distinct per anchor still requires every slot).

    Plan: tokenize (no shuffle) -> filter to the phrase's terms
    IMMEDIATELY (the token stream never shuffles wholesale) ->
    broadcast join the (term, offset) table -> one groupBy
    (doc, anchor) -> one groupBy doc. Returns (id, n_occurrences > 0
    docs only).
    """
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("empty phrase")
    k = len(terms)
    spark = df.sparkSession
    # one-slice probe frame with an explicit schema (tables.local_df):
    # a k-row phrase table scanned under a broadcast build — core-count
    # slicing cost 32 Python-backed tasks per build, and the bare
    # column-name form additionally ran a schema-inference job
    from kubenetmon_spark.tables import local_df

    offsets = local_df(
        spark, [(t, int(j)) for j, t in enumerate(terms)], "token string, j int"
    )
    toks = tokenize_positions(df, text_col, id_col).filter(
        F.col("token").isin(list(set(terms)))
    )
    cand = toks.join(F.broadcast(offsets), "token").select(
        F.col(id_col), (F.col("pos") - F.col("j")).alias("anchor"), "j"
    ).filter(F.col("anchor") >= 0)
    occ = (
        cand.groupBy(id_col, "anchor")
        .agg(F.count_distinct("j").alias("_slots"))
        .filter(F.col("_slots") == k)
    )
    return occ.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )


def ranking_metrics(
    runs: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query retrieval-evaluation metrics over a ranked run:
    recall@k, precision@k, MRR and NDCG@k — the eval loop every
    retrieval / ANN / reranker component in a training-data platform is
    tuned against (TREC run+qrels layout).

    ``runs``: (query, doc, rank) with rank 1-based; ``qrels``: (query,
    doc, rel) graded relevance, rel > 0 rows only. Output per query:
    ``n_rel``, ``hits_k``, ``recall_k_ppm``, ``precision_k_ppm``,
    ``mrr_ppm`` (0 when no relevant doc is retrieved), ``ndcg_k_ppm``.

    Exact-integer contract (hash-matchable against any SQL engine):
    NDCG uses the HARMONIC discount 1/(rank+1) instead of the classic
    1/log2(rank+1) — log2 is irrational and libm-dependent, the
    harmonic discount keeps the same monotone rank-decay shape and
    makes DCG an exact integer: rel * (L // (rank+1)) with
    L = lcm(2..k+1), so every per-position term divides exactly.
    IDCG ranks the query's own rels descending over the top
    min(n_rel, k) ideal slots. All ratios are floor ppm.

    Scale posture: one equi-join runs->qrels on (query, doc) followed
    by a (query) hash agg; IDCG is a second (query) agg on the (far
    smaller) qrels side joined back co-located. No window over the
    full run is needed — ranks arrive precomputed; nothing collects.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    import math

    L = math.lcm(*range(2, k + 2))
    # Explicit ceiling, not an opaque literal/cast failure: the largest
    # discount literal is L // 2 and must fit a long. lcm(2..k+1)
    # crosses int64 at k = 46, so k <= 45 is the supported range for
    # the exact-integer harmonic-NDCG contract — far past any retrieval
    # eval cutoff in practice (TREC uses 10/100 with float log2 NDCG;
    # this exact variant tops out where int64 does).
    if L // 2 > 2**63 - 1:
        raise ValueError(
            f"ranking_metrics: k={k} overflows the exact-integer discount "
            "table (lcm(2..k+1)//2 exceeds int64); supported k <= 45"
        )
    # Discount table L // (rank+1) precomputed driver-side as exact
    # Python integers: L = lcm(2..k+1) passes 2^53 around k=40, where a
    # double division would stop being floor-exact and silently break
    # the hash-matchable contract. k+1 literal longs, broadcast free.
    disc = F.array(*[F.lit(L // d).cast("long") for d in range(2, k + 2)])

    q = F.col(query_col)
    rel_pos = qrels.filter(F.col(rel_col) > 0)

    joined = (
        runs.filter(F.col(rank_col) <= k)
        .join(
            rel_pos.select(
                q.alias("_q"), F.col(doc_col).alias("_d"),
                F.col(rel_col).alias("_r"),
            ),
            (q == F.col("_q")) & (F.col(doc_col) == F.col("_d")),
            "left",
        )
        .select(
            q.alias("_query"),
            F.col(rank_col).alias("_rank"),
            F.coalesce(F.col("_r"), F.lit(0)).alias("_rel"),
        )
    )
    per_run = joined.groupBy("_query").agg(
        F.sum(F.when(F.col("_rel") > 0, 1).otherwise(0))
        .cast("long")
        .alias("hits_k"),
        F.count(F.lit(1)).cast("long").alias("_n_ret"),
        F.min(F.when(F.col("_rel") > 0, F.col("_rank"))).alias("_first"),
        # DCG accumulates in decimal(38,0), not long: each discount
        # literal fits int64 (guarded above), but rel * discount does
        # NOT at high k (rel=2 with L//2 near 2^63 overflows). Decimal
        # keeps the math exact and ANSI-loud far past any real grading.
        F.sum(
            F.col("_rel").cast("decimal(19,0)")
            * F.element_at(disc, F.col("_rank").cast("int")).cast(
                "decimal(19,0)"
            )
        )
        .cast("decimal(38,0)")
        .alias("_dcg"),
    )

    ideal = (
        rel_pos.groupBy(q.alias("_query"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rel"),
            F.slice(
                F.sort_array(F.collect_list(F.col(rel_col)), asc=False),
                1,
                k,
            ).alias("_top"),
        )
        .withColumn(
            # same decimal widening as _dcg: rel * discount can pass
            # int64 even when both factors fit it.
            "_idcg",
            F.aggregate(
                F.zip_with(
                    F.col("_top"),
                    F.slice(disc, 1, F.size(F.col("_top"))),
                    lambda r, w: r.cast("decimal(19,0)")
                    * w.cast("decimal(19,0)"),
                ),
                F.lit(0).cast("decimal(38,0)"),
                lambda acc, x: (acc + x).cast("decimal(38,0)"),
            ),
        )
    )

    out = (
        per_run.join(ideal, "_query", "inner")
        .select(
            F.col("_query").alias(query_col),
            "n_rel",
            "hits_k",
            # all ratios are integral `div`, not floor(double): hits/n
            # are small, but _dcg * 1e6 crosses 2^53 around k=25 with
            # graded rels — decimal div keeps every engine on the same
            # integer at any k.
            F.expr("(hits_k * 1000000L) div n_rel").alias("recall_k_ppm"),
            F.expr("(hits_k * 1000000L) div _n_ret").alias("precision_k_ppm"),
            F.coalesce(
                F.expr("1000000L div _first"), F.lit(0).cast("long")
            ).alias("mrr_ppm"),
            F.expr(
                "CAST((CAST(_dcg AS DECIMAL(38,0)) * 1000000) div "
                "CAST(_idcg AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("ndcg_k_ppm"),
        )
    )
    return out
