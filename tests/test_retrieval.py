"""Retrieval operators: BM25 validated against an independent pure-Python
implementation; inverted-index and keyword-search invariants."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from kubenetmon_spark.operators.retrieval import (
    bm25_topk,
    build_inverted_index,
    doc_lengths,
    keyword_topk,
    tokenize,
)
from kubenetmon_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
QUERY = ["spark", "join", "window"]


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip().lower()) if t]


def _py_bm25(rows, query, k1=1.2, b=0.75):
    docs = {doc_id: _py_tokens(text) for doc_id, text in rows}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {
        q: sum(1 for toks in docs.values() if q in toks)
        for q in query
    }
    scores = {}
    for doc_id, toks in docs.items():
        s = 0.0
        for q in query:
            tf = toks.count(q)
            if tf == 0 or df[q] == 0:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s > 0:
            scores[doc_id] = s
    return scores


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text").cache()


def test_bm25_matches_pure_python(spark, docs):
    got = {r.doc_id: r.score for r in bm25_topk(docs, QUERY, k=20).collect()}
    expected = _py_bm25([(r.doc_id, r.text) for r in docs.collect()], QUERY)
    top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(got) == [doc_id for doc_id, _ in top]
    for doc_id, score in top:
        assert got[doc_id] == pytest.approx(score, rel=1e-9)


def test_keyword_topk_subsumed_by_bm25_candidates(spark, docs):
    """Every keyword_topk hit contains at least one query term, and
    n_match/total_tf agree with a direct recount."""
    hits = keyword_topk(docs, QUERY, k=10).collect()
    assert len(hits) == 10
    text_by_id = {r.doc_id: r.text for r in docs.collect()}
    for h in hits:
        toks = _py_tokens(text_by_id[h.doc_id])
        matches = [t for t in toks if t in QUERY]
        assert h.n_match == len(set(matches))
        assert h.total_tf == len(matches)
    # ranking is (n_match desc, total_tf desc, doc_id)
    ranks = [(-h.n_match, -h.total_tf, h.doc_id) for h in hits]
    assert ranks == sorted(ranks)


def test_inverted_index_postings_sorted_and_exact(spark, docs):
    idx = {r.token: r for r in build_inverted_index(docs).collect()}
    # recount one mid-frequency term directly
    term = "spark"
    by_doc = {}
    for r in docs.collect():
        tf = _py_tokens(r.text).count(term)
        if tf:
            by_doc[r.doc_id] = tf
    row = idx[term]
    assert row.n_docs == len(by_doc)
    assert row.total_tf == sum(by_doc.values())
    assert row.postings == sorted(by_doc)


def test_inverted_index_caps_postings_but_not_stats(spark, docs):
    full = {r.token: r for r in build_inverted_index(docs).collect()}
    capped = {
        r.token: r for r in build_inverted_index(docs, max_postings=5).collect()
    }
    for term, row in capped.items():
        assert row.postings == full[term].postings[:5]
        assert row.n_docs == full[term].n_docs
        assert row.total_tf == full[term].total_tf


def test_doc_lengths_total_matches_token_count(spark, docs):
    toks = tokenize(docs)
    total = toks.count()
    assert (
        doc_lengths(toks).agg(F.sum("dl")).collect()[0][0] == total
    )


class TestPhraseSearch:
    def test_counts_match_python_reference(self, spark):
        import re

        from kubenetmon_spark.operators.retrieval import phrase_search

        docs = [
            (0, "a b c a b c"),          # "a b c" twice, "b c" twice
            (1, "a a a"),                # repeated-word phrase territory
            (2, "x y z"),                # no match
            (3, "a b"),                  # partial only for 3-word phrase
            (4, "c a b c a b c"),        # overlapping region
            (5, "A  B   c"),             # case/whitespace normalization
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])

        def ref(text, phrase):
            toks = re.split(r"\s+", text.strip().lower())
            p = phrase.split()
            n = sum(
                1
                for i in range(len(toks) - len(p) + 1)
                if toks[i : i + len(p)] == p
            )
            return n

        for phrase in ["a b c", "b c", "a a", "a"]:
            got = {
                r.doc_id: r.n_occurrences
                for r in phrase_search(df, phrase).collect()
            }
            for i, text in docs:
                want = ref(text, phrase)
                assert got.get(i, 0) == want, (phrase, i)

    def test_repeated_word_phrase(self, spark):
        from kubenetmon_spark.operators.retrieval import phrase_search

        df = spark.createDataFrame(
            [(0, "a a a a"), (1, "a b a")], ["doc_id", "text"]
        )
        got = {
            r.doc_id: r.n_occurrences
            for r in phrase_search(df, "a a").collect()
        }
        assert got == {0: 3}  # overlapping matches count; doc 1 has none


class TestRankingMetrics:
    def _run(self, spark, runs, qrels, k=3):
        from kubenetmon_spark.operators.retrieval import ranking_metrics

        r = spark.createDataFrame(
            runs, "query_id string, doc_id long, rank int"
        )
        q = spark.createDataFrame(
            qrels, "query_id string, doc_id long, rel int"
        )
        out = ranking_metrics(r, q, k=k)
        return {row.query_id: row for row in out.collect()}

    def test_hand_computed(self, spark):
        # k=3 -> L = lcm(2,3,4) = 12
        runs = [("q", 1, 1), ("q", 2, 2), ("q", 3, 3), ("q", 4, 4)]
        qrels = [("q", 2, 2), ("q", 3, 1), ("q", 9, 1)]
        got = self._run(spark, runs, qrels)["q"]
        assert (got.n_rel, got.hits_k) == (3, 2)
        assert got.recall_k_ppm == 666666
        assert got.precision_k_ppm == 666666
        assert got.mrr_ppm == 500000  # first relevant at rank 2
        # dcg = 2*(12//3) + 1*(12//4) = 11; idcg = 2*6+1*4+1*3 = 19
        assert got.ndcg_k_ppm == 11 * 1000000 // 19

    def test_no_relevant_retrieved(self, spark):
        runs = [("q", 1, 1), ("q", 2, 2)]
        qrels = [("q", 50, 1)]
        got = self._run(spark, runs, qrels)["q"]
        assert got.hits_k == 0 and got.mrr_ppm == 0
        assert got.recall_k_ppm == 0 and got.ndcg_k_ppm == 0

    def test_perfect_run_is_ppm_one(self, spark):
        runs = [("q", 1, 1), ("q", 2, 2)]
        qrels = [("q", 1, 2), ("q", 2, 1)]
        got = self._run(spark, runs, qrels)["q"]
        assert got.ndcg_k_ppm == 1000000
        assert got.recall_k_ppm == 1000000
        assert got.mrr_ppm == 1000000

    def test_rank_beyond_k_ignored_and_zero_rel_qrels_dropped(self, spark):
        runs = [("q", 1, 1), ("q", 2, 4)]  # rank 4 > k
        qrels = [("q", 2, 1), ("q", 1, 0)]  # rel 0 row is not relevant
        got = self._run(spark, runs, qrels)["q"]
        assert got.n_rel == 1 and got.hits_k == 0

    def test_queries_without_qrels_are_dropped(self, spark):
        runs = [("q", 1, 1), ("r", 1, 1)]
        qrels = [("q", 1, 1)]
        got = self._run(spark, runs, qrels)
        assert set(got) == {"q"}

    def test_k_validation(self, spark):
        from kubenetmon_spark.operators.retrieval import ranking_metrics

        with pytest.raises(ValueError):
            ranking_metrics(None, None, k=0)

    def test_k_ceiling_is_explicit(self, spark):
        # Regression: k past the int64 discount ceiling failed with an
        # opaque literal/cast error; it must raise a clear ValueError.
        # k=45 is the last supported value (lcm(2..47)//2 crosses int64
        # at k=46) and must still run end-to-end.
        from kubenetmon_spark.operators.retrieval import ranking_metrics

        with pytest.raises(ValueError, match="k <= 45"):
            ranking_metrics(None, None, k=46)
        got = self._run(spark, [("q", 1, 1)], [("q", 1, 1)], k=45)["q"]
        assert got.ndcg_k_ppm == 1_000_000

    def test_large_k_stays_integer_exact(self, spark):
        # Regression: at k=40, L = lcm(2..41) > 2^53 and the old
        # floor(double) discount/ppm math silently drifted off the
        # exact-integer contract. Compare against a pure-Python
        # integer reference at k=40.
        import math

        k = 40
        L = math.lcm(*range(2, k + 2))
        assert L > 2**53  # the regime the fix targets
        runs = [("q", d, d) for d in range(1, k + 1)]
        qrels = [("q", d, 1 + d % 3) for d in range(1, k + 1, 2)]
        got = self._run(spark, runs, qrels, k=k)["q"]

        rel = {d: r for _, d, r in qrels}
        dcg = sum(rel.get(d, 0) * (L // (d + 1)) for d in range(1, k + 1))
        top = sorted(rel.values(), reverse=True)[:k]
        idcg = sum(r * (L // (i + 2)) for i, r in enumerate(top))
        assert got.ndcg_k_ppm == (dcg * 1_000_000) // idcg
        assert got.mrr_ppm == 1_000_000 // 1  # doc 1 is relevant at rank 1
        assert got.recall_k_ppm == (got.hits_k * 1_000_000) // len(qrels)
