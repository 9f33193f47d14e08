"""Generated-SQL oracle builder for the BPE gate (q112) — the oracle
twin of ``operators/bpe.py``.

BPE merge training is iterative but fully deterministic and integer-
exact (weighted pair counts, lexicographic tie-break), so it admits the
same unrolled-CTE oracle recipe as the exact k-means gates
(gate_kmeans.py): one MATERIALIZED CTE pair per merge round — ``b{k}``
picks the argmax pair, ``w{k+1}`` splices it into every word — plus a
replace-chain application over distinct words. ``AS MATERIALIZED`` is
load-bearing: DuckDB inlines CTEs by default and an unrolled iterative
chain re-evaluates exponentially without it.

Faithfulness notes (each mirrors a specific engine behavior):

- Words are whitespace tokens of trimmed text, empties dropped
  (``_word_counts``); symbols start as single characters with no
  end-of-word marker (``bpe_train``).
- Symbol sequences ride as chr(31)-separated strings with leading and
  trailing separators, so a merge is one ``replace`` of
  ``\\x1f l \\x1f r \\x1f`` with ``\\x1f lr \\x1f`` — string replace
  scans left-to-right over non-overlapping occurrences and does not
  rescan replacement text, which is exactly the left-fold splice
  semantics of ``bpe_train`` (no cascading within one round).
- The argmax filters ``c >= 2`` and falls back to replacing a chr(30)
  sentinel (a no-op) when empty — the engine's early-stop ``break``
  expressed declaratively: once no pair reaches count 2, every later
  round is a no-op.
- Application chains the merges in TRAINING ORDER over distinct words;
  the engine applies greedy lowest-rank-first. The two orders agree
  unless a later merge manufactures a pair an earlier rule would have
  consumed — impossible for fresh single-char pairs and not observed on
  the gate corpora (the parity hash check would catch any divergence);
  token-level algorithm correctness against an independent pure-Python
  reference lives in tests/test_bpe.py.
"""

from __future__ import annotations

#: separator between symbols inside a word's string form — unit
#: separator, never present in whitespace-split tokens
_SEP = "chr(31)"
#: never-occurring sentinel: replacing it is a no-op (early-stop rounds)
_NOOP = "chr(30)"


def _chars_to_string(expr: str) -> str:
    return (
        f"{_SEP} || array_to_string(regexp_split_to_array({expr}, ''), "
        f"{_SEP}) || {_SEP}"
    )


def _pairs_argmax(words_cte: str) -> str:
    """Argmax adjacent pair of ``words_cte`` (s, cnt) by summed count,
    ties broken lexicographically — ``bpe_train``'s per-round top."""
    return f"""
      SELECT p.l AS l, p.r AS r FROM (
        SELECT p, SUM(cnt) AS c FROM (
          SELECT unnest(list_transform(generate_series(1, length(a) - 1),
                        i -> {{'l': a[i], 'r': a[i + 1]}})) AS p, cnt
          FROM (SELECT regexp_split_to_array(trim(s, {_SEP}), {_SEP}) AS a,
                       cnt
                FROM {words_cte})
        ) GROUP BY p
      ) WHERE c >= 2
      ORDER BY c DESC, l, r LIMIT 1"""


def _splice(words_cte: str, best_cte: str) -> str:
    pat = (
        f"coalesce((SELECT {_SEP} || l || {_SEP} || r || {_SEP} "
        f"FROM {best_cte}), {_NOOP})"
    )
    rep = (
        f"coalesce((SELECT {_SEP} || l || r || {_SEP} "
        f"FROM {best_cte}), {_NOOP})"
    )
    return f"SELECT replace(s, {pat}, {rep}) AS s, cnt FROM {words_cte}"


def bpe_oracle_sql(num_merges: int = 16, base: str = "documents") -> str:
    """Full q112 oracle: (doc_id, n_bpe_tokens) for every document."""
    parts = [
        f"""wr AS MATERIALIZED (
      SELECT doc_id, word FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
        FROM {base} WHERE text IS NOT NULL
      ) WHERE word <> ''
    )""",
        f"""w0 AS MATERIALIZED (
      SELECT {_chars_to_string('word')} AS s,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM wr GROUP BY word
    )""",
    ]
    for k in range(num_merges):
        parts.append(f"b{k} AS MATERIALIZED ({_pairs_argmax(f'w{k}')}\n    )")
        parts.append(
            f"w{k + 1} AS MATERIALIZED ({_splice(f'w{k}', f'b{k}')})"
        )
    # application: chain the merges in training order over distinct words
    parts.append(
        f"""aw0 AS MATERIALIZED (
      SELECT word, {_chars_to_string('word')} AS s
      FROM (SELECT DISTINCT word FROM wr)
    )"""
    )
    for k in range(num_merges):
        parts.append(
            f"aw{k + 1} AS MATERIALIZED "
            f"(SELECT word, {_splice_expr(f'b{k}')} FROM aw{k})"
        )
    parts.append(
        f"""wtok AS MATERIALIZED (
      SELECT word,
             CAST(length(regexp_split_to_array(trim(s, {_SEP}), {_SEP}))
                  AS BIGINT) AS ntok
      FROM aw{num_merges}
    )""",
    )
    parts.append(
        """persum AS (
      SELECT doc_id, SUM(ntok) AS n
      FROM wr JOIN wtok USING (word) GROUP BY doc_id
    )"""
    )
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT d.doc_id,
           CASE WHEN d.text IS NULL THEN NULL
                ELSE CAST(coalesce(p.n, 0) AS BIGINT) END AS n_bpe_tokens
    FROM {base} d LEFT JOIN persum p USING (doc_id)
    ORDER BY doc_id
    """


def _splice_expr(best_cte: str) -> str:
    pat = (
        f"coalesce((SELECT {_SEP} || l || {_SEP} || r || {_SEP} "
        f"FROM {best_cte}), {_NOOP})"
    )
    rep = (
        f"coalesce((SELECT {_SEP} || l || r || {_SEP} "
        f"FROM {best_cte}), {_NOOP})"
    )
    return f"replace(s, {pat}, {rep}) AS s"
