"""Query/template normalization — ClickHouse ``normalizeQuery`` /
``normalizedQueryHash`` re-expressed as engine-portable column
expressions.

ClickHouse uses these to fingerprint query-log entries ("the same
query modulo literals" — reference users run them over
system.query_log); a training-data pipeline uses the identical trick
to fingerprint templated/boilerplate documents (instruction data
where only the filled-in values differ). Both are the same operation:
replace literals with placeholders, hash the skeleton.

Normalization rules (the documented ClickHouse behavior, portable
subset): single-quoted string literals -> ``?``, then standalone
numeric literals (integer/decimal/exponent at word boundaries —
identifier-embedded digits like ``word3`` are preserved) -> ``?``,
then runs of ``?, ?, ...`` (IN-lists / VALUES rows) collapse to
``?..``, then whitespace runs collapse to one space and the result is
trimmed. Every pattern parses identically under Java regex (Spark)
and RE2 (DuckDB/ClickHouse) — word boundaries only, no lookbehind —
so the whole chain is reproducible verbatim in ANSI-SQL oracles
(:func:`sql_normalize_query` emits the same chain as SQL text).

Scale posture: pure narrow projections — no UDF, no shuffle; the
dedup/groupBy a caller adds on the hash is one hash agg.

Reference: ClickHouse string functions normalizeQuery /
normalizedQueryHash / normalizeQueryKeepNames.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: literal-matching patterns, applied in order; shared verbatim with
#: the SQL oracle builder below.
#: - string literals handle SQL doubled-quote escapes ('it''s' is ONE
#:   literal, not two) so equivalent templates hash identically;
#: - whitespace is an EXPLICIT class, not \s: Java's \s includes
#:   vertical tab (\x0B) while RE2's does not — the explicit class is
#:   the intersection both engines parse identically (verified:
#:   bare \s diverges on \x0B between Spark and DuckDB).
_STRING_LIT = "'([^']|'')*'"
_NUM_LIT = r"\b[0-9]+(\.[0-9]+)?([eE][-+]?[0-9]+)?\b"
_WS_CLASS = r"[ \t\n\x0B\f\r]"
_LIST_OF_PLACEHOLDERS = rf"\?({_WS_CLASS}*,{_WS_CLASS}*\?)+"
_WS = _WS_CLASS + "+"


def normalize_query(col: Column) -> Column:
    """The ``normalizeQuery`` skeleton of a templated string."""
    out = F.regexp_replace(col, _STRING_LIT, "?")
    out = F.regexp_replace(out, _NUM_LIT, "?")
    out = F.regexp_replace(out, _LIST_OF_PLACEHOLDERS, "?..")
    out = F.regexp_replace(out, _WS, " ")
    return F.trim(out)


def normalized_query_hash(col: Column) -> Column:
    """``normalizedQueryHash``: a 64-bit fingerprint of the skeleton.

    ClickHouse uses sipHash64 internally; this repo's documented
    64-bit surrogate is xxhash64 (see the sipHash64 note in sql.py).
    Equal skeletons collide by construction; oracles compare on the
    ``normalize_query`` text (or its md5), never on the engine hash.
    """
    return F.xxhash64(normalize_query(col))


def sql_normalize_query(expr: str) -> str:
    """The identical normalization chain as DuckDB SQL text, for
    oracle construction — keeps the two implementations visibly in
    lockstep (patterns shared verbatim; only the escaping differs)."""

    def q(pat: str) -> str:
        return pat.replace("'", "''")

    s = f"regexp_replace({expr}, '{q(_STRING_LIT)}', '?', 'g')"
    s = f"regexp_replace({s}, '{q(_NUM_LIT)}', '?', 'g')"
    s = f"regexp_replace({s}, '{q(_LIST_OF_PLACEHOLDERS)}', '?..', 'g')"
    s = f"regexp_replace({s}, '{q(_WS)}', ' ', 'g')"
    return f"trim({s})"
