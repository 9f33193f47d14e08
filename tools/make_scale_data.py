#!/usr/bin/env python
"""Build a larger scale factor from sf0.1 by id-shifted replication —
the input for tools/scale_sweep.py and the SCALE.md scaling study.

    python tools/make_scale_data.py [COPIES] [SRC] [DST] [--off=N] [--docs=word-suffix]

Defaults: 10 copies of /root/testdata/sf0.1 into .scale/sf1.

Second-level builds (sf10 from sf1) pass ``--off=100000000`` so the id
blocks of the ten sf1 copies don't collide, and ``--docs=word-suffix``:
the rotation trick does NOT compose with itself (two rotation passes
whose total shifts coincide mod doc length yield near-identical texts,
and the dedup operators' TRUE output would grow with the data
construction, not the corpus). Word-suffixing every token with the copy
id keeps every within-copy duplicate relation EXACTLY (the same
transform applies to both sides of any in-copy near-dup pair) while
making cross-copy shingle/span overlap literally zero — vocabulary
grows linearly with copies, which is what genuinely-new data does.
Embeddings keep the cyclic rotation; at 100 copies total rotation can
wrap dim=64, so cosine-near-dup outputs are NOT size-trustworthy on a
second-level build (IVF/kNN top-k shapes are — output is k-bounded).

Design rules (each one was learned the hard way — see SCALE.md):

- every table's join keys shift by OFF per copy so referential joins
  stay valid (orders.o_custkey still hits customer, etc.);
- user_id shifts by the REAL user count, not OFF: squared-id moment
  sums should test realistic magnitudes, not 10^7-sized ids;
- copies must NOT be duplicates of each other, or every pair-emitting
  dedup operator's TRUE output grows ~copies² and the sweep measures
  the data, not the engine:
  * documents: per-copy word rotation + unique suffix (kills cross-copy
    n-gram overlap, keeps vocabulary/length distributions),
  * part names: per-copy suffix words with pairwise edit distance > 2
    (a ' v3' vs ' v7' suffix is distance 1 — still inside the
    levenshtein<=2 threshold),
  * embeddings: per-copy cyclic dimension rotation (a scaled copy has
    cosine 1.0 with the original; a rotated one is ~orthogonal);
- events.ts is cast to TIMESTAMP_NS so the parquet type matches the
  driver's nanosecond timestamps under nanosAsLong.
"""

from __future__ import annotations

import sys
from pathlib import Path

OFF = 10_000_000
PART_WORDS = ["", " crimson", " emerald", " golden", " ivory", " marbled",
              " obsidian", " quartz", " russet", " topaz"]


def main() -> int:
    import duckdb

    global OFF
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    copies = int(args[0]) if len(args) > 0 else 10
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    dst = args[2] if len(args) > 2 else str(
        Path(__file__).resolve().parent.parent / ".scale/sf1"
    )
    doc_mode = "rotate"
    for a in sys.argv[1:]:
        if a.startswith("--off="):
            OFF = int(a.split("=", 1)[1])
        elif a.startswith("--docs="):
            doc_mode = a.split("=", 1)[1]
    assert doc_mode in ("rotate", "word-suffix"), doc_mode
    assert copies <= len(PART_WORDS), "add more pairwise-distant suffix words"
    Path(dst).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    rng = f"(SELECT unnest(range(0, {copies})) * {OFF} AS off) c"

    def copy_to(table: str, select: str, order: str) -> None:
        con.execute(
            f"COPY (SELECT {select} FROM '{src}/{table}.parquet', {rng} "
            f"ORDER BY {order}) TO '{dst}/{table}.parquet' "
            "(FORMAT PARQUET, COMPRESSION ZSTD, ROW_GROUP_SIZE 200000)"
        )
        n = con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n}")

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet'"
            " (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
    copy_to("customer",
            "(c_custkey + c.off)::BIGINT AS c_custkey, c_name, c_nationkey,"
            " c_acctbal, c_mktsegment", "c_custkey")
    copy_to("supplier",
            "(s_suppkey + c.off)::BIGINT AS s_suppkey, s_name, s_nationkey,"
            " s_acctbal", "s_suppkey")
    name_case = "CASE c.off // {o} ".format(o=OFF) + " ".join(
        f"WHEN {i} THEN p_name || '{w}'" if w else f"WHEN {i} THEN p_name"
        for i, w in enumerate(PART_WORDS)
    ) + " END"
    copy_to("part",
            f"(p_partkey + c.off)::BIGINT AS p_partkey, {name_case} AS p_name,"
            " p_brand, p_type, p_size, p_retailprice", "p_partkey")
    copy_to("orders",
            "(o_orderkey + c.off)::BIGINT AS o_orderkey,"
            " (o_custkey + c.off)::BIGINT AS o_custkey, o_orderstatus,"
            " o_totalprice, o_orderdate, o_orderpriority", "o_orderkey")
    copy_to("lineitem",
            "(l_orderkey + c.off)::BIGINT AS l_orderkey,"
            " (l_partkey + c.off)::BIGINT AS l_partkey,"
            " (l_suppkey + c.off)::BIGINT AS l_suppkey, l_linenumber,"
            " l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,"
            " l_linestatus, l_shipdate", "l_orderkey")
    n_users = con.sql(
        f"SELECT max(user_id) + 1 FROM '{src}/events.parquet'"
    ).fetchone()[0]
    copy_to("events",
            "(event_id + c.off)::BIGINT AS event_id, ts::TIMESTAMP_NS AS ts,"
            f" (user_id + (c.off // {OFF}) * {n_users})::BIGINT AS user_id,"
            " event_type, value, props", "event_id")
    if doc_mode == "rotate":
        doc_text = (
            "CASE WHEN c.off = 0 THEN text ELSE array_to_string("
            f"  list_concat(string_split(text, ' ')[(1 + (c.off // {OFF}) * 7"
            "     % greatest(len(string_split(text, ' ')), 1)):],"
            f"   string_split(text, ' ')[1:((c.off // {OFF}) * 7"
            "     % greatest(len(string_split(text, ' ')), 1))]), ' ')"
            f" || ' v' || CAST(c.off // {OFF} AS VARCHAR) END"
        )
        doc_chars = (
            "CASE WHEN c.off = 0 THEN n_chars ELSE n_chars +"
            f" length(' v' || CAST(c.off // {OFF} AS VARCHAR)) END"
        )
    else:  # word-suffix: every token tagged with the copy id (see header)
        doc_text = (
            "CASE WHEN c.off = 0 THEN text ELSE array_to_string("
            "  list_transform(string_split(text, ' '), w -> CASE WHEN w = ''"
            f"    THEN w ELSE w || '_w' || CAST(c.off // {OFF} AS VARCHAR)"
            "    END), ' ') END"
        )
        doc_chars = (
            "CASE WHEN c.off = 0 THEN n_chars ELSE"
            f" length({doc_text}) END"
        )
    copy_to("documents",
            "(doc_id + c.off)::BIGINT AS doc_id,"
            f" {doc_text} AS text,"
            " lang, source,"
            f" {doc_chars} AS n_chars",
            "doc_id")
    copy_to("embeddings",
            "(vec_id + c.off)::BIGINT AS vec_id,"
            " CASE WHEN c.off = 0 THEN embedding ELSE list_concat("
            f"  embedding[(c.off // {OFF} + 1):],"
            f"  embedding[1:(c.off // {OFF})]) END AS embedding, label",
            "vec_id")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
