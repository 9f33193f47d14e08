"""Fuzzy string matching: blocked edit-distance self-join.

Record-linkage / near-duplicate matching for short strings (names, product
titles, entity labels) — the classic LLM-data-curation and MDM primitive
that complements the token-set dedup family (``operators/dedup.py``): edit
distance catches typo-level variants that shingle Jaccard misses on short
strings.

Scale design: an all-pairs edit-distance join is O(n^2) and never viable;
the standard fix is **blocking** — only pairs sharing a cheap-to-compute
block key are compared. The join is then an equi-join on the block key
(broadcast or shuffle, Catalyst's choice), and within a block two
scan-side prefilters run before the quadratic comparator:

- length band: |len(a) - len(b)| <= d is a necessary condition for
  levenshtein(a, b) <= d and costs two pushed-down ints;
- Spark's 3-arg ``levenshtein(l, r, threshold)`` short-circuits the DP
  once the threshold is exceeded (O(d * min(len)) instead of O(len^2)).

Skewed blocks (one hot key) split under AQE skew-join handling; a hard
``max_block`` cap is deliberately NOT applied here because dropping rows
changes answers — callers with pathological blocks should refine the
block key instead (e.g. add a length bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str | Column,
    max_distance: int,
    probe_partitions: int | None = None,
    length_bucket: int | None = None,
) -> DataFrame:
    """All pairs (a, b) with ``a.id < b.id`` sharing a block key and
    ``levenshtein(a.text, b.text) <= max_distance``.

    Returns columns: ``block``, ``a_id``, ``b_id``, ``distance``.

    The comparator work is quadratic in block size while the *input* is
    tiny, so when the dim side broadcasts, task parallelism is inherited
    from the input file layout — often a single file, i.e. one task doing
    all the O(block^2) comparisons. ``probe_partitions`` (default: the
    session's shuffle parallelism) repartitions the probe side first;
    a cheap round-robin exchange of n rows buys n_cores-way parallelism
    over the n^2 comparator.

    ``length_bucket=W`` refines the equi-key with a ``len // W`` bucket
    — LOSSLESSLY: a qualifying pair's lengths differ by at most
    ``max_distance``, so the probe side keeps its single bucket while
    the build side fans out to every bucket its length could pair with
    (``(len-d)//W .. (len+d)//W`` — at most ``2d/W + 2`` copies). Every
    qualifying pair still meets exactly once (on the PROBE row's
    bucket), but a hot block key now splits ~W ways before the
    quadratic comparator — the standard hot-block refinement, applied
    as a key instead of a row-dropping cap so answers never change.
    """
    block = F.col(block_col) if isinstance(block_col, str) else block_col
    slim = df.select(
        block.alias("block"),
        F.col(id_col).alias("a_id"),
        F.col(text_col).alias("a_text"),
        F.length(text_col).alias("a_len"),
    )
    n_parts = probe_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    slim = slim.repartition(n_parts)
    right = slim.select(
        F.col("block"),
        F.col("a_id").alias("b_id"),
        F.col("a_text").alias("b_text"),
        F.col("a_len").alias("b_len"),
    )
    join_keys = ["block"]
    if length_bucket:
        w = int(length_bucket)
        slim = slim.withColumn(
            "lbucket", F.floor(F.col("a_len") / w).cast("long")
        )
        right = right.withColumn(
            "lbucket",
            F.explode(
                F.sequence(
                    F.floor((F.col("b_len") - max_distance) / w),
                    F.floor((F.col("b_len") + max_distance) / w),
                ).cast("array<long>")
            ),
        )
        join_keys.append("lbucket")
    # Broadcast the build side explicitly: with two equally-tiny inputs
    # Catalyst may broadcast the probe side instead, which would collapse
    # parallelism back to the build side's file layout.
    pairs = slim.join(F.broadcast(right), on=join_keys).filter(
        (F.col("a_id") < F.col("b_id"))
        & (F.abs(F.col("a_len") - F.col("b_len")) <= max_distance)
    )
    # 3-arg levenshtein (threshold-bounded DP) returns -1 when the bound
    # is exceeded; keep only true matches and re-emit the exact distance.
    d = F.levenshtein(F.col("a_text"), F.col("b_text"), int(max_distance))
    return (
        pairs.withColumn("distance", d.cast("long"))
        .filter(F.col("distance") >= 0)
        .select("block", "a_id", "b_id", "distance")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str | Column,
    max_distance: int,
    window: int = 8,
) -> DataFrame:
    """Sorted-neighborhood fuzzy linkage (Hernández & Stolfo's classic
    merge/purge method): within each block, sort records by text and
    compare each record only against the next ``window`` records in
    sort order, keeping pairs with ``levenshtein <= max_distance``.

    Returns ``(block, a_id, b_id, distance)`` where ``(a_id, b_id)``
    is the pair normalized to ``a_id < b_id``; a qualifying neighbor
    pair is emitted exactly once (the sort order ``(text, id)`` is a
    total order, so each unordered pair has one forward offset).

    **Scale posture — the LINEAR member of the fuzzy family.**
    :func:`blocked_levenshtein_pairs` is exact within a block but does
    O(block²) comparator work, which is output-unbounded on
    vocabulary-limited corpora (the r6 sf10 sweep measured ~5.5e9
    qualifying pairs on TPC-H part names — hours of legitimate output,
    excluded from sweeps as q88). This operator bounds BOTH the
    comparator and the output at ``n * window`` by construction, and
    the PLAN is join-free: the neighborhood is materialized by
    ``lead(j)`` columns over one window spec, so the whole operator is
    scan -> one exchange on block -> one sort -> Window -> explode ->
    threshold-bounded 3-arg levenshtein — no self-join, no second
    scan, nothing to broadcast (the first cut ranked-and-self-joined,
    which planned a broadcast of the entire ranked table: fine at test
    SF, wrong at 100 TB). ``window`` is a PLAN-WIDTH knob (2·window
    lead expressions), sized for the classic merge/purge 10-20 range.
    Recall is the trade: only near-neighbors IN SORT ORDER are
    compared — the standard record-linkage accuracy/cost dial (raise
    ``window`` or union a second pass with a different sort key for
    more recall). Skewed hot blocks cost sort time, never quadratic
    comparator time.
    """
    block = F.col(block_col) if isinstance(block_col, str) else block_col
    slim = df.select(
        block.alias("block"),
        F.col(id_col).alias("a_id"),
        F.col(text_col).alias("a_text"),
    )
    w = Window.partitionBy("block").orderBy("a_text", "a_id")
    neighborhood = F.array(
        *[
            F.struct(
                F.lead("a_id", j).over(w).alias("b_id"),
                F.lead("a_text", j).over(w).alias("b_text"),
            )
            for j in range(1, int(window) + 1)
        ]
    )
    # window expressions must be projected before the generator sees
    # them (Spark rejects lead() under explode): one select computes
    # the neighborhood array, the next explodes it
    pairs = (
        slim.select("block", "a_id", "a_text", neighborhood.alias("_nbs"))
        .select(
            "block", "a_id", "a_text", F.explode("_nbs").alias("_nb")
        )
        .filter(F.col("_nb.b_id").isNotNull())
        .select(
            "block",
            "a_id",
            "a_text",
            F.col("_nb.b_id").alias("b_id"),
            F.col("_nb.b_text").alias("b_text"),
        )
    )
    d = F.levenshtein(
        F.col("a_text"), F.col("b_text"), int(max_distance)
    )
    return (
        pairs.withColumn("distance", d.cast("long"))
        .filter(F.col("distance") >= 0)
        .select(
            "block",
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
            "distance",
        )
    )


def entity_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str | Column,
    max_distance: int,
    length_bucket: int | None = 8,
) -> DataFrame:
    """Entity resolution end to end: records -> (cluster_rep, n_records,
    member_sum) identity clusters, where records link when their texts
    are within ``max_distance`` edits inside a block.

    The scale move: EXACT-duplicate texts collapse FIRST. Real entity
    data is duplication-heavy (the same name appears hundreds of times);
    identical texts are trivially the same entity, so the quadratic
    comparator and the iterative connected components run over the
    DISTINCT-text table (one hash aggregation to build), and per-text
    membership stats (count, id-sum, min-id) re-expand at the end with
    one broadcast-sized join. Cost becomes O(distinct_texts^2 / blocks)
    + O(distinct-text graph) instead of O(rows^2 / blocks): on 200k
    records over 640 distinct names that is a 100,000x smaller pair
    space, and it is invariant to how duplicated the corpus gets.

    Clusters equal the row-level formulation exactly: contracting
    identical-text nodes (pairwise distance 0, always linked) preserves
    components; the cluster representative is the min member id.
    Texts with no fuzzy partner still form (exact-duplicate) clusters.

    **Precondition**: ``block_col`` must be a PURE FUNCTION of the text
    (e.g. a prefix, soundex, or length bucket of ``text_col``) — the
    distinct-text contraction keeps one block per text (``F.min`` for
    determinism), so a blocking key derived from anything else (another
    column, arbitrary row state) would arbitrarily collapse a text's
    other blocks and change which candidate pairs are generated. The
    row-level-equality claim above holds only under this precondition.
    """
    stats = (
        df.groupBy(F.col(text_col).alias("_text"))
        .agg(
            F.min(id_col).alias("_rep"),
            F.count("*").alias("_n"),
            F.sum(id_col).alias("_sum"),
            # min, NOT first: deterministic under any partitioning. With
            # the block-is-function-of-text precondition all rows of a
            # text agree, so min == the unique block.
            F.min(
                F.col(block_col) if isinstance(block_col, str) else block_col
            ).alias("_block"),
        )
    )
    pairs = blocked_levenshtein_pairs(
        stats,
        id_col="_rep",
        text_col="_text",
        block_col="_block",
        max_distance=max_distance,
        length_bucket=length_bucket,
    )
    from kubenetmon_spark.operators.graph import duplicate_clusters

    cc = duplicate_clusters(pairs, id_1="a_id", id_2="b_id").select(
        F.col("node").alias("_rep"), "cluster_rep"
    )
    labeled = stats.join(cc, "_rep", "left").withColumn(
        "cluster_rep", F.coalesce(F.col("cluster_rep"), F.col("_rep"))
    )
    return (
        labeled.groupBy("cluster_rep")
        .agg(F.sum("_n").alias("n_records"), F.sum("_sum").alias("member_sum"))
    )
