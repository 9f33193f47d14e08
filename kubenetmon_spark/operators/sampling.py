"""Deterministic, engine-portable sampling.

``df.sample()`` is seed-dependent AND partitioning-dependent — rerun
the job with different file splits and you get a different sample,
which is unusable for reproducible training-data curation. Hash
sampling fixes that: a row is kept iff a hash of its stable id falls
under the keep threshold. The decision is a pure function of the id,
so it is identical across runs, engines (md5 is md5 everywhere),
partitionings, and scale factors, and a row's fate never depends on
which executor saw it.

Scale posture: a narrow filter on a scan — no shuffle, no state,
pushes down column pruning, and composes with stratification for free
(the hash is uniform within every stratum because it ignores the
stratum column entirely).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 4 hex chars = 65536 buckets; thresholds resolve to 1/65536 granularity.
_BUCKETS = 16**4


def hash_keep(id_col: Column, keep_bp: int) -> Column:
    """Boolean keep-decision: md5(id) falls in the first keep_bp/10000
    of the [0, ffff] hex space. Lexicographic compare on fixed-width
    lowercase hex == numeric compare, and both Spark and DuckDB emit
    lowercase hex md5, so the predicate is engine-portable verbatim.

    keep_bp >= 10000 keeps EVERYTHING: the naive threshold would be
    '10000' — five chars, lexicographically BELOW 'ffff' — silently
    keeping only 1/16 of rows; 'g' sorts above every hex digit.

    NULL ids have no hash: they are deterministically DROPPED for any
    partial rate (md5(NULL) is NULL — made explicit here rather than
    left to three-valued logic) and KEPT when keep_bp >= 10000, so the
    keep-everything contract holds on dirty data too. SQL twins
    (WHERE substr(md5(...),1,4) < 't') agree on every non-NULL id and
    drop NULL ids — identical to this predicate below 10000."""
    pred = F.substring(F.md5(id_col.cast("string")), 1, 4) < F.lit(
        "g" if keep_bp >= 10000 else format(int(_BUCKETS * keep_bp / 10000), "04x")
    )
    return F.coalesce(pred, F.lit(keep_bp >= 10000))


def deterministic_sample(df: DataFrame, id_col: str, keep_bp: int) -> DataFrame:
    """Keep ~keep_bp/10000 of rows, decided per-row by md5(id)."""
    return df.filter(hash_keep(F.col(id_col), keep_bp))


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: list[str],
    n: int,
    id_col: str,
    bounded: bool = True,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum — the balanced
    eval-set / per-source quota draw ``hash_keep`` cannot give (a rate
    is proportional; a quota is absolute). Deterministic: the winners
    are the ``n`` smallest ``md5(id)`` per stratum (ties broken by
    ``id``), a pure function of the data — identical across runs,
    engines, partitionings, and scale factors.

    Scale posture (``bounded=True``, default): a per-partition bottom-n
    fold (the mergeable-sketch build from operators/sketch.py) runs
    BEFORE the per-stratum sort, so the shuffle carries at most
    ``n x num_partitions`` rows per stratum instead of the whole
    stratum — a billion-row stratum shuffles kilobytes. The global
    bottom-n of a union is the bottom-n of per-part bottom-ns, so the
    result is bit-identical to the unbounded window (property of the
    fold; see _partition_bottom_k's correctness note). ``bounded=False``
    keeps the single window sort — simpler plan, same answer.

    ``id_col`` must uniquely identify rows; duplicate ids make the
    rank among their copies arbitrary (same caveat as any hash draw).
    NULL ids fail loudly: a NULL hash sorts FIRST in Spark's window but
    LAST in the bounded fold's pandas sort, so letting it through would
    make ``bounded`` silently change which rows win the draw.
    """
    from pyspark.sql.window import Window

    from kubenetmon_spark.operators.sketch import _partition_bottom_k

    rest = [c for c in df.columns if c not in strata_cols and c != id_col]
    h = F.coalesce(
        F.when(
            F.col(id_col).isNull(),
            F.raise_error(
                F.lit(
                    "stratified_sample_exact: NULL id — id_col must "
                    "uniquely identify rows; filter or fill NULL ids first"
                )
            ).cast("string"),
        ),
        F.md5(F.col(id_col).cast("string")),
    )
    sel = df.select(
        *strata_cols,
        h.alias("_h"),
        id_col,
        *rest,
    )
    if bounded:
        # sort by (_h, id) only: id is unique per contract, so the
        # order is total without touching payload columns (array/map
        # payloads are unhashable in the pandas fold's sort)
        sel = _partition_bottom_k(
            sel, list(strata_cols), n, dedup=False, sort_cols=["_h", id_col]
        )
    w = Window.partitionBy(*strata_cols).orderBy("_h", id_col)
    return (
        sel.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_h", "_rn")
        .select(*df.columns)
    )


def leakage_safe_split(
    docs: DataFrame,
    dup_pairs: DataFrame,
    id_col: str = "doc_id",
    train_bp: int = 9000,
) -> DataFrame:
    """Near-dup-aware train/test split: the split decision is made per
    duplicate CLUSTER, not per document, so two near-duplicates can
    never straddle the boundary — the leakage a naive hash split
    silently ships (the eval twin of decontamination: here the corpus
    is split against itself).

    ``dup_pairs``: (id_1, id_2) near-duplicate edges (minhash_lsh_pairs
    / cosine_near_dup_pairs output). Every document resolves to its
    cluster representative (min id via connected components; documents
    in no pair are their own singleton cluster), and the cluster rep —
    not the doc id — feeds the deterministic :func:`hash_keep`
    decision. Output: (id, cluster_rep, split 'train'|'test').

    Scale posture: components run on the EDGE set (tiny next to the
    corpus — near-dup pairs), the corpus itself takes one broadcast
    left join of the node->rep map and a narrow hash filter; no corpus
    shuffle. The rep map is bounded by the number of duplicated docs,
    not corpus size.
    """
    from kubenetmon_spark.operators.graph import duplicate_clusters

    reps = duplicate_clusters(dup_pairs).select(
        F.col("node").alias("_n"), F.col("cluster_rep").alias("_rep")
    )
    withrep = docs.join(
        F.broadcast(reps), docs[id_col] == F.col("_n"), "left"
    ).withColumn(
        "cluster_rep", F.coalesce(F.col("_rep"), F.col(id_col))
    )
    return withrep.select(
        F.col(id_col),
        "cluster_rep",
        F.when(hash_keep(F.col("cluster_rep"), train_bp), F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
