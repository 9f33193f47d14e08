"""ClickHouse external-dictionary surface: hierarchy traversal.

Flat ``dictGet`` is just a broadcast join (this engine does it in every
labeler path — operators/label.py); what needs real machinery is the
HIERARCHICAL dictionary family: ``dictGetHierarchy(child)`` returns the
ancestor chain child->...->root, ``dictIsIn(child, anc)`` tests descent.
ClickHouse resolves those by walking an in-memory parent map; the Spark
form flattens the closure ONCE over the dictionary and broadcast-joins
facts against it.

Scale posture: dictionaries are broadcast-sized BY DEFINITION (ClickHouse
holds them in RAM on every server), so the iterative closure runs over
the dictionary alone — rounds = hierarchy depth (bounded, typically
< 10), each a self-join of a broadcast-size table with lineage cut per
round. Fact-side keys then resolve in ONE broadcast join with zero
shuffle and zero per-row walking; the driver loop is over DEPTH, never
rows. A cyclic parent chain would walk forever — rounds are capped at
``max_depth`` and an unfinished closure raises instead of silently
truncating.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def flatten_hierarchy(
    edges: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    max_depth: int = 16,
) -> DataFrame:
    """(id, path) for every dictionary id: path = [id, parent, ...,
    root] — the closure ClickHouse's hierarchical dictionary holds
    implicitly. Root rows have null ``parent_col`` (or a parent absent
    from the dictionary, which also terminates the chain)."""
    e = edges.select(
        F.col(id_col).alias("_eid"), F.col(parent_col).alias("_epar")
    ).localCheckpoint(eager=True)
    lookup = F.broadcast(
        e.select(F.col("_eid").alias("_lid"), F.col("_epar").alias("_lpar"))
    )
    cur = e.select(
        F.col("_eid").alias("id"),
        F.array(F.col("_eid")).alias("path"),
        F.col("_epar").alias("_tip"),
    )
    for _ in range(max_depth):
        if cur.filter(F.col("_tip").isNotNull()).limit(1).count() == 0:
            return cur.select("id", "path")
        cur = (
            cur.withColumn(
                "path",
                F.when(
                    F.col("_tip").isNotNull(),
                    F.concat(F.col("path"), F.array(F.col("_tip"))),
                ).otherwise(F.col("path")),
            )
            .join(lookup, cur["_tip"] == lookup["_lid"], "left")
            .withColumn("_tip", F.col("_lpar"))
            .drop("_lid", "_lpar")
            .localCheckpoint(eager=True)
        )
    raise ValueError(f"hierarchy deeper than max_depth={max_depth} (cycle?)")


def dict_get_hierarchy(
    keys: DataFrame,
    edges: DataFrame,
    key_col: str,
    id_col: str = "id",
    parent_col: str = "parent",
    out_col: str = "path",
    max_depth: int = 16,
) -> DataFrame:
    """ClickHouse ``dictGetHierarchy``: append the ancestor chain of
    ``key_col`` to every key row. Keys absent from the dictionary get
    path = [key] (ClickHouse null_value behavior). One broadcast join —
    the closure is computed once over the dictionary, never per fact
    row."""
    flat = flatten_hierarchy(edges, id_col, parent_col, max_depth)
    f = F.broadcast(
        flat.select(F.col("id").alias("_fid"), F.col("path").alias("_fpath"))
    )
    joined = keys.join(f, keys[key_col] == f["_fid"], "left")
    return joined.withColumn(
        out_col,
        F.coalesce(F.col("_fpath"), F.array(F.col(key_col))),
    ).drop("_fid", "_fpath")


def dict_is_in(ancestor: Column | str, path_col: str = "path") -> Column:
    """ClickHouse ``dictIsIn``: does ``ancestor`` appear on the
    already-resolved ancestor path? Compose after
    ``dict_get_hierarchy`` — resolve once, test many."""
    anc = F.col(ancestor) if isinstance(ancestor, str) else ancestor
    return F.array_contains(F.col(path_col), anc)


def dict_get_range(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    strict: bool = False,
) -> DataFrame:
    """ClickHouse ``range_hashed`` dictionary lookup: attach the dim row
    whose key matches AND whose ``[start, end]`` range (both ends
    inclusive, the ClickHouse rule) contains the fact's ``ts_col`` —
    ``dictGet('tariffs', 'rate', key, date)`` as a LEFT broadcast join.

    Ranges must be non-overlapping per key (the range_hashed contract;
    ClickHouse picks an arbitrary row on overlap — this engine refuses
    to guess: pass ``strict=True`` to ASSERT disjointness with one tiny
    dim self-join before the lookup). With disjoint ranges each fact
    matches at most one dim row, so the join is the whole plan: zero
    fact-side shuffle, no window, no dedup. Unmatched facts keep NULL
    dim columns — wrap with ``coalesce`` for dictGetOrDefault.

    Scale: dictionaries are broadcast-sized by definition (ClickHouse
    holds them in RAM on every server); the disjointness probe is
    dim × dim, never facts.
    """
    if strict:
        # Two probes cover every overlap: the self-join needs a strict
        # a.start < b.start to avoid matching a row with itself, which
        # would miss pairs sharing a START (equal starts always overlap
        # — both ranges contain the start — including exact duplicate
        # rows, where no inequality can tell a from b). Those are the
        # groupBy's job.
        dup = (
            dim.groupBy(*key_cols, start_col)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .count()
        )
        if dup:
            raise ValueError(
                f"range_hashed dim has {dup} (key, start) group(s) with "
                "more than one range — equal-start ranges always overlap"
            )
        a, b = dim.alias("a"), dim.alias("b")
        cond = F.lit(True)
        for k in key_cols:
            cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
        cond = (
            cond
            & (F.col(f"a.{start_col}") <= F.col(f"b.{end_col}"))
            & (F.col(f"b.{start_col}") <= F.col(f"a.{end_col}"))
            & (F.col(f"a.{start_col}") < F.col(f"b.{start_col}"))
        )
        n = a.join(b, cond).count()
        if n:
            raise ValueError(
                f"range_hashed dim has {n} overlapping range pair(s)"
            )
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (facts[k] == dim[k])
    cond = cond & facts[ts_col].between(dim[start_col], dim[end_col])
    return facts.join(F.broadcast(dim), cond, "left").drop(
        *[dim[k] for k in key_cols]
    )
