"""Data-quality constraint auditing (the Deequ/dbt-test capability):
declarative row-level rules and referential-integrity checks evaluated
in ONE pass, returning violation counts — the admission gate in front
of every table this engine writes (the reference enforces its
invariants in Go code before INSERT, labeler.go's error taxonomy;
at 100 TB the checks move into the engine).

Scale posture: ``check_rules`` folds every rule into a single
aggregation over one scan — adding a rule adds an expression, never a
pass. ``referential_violations`` is one left-anti join against the
(usually broadcast-sized, pre-projected) parent key set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate named row-level constraints; returns one row per rule:
    (rule, n_rows, n_violations, viol_bp). A rule's Column is the
    PASS predicate; NULL predicate results count as violations (a
    constraint that cannot be evaluated did not pass — the SQL
    three-valued-logic trap made explicit).

    One scan, one aggregation, no shuffle beyond the final 1-row-per-
    rule reduce: every rule is a conditional-sum expression in the
    same hash agg.
    """
    if not rules:
        raise ValueError("need at least one rule")
    aggs = [F.count("*").alias("n_rows")]
    for name, pred in rules.items():
        aggs.append(
            # coalesce: SUM over zero rows is NULL — an empty partition
            # must audit as 0 violations, not NULL
            F.coalesce(
                F.sum(F.when(pred.isNull() | ~pred, 1).otherwise(0)),
                F.lit(0),
            ).alias(f"_v_{name}")
        )
    one = df.agg(*aggs)
    pairs = F.array(
        *[
            # backticks: rule names are arbitrary labels — a dot in
            # F.col would otherwise parse as a struct-field reference
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"`_v_{name}`").alias("n_violations"),
            )
            for name in rules
        ]
    )
    return one.select(
        "n_rows", F.explode(pairs).alias("p")
    ).select(
        F.col("p.rule").alias("rule"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("p.n_violations").cast("long").alias("n_violations"),
        F.when(
            F.col("n_rows") > 0,
            F.floor(
                F.col("p.n_violations") * 10000 / F.col("n_rows")
            ),
        )
        .otherwise(0)
        .cast("long")
        .alias("viol_bp"),
    )


def referential_violations(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Orphaned-foreign-key audit: child rows whose key has no parent.
    Returns the orphan rows (count them or dead-letter them). NULL
    child keys are orphans (they reference nothing).

    One left-anti join; project the parent to its key column first so
    a dimension of any width broadcasts by its key size.
    """
    p = parent.select(F.col(parent_key).alias("__pk")).distinct()
    return child.join(
        p, child[child_key] == F.col("__pk"), "left_anti"
    )


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two versions of a table (yesterday's
    backup vs today's, a replica vs its source, pre- vs post-mutation):
    per key, ``status`` is ``added`` (right only), ``removed`` (left
    only) or ``changed`` (both sides present, any compared column
    null-safely different), plus the ``changed_cols`` name list.
    Unchanged rows are NOT emitted — the diff is the small output.

    ``compare_cols`` defaults to every shared non-key column. Keys are
    assumed unique per side (it is a snapshot diff; pre-aggregate if
    not).

    Scale posture: ONE full outer join on the key columns — both
    sides shuffle once on the same key, the comparison is a narrow
    projection, and the emitted rows are bounded by the churn, not
    the table. This is the engine-side answer to "what did the backup
    chain change" (sink.py::backup_table verifies files; this
    verifies CONTENT).
    """
    if compare_cols is None:
        shared = [c for c in left.columns if c in set(right.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    l = left.select(
        *[F.col(c).alias(f"_l_{c}") for c in key_cols + compare_cols]
    ).withColumn("_l", F.lit(1))
    r = right.select(
        *[F.col(c).alias(f"_r_{c}") for c in key_cols + compare_cols]
    ).withColumn("_r", F.lit(1))
    cond = None
    for c in key_cols:
        # eqNullSafe: a NULL-keyed row must match ITSELF across sides —
        # plain equality would report it as removed+added every diff
        eq = F.col(f"_l_{c}").eqNullSafe(F.col(f"_r_{c}"))
        cond = eq if cond is None else (cond & eq)
    j = l.join(r, cond, "full_outer")

    diffs = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"_l_{c}").eqNullSafe(F.col(f"_r_{c}")),
                    F.lit(c),
                )
                for c in compare_cols
            ]
        )
    )
    status = (
        F.when(F.col("_l").isNull(), F.lit("added"))
        .when(F.col("_r").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
    )
    keys = [
        F.coalesce(F.col(f"_l_{c}"), F.col(f"_r_{c}")).alias(c)
        for c in key_cols
    ]
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            *keys,
            "status",
            F.when(F.col("status") == "changed", diffs)
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
    )
