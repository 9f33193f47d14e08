"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

The ``events`` table carries parquet TIMESTAMP(NANOS) which Spark's
reader refuses; with ``spark.sql.legacy.parquet.nanosAsLong=true`` (set by
session.get_spark) it arrives as a long that we convert to a microsecond
timestamp here. All other tables load as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """A small driver-side row list as a ONE-slice DataFrame.

    ``createDataFrame(list)`` parallelizes into ``defaultParallelism``
    Python-backed slices, so every scan of a handful-of-rows frame
    (dim builds, probe tables, seed frames, file lists) schedules a
    core-count of tasks, each paying a Python-worker round-trip —
    measured ~0.4-0.6s per tiny-frame job at local[32]. One slice =
    one task per scan. Driver-side lists are bounded by construction
    (≤ ~100k rows everywhere this is used), so one partition is the
    right layout at any scale."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


def fanout(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Scale-adaptive parallelism FLOOR for compute-heavy map stages —
    the dual of :func:`local_df`.

    A small parquet table arrives as one split (a parquet row group is
    unsplittable), so every downstream map stage — Arrow tokenize
    passes, per-gram md5, BLAS batches, O(n^2) bounded self-joins —
    runs on ONE core until the first exchange, no matter how many are
    idle. AQE cannot help: it sizes partitions by BYTES, and these
    stages are CPU-bound at tiny byte sizes (a 0.6 MB document table
    carries seconds of single-core hashing).

    Repartition to ``defaultParallelism`` ONLY when the input has fewer
    partitions: at production scale inputs arrive with >= core-count
    splits and this is a no-op (no exchange added to the plan), so the
    floor is scale-adaptive rather than a local-mode constant. Apply it
    to corpus-scale inputs of expensive operators, NOT to tiny frames
    (broadcast probes, dims — those want :func:`local_df`'s one slice).

    Results are unaffected by layout: house operators are
    partition-order-independent by design (integer-exact sums,
    min/count aggregates, per-row hashing).

    The partition probe (``df.rdd``) runs ONLY on scan-level inputs
    (scans plus narrow projections/filters/generates): with AQE,
    converting a frame with upstream exchanges to an RDD finalizes and
    can eagerly EXECUTE those query stages just to read a partition
    count, and that work is not reused by the returned plan (ADVICE
    r07). A post-exchange frame already carries >= shuffle-partition
    parallelism, so the floor is a no-op for it anyway — return it
    unchanged, probe-free.
    """
    if _has_exchange(df):
        return df
    target = parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


#: Logical nodes that put an exchange (or a Python stage boundary)
#: between the scan and the frame — .rdd on such a frame can eagerly
#: run those stages under AQE just to read a partition count.
_EXCHANGE_NODES = frozenset(
    {
        "Aggregate",
        "Join",
        "Repartition",
        "RepartitionByExpression",
        "RebalancePartitions",
        "Window",
        "Sort",
        "Deduplicate",
        "Intersect",
        "Except",
        "FlatMapGroupsInPandas",
        "FlatMapGroupsInArrow",
        "CoGroup",
    }
)


def _has_exchange(df: DataFrame) -> bool:
    """True when the ANALYZED logical plan (no optimization, no
    execution — analysis already happened at construction) contains a
    shuffle-introducing node. String-walks the plan tree's node names
    (first token per line, tree prefixes stripped)."""
    plan = df._jdf.queryExecution().analyzed().toString()
    for line in plan.splitlines():
        node = line.lstrip(" +-:").split(" ", 1)[0].split("(", 1)[0]
        if node == "Repartition":
            # "Repartition <n>, <shuffle>" covers BOTH repartition(n)
            # (shuffle=true — an exchange) and coalesce(n)
            # (shuffle=false — narrow, probe-safe; a coalesced scan is
            # exactly the under-parallel input the floor exists for).
            if line.rstrip().endswith("true"):
                return True
            continue
        if node in _EXCHANGE_NODES:
            return True
    return False


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            # nanos -> micros; truncation (floor) matches DuckDB's
            # second/minute truncation downstream (all values positive).
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
        elif dt == "timestamp_ntz":
            # parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
            # NTZ; with the session pinned to UTC the LTZ cast is
            # value-preserving, and downstream epoch casts need LTZ.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


#: (session id, sf_dir) pairs whose views are current — re-registering
#: the same directory re-reads ten parquet footers for nothing, and the
#: gate calls this before every spark.sql query.
_VIEWS_REGISTERED: set[tuple[int, str]] = set()


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view for spark.sql
    use. Memoized per (session, sf_dir): repeated calls with the same
    directory are free; a different sf_dir re-registers (and takes
    over the view names, latest wins)."""
    tables = load_tables(spark, sf_dir)
    if (id(spark), sf_dir) in _VIEWS_REGISTERED:
        return tables
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    _VIEWS_REGISTERED.add((id(spark), sf_dir))
    # a different directory's registration is now stale for this session
    for k in [k for k in _VIEWS_REGISTERED if k[0] == id(spark) and k[1] != sf_dir]:
        _VIEWS_REGISTERED.discard(k)
    return tables
