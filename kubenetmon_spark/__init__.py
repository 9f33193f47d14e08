"""kubenetmon_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ClickHouse/kubenetmon (reference at
/root/reference, snapshot 2025-04-04).

Not a port: the reference's Go agent/server + ClickHouse SummingMergeTree
pipeline is re-expressed as idiomatic Spark — DataFrame/SQL transforms,
Structured Streaming ingestion, partitioned-Parquet storage with a
compaction job playing the role of MergeTree background merges.

Modules
-------
session     SparkSession factory with engine defaults (AQE, zstd, UTC).
schema      Canonical StructTypes (observations, dims, network_flows).
config      Runtime deployment constants (environment/cloud/region/...).
tables      Loaders for the driver's synthetic parquet tables.
dims        Dimension builders (cloud prefixes w/ priority dedup, pods...).
operators   label / lpm / flows / agg / dedup / similarity / text / media.
sources     Cloud IP-range feed parsers (AWS/GCP/Google/Azure JSON).
sink        Partitioned fact-table writer, compaction, retention.
streaming   Structured Streaming ingest (foreachBatch + windowed paths,
            Kafka boundary, progress metrics).
queries     The SQL view + cookbook query surface.
gate        The correctness-gate queries, each with a DuckDB oracle.
sql         ClickHouse-name scalar surface as Catalyst-inlined SQL UDFs.
backfill    Date-partition replay from raw observations (late data).
querylog    system.query_log analogue (run_logged / slow_queries).
observability  Per-batch metrics listener, reference-named Prometheus
            counters + textfile exposition, stream health.
"""

__version__ = "0.1.0"

# Minimal versioned public API: the names a reference user needs to run
# the headline pipeline (session -> label -> fan-out/aggregate -> sink ->
# query surface) plus the streaming entry points. Resolved lazily so
# `import kubenetmon_spark` stays cheap (no SparkSession, no submodule
# import cost) until a symbol is actually used; everything else remains
# importable from its submodule (stable paths, documented above).
_PUBLIC_API = {
    "get_spark": "kubenetmon_spark.session",
    "RuntimeConfig": "kubenetmon_spark.config",
    "label_flows": "kubenetmon_spark.operators.label",
    "split_rejected": "kubenetmon_spark.operators.label",
    "prepare_label_dims": "kubenetmon_spark.operators.label",
    "to_flow_rows": "kubenetmon_spark.operators.flows",
    "summing_aggregate": "kubenetmon_spark.operators.flows",
    "write_flows": "kubenetmon_spark.sink",
    "read_flows": "kubenetmon_spark.sink",
    "compact": "kubenetmon_spark.sink",
    "apply_retention": "kubenetmon_spark.sink",
    "register_flow_views": "kubenetmon_spark.queries",
    "register_sql_surface": "kubenetmon_spark.sql",
    "read_observations": "kubenetmon_spark.streaming.job",
    "start_flow_stream": "kubenetmon_spark.streaming.job",
}

__all__ = sorted(_PUBLIC_API) + ["__version__"]


def __getattr__(name: str):
    mod = _PUBLIC_API.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod), name)
