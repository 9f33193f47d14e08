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
