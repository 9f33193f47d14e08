from kubenetmon_spark.streaming.job import (
    ingest_metrics,
    parse_kafka_observations,
    read_observations,
    read_observations_kafka,
    start_flow_stream,
    start_windowed_flow_stream,
    streaming_network_flows,
)

__all__ = [
    "ingest_metrics",
    "parse_kafka_observations",
    "read_observations",
    "read_observations_kafka",
    "start_flow_stream",
    "start_windowed_flow_stream",
    "streaming_network_flows",
]
