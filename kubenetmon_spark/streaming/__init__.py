from kubenetmon_spark.streaming.dedup import (
    dedup_within_watermark,
    interval_join_streams,
)
from kubenetmon_spark.streaming.job import (
    ingest_metrics,
    parse_kafka_observations,
    read_observations,
    read_observations_kafka,
    start_flow_stream,
    start_windowed_flow_stream,
    streaming_network_flows,
)
from kubenetmon_spark.streaming.sessions import (
    deltify_batch,
    deltify_stream,
    streaming_session_stats,
)

__all__ = [
    "dedup_within_watermark",
    "deltify_batch",
    "deltify_stream",
    "ingest_metrics",
    "interval_join_streams",
    "parse_kafka_observations",
    "read_observations",
    "read_observations_kafka",
    "start_flow_stream",
    "start_windowed_flow_stream",
    "streaming_network_flows",
    "streaming_session_stats",
]
