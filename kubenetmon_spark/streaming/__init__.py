from kubenetmon_spark.streaming.job import (
    read_observations,
    start_flow_stream,
    start_windowed_flow_stream,
    streaming_network_flows,
)

__all__ = [
    "read_observations",
    "start_flow_stream",
    "start_windowed_flow_stream",
    "streaming_network_flows",
]
