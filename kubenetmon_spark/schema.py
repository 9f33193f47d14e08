"""Canonical schemas for the engine. Fixed and explicit everywhere — the
reference has zero schema inference (protobuf + hand-written DDL; see
reference pkg/grpc/flow_handler.proto:24-68 and test/network_flows_0.sql:3-37).

Type mapping rationale is in SURVEY.md §1.3.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Raw observation stream — flattened protobuf Observation
# (reference pkg/grpc/flow_handler.proto:24-68; counters are per-interval
# deltas because the agent zeroes conntrack counters on dump,
# reference pkg/collector/collector.go:134).
# ---------------------------------------------------------------------------
OBSERVATION_SCHEMA = StructType(
    [
        StructField("node_name", StringType(), False),
        StructField("ts", TimestampType(), False),
        StructField("proto", IntegerType(), False),
        StructField("orig_src_ip", StringType(), True),
        StructField("orig_src_v6", StringType(), True),
        StructField("orig_src_port", IntegerType(), True),
        StructField("orig_dst_ip", StringType(), True),
        StructField("orig_dst_v6", StringType(), True),
        StructField("orig_dst_port", IntegerType(), True),
        StructField("orig_packets", LongType(), True),
        StructField("orig_bytes", LongType(), True),
        StructField("reply_src_ip", StringType(), True),
        StructField("reply_src_v6", StringType(), True),
        StructField("reply_src_port", IntegerType(), True),
        StructField("reply_dst_ip", StringType(), True),
        StructField("reply_dst_v6", StringType(), True),
        StructField("reply_dst_port", IntegerType(), True),
        StructField("reply_packets", LongType(), True),
        StructField("reply_bytes", LongType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Dimensions (reference pkg/watcher/watcher.go:65-102 informer caches;
# FIXTURES.md §2-5 column contracts).
# ---------------------------------------------------------------------------
PODS_SCHEMA = StructType(
    [
        StructField("pod_ip", StringType(), False),
        StructField("name", StringType(), False),
        StructField("namespace", StringType(), False),
        StructField("node_name", StringType(), True),
        StructField("label_app", StringType(), True),
        StructField("label_k8s_app", StringType(), True),
        StructField("label_control_plane_id", StringType(), True),
    ]
)

NODES_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),
        StructField("internal_ip", StringType(), False),
        StructField("zone", StringType(), True),
    ]
)

SERVICES_SCHEMA = StructType(
    [
        StructField("cluster_ip", StringType(), False),
        StructField("name", StringType(), False),
        StructField("namespace", StringType(), False),
    ]
)

CLOUD_PREFIXES_SCHEMA = StructType(
    [
        StructField("prefix", StringType(), False),
        StructField("net_start", LongType(), False),
        StructField("net_end", LongType(), False),
        StructField("prefix_len", IntegerType(), False),
        StructField("cloud", StringType(), False),
        StructField("service", StringType(), True),
        StructField("region", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# network_flows fact table — 35 columns, exactly the reference DDL
# (reference test/network_flows_0.sql:3-37). localCell/remoteCell are
# schema-only (never inserted; reference pkg/inserter/worker.go:250-285).
# ---------------------------------------------------------------------------
NETWORK_FLOWS_SCHEMA = StructType(
    [
        StructField("date", DateType(), False),
        StructField("intervalStartTime", TimestampType(), False),
        StructField("intervalSeconds", IntegerType(), False),
        StructField("environment", StringType(), False),
        StructField("cluster", StringType(), False),
        StructField("connectionFlags", MapType(StringType(), BooleanType(), False), False),
        StructField("direction", StringType(), False),  # 'out' | 'in'
        StructField("localCloud", StringType(), False),
        StructField("localRegion", StringType(), False),
        StructField("localCell", StringType(), False),  # always '' (schema-only)
        StructField("localAvailabilityZone", StringType(), False),
        StructField("localNode", StringType(), False),
        StructField("localInstanceID", StringType(), False),
        StructField("localNamespace", StringType(), False),
        StructField("localPod", StringType(), False),
        StructField("localApp", StringType(), False),
        StructField("localIPv4", StringType(), False),
        StructField("localPort", IntegerType(), False),
        StructField("proto", StringType(), False),  # 'TCP' | 'UDP'
        StructField("connectionClass", StringType(), False),
        StructField("remoteCloud", StringType(), False),
        StructField("remoteRegion", StringType(), False),
        StructField("remoteCell", StringType(), False),  # always '' (schema-only)
        StructField("remoteAvailabilityZone", StringType(), False),
        StructField("remoteCluster", StringType(), False),  # always 'UNKNOWN'
        StructField("remoteNode", StringType(), False),
        StructField("remoteInstanceID", StringType(), False),
        StructField("remoteNamespace", StringType(), False),
        StructField("remotePod", StringType(), False),
        StructField("remoteApp", StringType(), False),
        StructField("remoteIPv4", StringType(), False),
        StructField("remotePort", IntegerType(), False),
        StructField("remoteService", StringType(), False),
        StructField("bytes", LongType(), False),
        StructField("packets", LongType(), False),
    ]
)

#: The aggregation key — every column except the summed measures, i.e. the
#: SummingMergeTree ORDER BY contract (reference test/network_flows_0.sql:42):
#: rows sharing this key have (bytes, packets) summed. ``connectionFlags`` is
#: a map and cannot be a Spark group key; grouping uses its canonical JSON
#: form instead (see operators/flows.py and SURVEY.md §4.4).
DIM_COLS: list[str] = [f.name for f in NETWORK_FLOWS_SCHEMA.fields if f.name not in ("bytes", "packets")]

#: Sort-order prefix used when writing files, mirroring the sparse primary
#: index benefit of the reference's 8-column PRIMARY KEY
#: (reference test/network_flows_0.sql:41,44 — index granularity 8192).
PRIMARY_KEY_PREFIX: list[str] = [
    "intervalStartTime",
    "direction",
    "proto",
    "localApp",
    "remoteApp",
    "localPod",
    "remotePod",
    "connectionClass",
]

#: Connection classes (reference pkg/labeler/labeler.go:53-59).
CONNECTION_CLASSES = ("INTRA_VPC", "INTRA_REGION", "INTER_REGION", "PUBLIC_INTERNET", "UNKNOWN")

#: Flow types (reference pkg/labeler/labeler.go:149-161).
FLOW_TYPES = ("betweenPodsOnNode", "fromPodOnNode", "toPodOnNode", "unknown")
