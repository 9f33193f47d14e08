"""Conformance tests for the labeler — the Spark analogue of the
reference's 11 LabelFlow scenarios (reference pkg/labeler/labeler_test.go)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kubenetmon_spark.dims import build_cloud_prefixes
from kubenetmon_spark.operators.label import label_flows, split_rejected
from tests.fixtures import CFG, nodes_df, observations_df, pods_df, raw_prefixes_df


@pytest.fixture(scope="module")
def labeled(spark):
    prefixes = build_cloud_prefixes(raw_prefixes_df(spark))
    out = label_flows(observations_df(spark), pods_df(spark), nodes_df(spark), prefixes, CFG)
    out.cache()
    return out


def _one(labeled, port):
    rows = labeled.filter(F.col("localPort") == port).collect()
    assert len(rows) == 1, f"expected 1 row for port {port}, got {len(rows)}"
    return rows[0]


def test_reject_reasons(labeled):
    rejects = {
        r.localPort: r.reject_reason
        for r in labeled.filter(F.col("reject_reason").isNotNull()).collect()
    }
    by_reason = labeled.filter(F.col("reject_reason").isNotNull()).groupBy("reject_reason").count()
    counts = {r.reject_reason: r["count"] for r in by_reason.collect()}
    assert counts == {
        "node_flow": 1,
        "zero_counters": 1,
        "localhost": 1,
        "udp_ignored": 1,
        "unsupported_proto": 1,
        "ipv6": 1,
        "unknown_direction": 1,
        "ambiguous_pod": 1,
        "remote_label_error": 1,
    }, counts
    assert rejects.get(5013) == "ambiguous_pod"
    assert rejects.get(5017) == "remote_label_error"


def test_accept_count(labeled):
    accepted, rejected = split_rejected(labeled)
    assert accepted.count() == 12  # scenarios 1,2,3a,3b,4,5,14,15,16,18a,18b,18c
    assert rejected.count() == 9


def test_egress_nat_inter_region(labeled):
    row = _one(labeled, 5001)
    assert row.reject_reason is None
    assert row.flow_type == "fromPodOnNode"
    assert row.connectionClass == "INTER_REGION"
    assert row.remoteCloud == "aws"
    assert row.remoteRegion == "us-east-1"
    assert row.remoteService == "s3"  # nested /24 won LPM over the /16
    assert row.remoteIPv4 == "1.1.1.5"
    assert row.localPod == "pod-a"
    assert row.localApp == "frontend"
    assert row.localInstanceID == "i-111"
    assert row.localAvailabilityZone == "zone-a"
    assert row.bytes_out == 1000 and row.bytes_in == 2000


def test_azure_shape_intra_region(labeled):
    row = _one(labeled, 5002)
    assert row.connectionClass == "INTRA_REGION"
    assert row.remoteRegion == "us-west-2"
    assert row.remoteService == "amazon"  # /16 match


def test_pod_to_pod_both_views(labeled):
    sender = labeled.filter((F.col("localPort") == 5003) & (F.col("flow_type") == "fromPodOnNode")).collect()
    assert len(sender) == 1
    s = sender[0]
    assert s.localPod == "pod-a" and s.remotePod == "pod-c"
    assert s.connectionClass == "INTRA_VPC"
    assert s.remoteAvailabilityZone == "zone-b"
    assert s.bytes_out == 1200 and s.bytes_in == 2200

    # receiver's view: local/remote swapped, counters re-oriented
    recv = labeled.filter((F.col("flow_type") == "toPodOnNode") & (F.col("remotePort") == 5003)).collect()
    assert len(recv) == 1
    t = recv[0]
    assert t.localPod == "pod-c" and t.remotePod == "pod-a"
    assert t.localPort == 8080 and t.remotePort == 5003
    assert t.bytes_out == 2200 and t.bytes_in == 1200  # reply counters are outbound for the receiver


def test_between_pods_on_node_and_app_fallback(labeled):
    row = _one(labeled, 5004)
    assert row.flow_type == "betweenPodsOnNode"
    assert row.localPod == "pod-a" and row.remotePod == "pod-b"
    assert row.remoteApp == "backend"  # label_k8s_app fallback (labeler.go:350-351)
    assert row.connectionClass == "INTRA_VPC"


def test_service_vip_resolves_to_backend(labeled):
    row = _one(labeled, 5005)
    assert row.remoteIPv4 == "10.0.0.3"  # reply_src, not the VIP
    assert row.remotePod == "pod-c"
    assert row.connectionClass == "INTRA_VPC"


def test_global_anycast(labeled):
    row = _one(labeled, 5014)
    assert row.connectionClass == "INTRA_REGION"
    assert row.remoteRegion == "us-west-2"  # anycast assumption -> local region


def test_other_cloud_public_internet(labeled):
    row = _one(labeled, 5015)
    assert row.connectionClass == "PUBLIC_INTERNET"
    assert row.remoteCloud == "gcp"


def test_unlisted_public_internet(labeled):
    row = _one(labeled, 5016)
    assert row.connectionClass == "PUBLIC_INTERNET"
    assert row.remoteCloud == "" and row.remoteRegion == ""


def test_constants(labeled):
    row = _one(labeled, 5001)
    assert row.remoteCluster == "UNKNOWN"
    assert row.localCell == "" and row.remoteCell == ""
    assert row.environment == "development"
    assert row.cluster == "cluster"
    assert row.localCloud == "aws" and row.localRegion == "us-west-2"
    assert row.proto == "TCP"


def test_prefix_priority_dedup(spark):
    dim = build_cloud_prefixes(raw_prefixes_df(spark))
    aws555 = dim.filter(F.col("prefix") == "5.5.5.0/24").collect()
    assert len(aws555) == 1 and aws555[0].service == "s3"
    az = dim.filter(F.col("cloud") == "azure").collect()
    assert len(az) == 1
    assert az[0].service == "azurestorage" and az[0].region == "eastus"
