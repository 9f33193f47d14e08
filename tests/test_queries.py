"""Cookbook query tests over the demo fact table (the five README
questions, reference README.md:16-21)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kubenetmon_spark.demo import build_network_flows
from kubenetmon_spark.queries import (
    connection_posture,
    cross_az_traffic,
    node_throughput,
    register_flow_views,
    server_balance,
    top_talkers,
    traffic_to_service,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def flows(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("flows") / "t")
    build_network_flows(spark, SF_DIR).write.partitionBy("date").parquet(path)
    return register_flow_views(spark, path)


def test_views_registered(spark, flows):
    out = spark.sql("SELECT count(*) AS n FROM flows_out").collect()[0].n
    inn = spark.sql("SELECT count(*) AS n FROM flows_in").collect()[0].n
    assert out > 0 and inn > 0
    assert spark.sql("SELECT count(*) AS n FROM network_flows").collect()[0].n == out + inn


def test_top_talkers(flows):
    rows = top_talkers(flows, limit=5).collect()
    assert len(rows) == 5
    assert rows[0].total_bytes >= rows[-1].total_bytes
    assert rows[0].readable.endswith(("B", "KiB", "MiB"))


def test_cross_az(flows):
    rows = cross_az_traffic(flows).collect()
    # demo pods sit on nodes alternating zone-a/zone-b -> cross-AZ exists
    assert rows
    assert all(r.localAvailabilityZone != r.remoteAvailabilityZone for r in rows)


def test_traffic_to_s3(flows):
    rows = traffic_to_service(flows, "s3").collect()
    assert rows  # demo 'view' events hit the 52.218.0.0/16 s3 prefix
    assert all(r.total_bytes > 0 for r in rows)


def test_connection_posture(flows):
    rows = connection_posture(flows).collect()
    assert rows
    # the demo derives observations from every pod -> all postures outbound
    assert {r.posture for r in rows} <= {"outbound", "inbound-only"}


def test_server_balance(flows):
    app = flows.filter(F.col("direction") == "in").groupBy("localApp").count().collect()[0].localApp
    rows = server_balance(flows, app).collect()
    assert rows
    assert abs(sum(r.share_bp for r in rows) - 10000) <= len(rows)  # floor rounding


def test_node_throughput(flows):
    rows = node_throughput(flows, top=10).collect()
    assert rows and all(r.bytes_per_sec > 0 for r in rows)


def test_pod_traffic_rates(flows):
    from kubenetmon_spark.queries import pod_traffic_rates

    out = pod_traffic_rates(flows, step_s=300, window_s=900, n_buckets=48)
    rows = out.collect()
    assert rows, "demo flows must produce at least one grid bucket"
    cols = set(out.columns)
    assert {"pod", "bucket_ts", "rate_bp", "increase", "delta"} <= cols
    # counters are monotone per pod: increase == delta, never negative
    for r in rows:
        if r.increase is not None:
            assert r.increase == r.delta >= 0
            assert r.rate_bp is not None and r.rate_bp >= 0
    # grid alignment
    assert all(r.bucket_ts % 300 == 0 for r in rows)


def test_pod_traffic_rates_empty(spark, flows):
    from kubenetmon_spark.queries import pod_traffic_rates

    empty = flows.filter(F.lit(False))
    assert pod_traffic_rates(empty).count() == 0
