"""Feed-fetch orchestration tests: the Azure date-probe, pinned
fallback, all-or-nothing refresh, and the dim_loader refresh hook —
reference pkg/labeler/public_ranges.go:311-338 and remote.go:98-126,
all driven through an injected fake fetcher (no network)."""

from __future__ import annotations

import json
from datetime import date

import pytest

from kubenetmon_spark.sources.fetch import (
    AWS_FEED_URL,
    AZURE_FALLBACK_DATE,
    AZURE_URL_TEMPLATE,
    GCP_FEED_URL,
    GOOGLE_FEED_URL,
    azure_url_candidates,
    fetch_azure_feed,
    fetch_cloud_feeds,
    make_dim_loader,
    refresh_prefixes,
)

TODAY = date(2026, 3, 15)

AWS_DOC = {"prefixes": [{"ip_prefix": "52.0.0.0/8", "service": "EC2", "region": "us-east-1"}]}
GCP_DOC = {"prefixes": [{"ipv4Prefix": "35.0.0.0/8", "service": "Google Cloud", "scope": "us-central1"}]}
GOOGLE_DOC = {"prefixes": [{"ipv4Prefix": "8.8.8.0/24"}]}
AZURE_DOC = {"values": [{"name": "AzureCloud.eastus", "properties": {
    "region": "eastus", "systemService": "", "addressPrefixes": ["20.0.0.0/8"]}}]}


class FakeFetch:
    """dict-backed fetcher: unknown URL raises (the 404 analogue)."""

    def __init__(self, pages: dict[str, str]):
        self.pages = dict(pages)
        self.calls: list[str] = []

    def __call__(self, url: str) -> str:
        self.calls.append(url)
        if url not in self.pages:
            raise OSError(f"404 {url}")
        return self.pages[url]


def _azure_url(d: str) -> str:
    return AZURE_URL_TEMPLATE.format(date=d)


class TestAzureProbe:
    def test_candidates_walk_back_91_days_newest_first(self):
        urls = list(azure_url_candidates(TODAY))
        assert len(urls) == 91
        assert urls[0] == _azure_url("20260315")
        assert urls[1] == _azure_url("20260314")
        assert urls[-1] == _azure_url("20251215")

    def test_probe_miss_walks_back_to_first_hit(self):
        f = FakeFetch({_azure_url("20260312"): "HIT"})
        assert fetch_azure_feed(f, TODAY) == "HIT"
        # probed exactly today, -1, -2, then stopped on the -3 hit
        assert f.calls == [
            _azure_url("20260315"),
            _azure_url("20260314"),
            _azure_url("20260313"),
            _azure_url("20260312"),
        ]

    def test_all_dates_miss_uses_pinned_fallback(self):
        f = FakeFetch({_azure_url(AZURE_FALLBACK_DATE): "PINNED"})
        assert fetch_azure_feed(f, TODAY) == "PINNED"
        assert len(f.calls) == 92  # 91 probes + the fallback
        assert f.calls[-1] == _azure_url(AZURE_FALLBACK_DATE)

    def test_fallback_failure_propagates(self):
        f = FakeFetch({})
        with pytest.raises(OSError):
            fetch_azure_feed(f, TODAY)

    def test_refresh_is_all_or_nothing(self):
        # AWS down -> the whole refresh cycle fails (reference skips the
        # cycle and keeps serving the previous dim, remote.go:101-108)
        f = FakeFetch({
            GCP_FEED_URL: json.dumps(GCP_DOC),
            GOOGLE_FEED_URL: json.dumps(GOOGLE_DOC),
            _azure_url("20260315"): json.dumps(AZURE_DOC),
        })
        with pytest.raises(OSError):
            fetch_cloud_feeds(f, TODAY)


def _full_fake(aws_doc=AWS_DOC) -> FakeFetch:
    return FakeFetch({
        AWS_FEED_URL: json.dumps(aws_doc),
        GCP_FEED_URL: json.dumps(GCP_DOC),
        GOOGLE_FEED_URL: json.dumps(GOOGLE_DOC),
        _azure_url("20260313"): json.dumps(AZURE_DOC),  # 2-day probe walk
    })


class TestRefresh:
    def test_refresh_prefixes_end_to_end(self, spark):
        dim = {
            r.prefix: r
            for r in refresh_prefixes(spark, _full_fake(), TODAY).collect()
        }
        assert set(dim) == {"52.0.0.0/8", "35.0.0.0/8", "8.8.8.0/24", "20.0.0.0/8"}
        assert (dim["52.0.0.0/8"].cloud, dim["52.0.0.0/8"].service) == ("aws", "ec2")
        assert dim["8.8.8.0/24"].service == "googleservice"
        assert (dim["20.0.0.0/8"].cloud, dim["20.0.0.0/8"].region) == ("azure", "eastus")

    def test_dim_loader_rebroadcasts_fresh_feeds(self, spark):
        # the stream's refresh hook must see feed CHANGES: mutate the
        # fake between loader calls and check the new prefix arrives
        fake = _full_fake()
        pods = spark.createDataFrame([("10.0.0.1", "p", "ns", "n", None, None, None)],
            "pod_ip string, name string, namespace string, node_name string,"
            " label_app string, label_k8s_app string, label_control_plane_id string")
        nodes = spark.createDataFrame([("n", "10.0.0.1", "z")],
            "name string, internal_ip string, zone string")
        loader = make_dim_loader(spark, fake, pods, nodes, today=lambda: TODAY)
        _, _, first = loader()
        assert {r.prefix for r in first.collect()} >= {"52.0.0.0/8"}
        fake.pages[AWS_FEED_URL] = json.dumps(
            {"prefixes": [{"ip_prefix": "54.0.0.0/8", "service": "EC2", "region": "eu-west-1"}]}
        )
        _, _, second = loader()
        got = {r.prefix for r in second.collect()}
        assert "54.0.0.0/8" in got and "52.0.0.0/8" not in got
