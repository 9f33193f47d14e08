"""Cloud-feed source tests, mirroring the reference's conformance suite
(reference pkg/labeler/public_ranges_test.go:19-273)."""

from __future__ import annotations

import json

import pytest

from kubenetmon_spark.sources import build_prefixes_from_feeds, read_feed_json


def _write(tmp_path, name, doc):
    p = tmp_path / name
    p.write_text(json.dumps(doc))
    return str(p)


def _feeds(spark, tmp_path, aws=None, gcp=None, google=None, azure=None):
    aws = aws if aws is not None else {"prefixes": []}
    gcp = gcp if gcp is not None else {"prefixes": []}
    google = google if google is not None else {"prefixes": []}
    azure = azure if azure is not None else {"values": []}
    return (
        read_feed_json(spark, _write(tmp_path, "aws.json", aws), "aws"),
        read_feed_json(spark, _write(tmp_path, "gcp.json", gcp), "gcp"),
        read_feed_json(spark, _write(tmp_path, "google.json", google), "google"),
        read_feed_json(spark, _write(tmp_path, "azure.json", azure), "azure"),
    )


def _dim(spark, tmp_path, **kw):
    dfs = _feeds(spark, tmp_path, **kw)
    return {r.prefix: r for r in build_prefixes_from_feeds(*dfs).collect()}


def test_aws_s3_overrides_other_service(spark, tmp_path):
    # reference public_ranges_test.go "Test valid AWS prefixes"
    dim = _dim(spark, tmp_path, aws={"prefixes": [
        {"ip_prefix": "192.168.0.0/16", "service": "service1", "region": "us-east-1"},
        {"ip_prefix": "10.0.0.0/8", "service": "service2", "region": "us-west-2"},
        {"ip_prefix": "10.0.0.0/8", "service": "S3", "region": "eu-west-1"},
    ]})
    assert len(dim) == 2
    assert (dim["192.168.0.0/16"].cloud, dim["192.168.0.0/16"].service, dim["192.168.0.0/16"].region) == ("aws", "service1", "us-east-1")
    assert (dim["10.0.0.0/8"].service, dim["10.0.0.0/8"].region) == ("s3", "eu-west-1")
    assert dim["10.0.0.0/8"].net_start == 10 * 2**24
    assert dim["10.0.0.0/8"].net_end == 11 * 2**24 - 1


def test_aws_other_service_beats_amazon_and_ec2(spark, tmp_path):
    # reference priority map: unmapped services rank 0, amazon 1, ec2 2
    dim = _dim(spark, tmp_path, aws={"prefixes": [
        {"ip_prefix": "10.0.0.0/8", "service": "AMAZON", "region": "r1"},
        {"ip_prefix": "10.0.0.0/8", "service": "other", "region": "r2"},
        {"ip_prefix": "10.0.0.0/8", "service": "EC2", "region": "r3"},
    ]})
    assert dim["10.0.0.0/8"].service == "other"


def test_gcp_and_google_feeds(spark, tmp_path):
    dim = _dim(
        spark, tmp_path,
        gcp={"prefixes": [
            {"ipv4Prefix": "172.16.0.0/12", "service": "Service 1", "scope": "europe-north1"},
            {"ipv6Prefix": "2600::/32", "service": "skipme", "scope": "x"},
        ]},
        google={"prefixes": [{"ipv4Prefix": "8.8.8.0/24"}, {"ipv6Prefix": "2600::/32"}]},
    )
    assert len(dim) == 2
    # normalization: lowercase, spaces stripped
    assert (dim["172.16.0.0/12"].cloud, dim["172.16.0.0/12"].service, dim["172.16.0.0/12"].region) == ("gcp", "service1", "europe-north1")
    assert (dim["8.8.8.0/24"].cloud, dim["8.8.8.0/24"].service, dim["8.8.8.0/24"].region) == ("gcp", "googleservice", "global")


def test_azure_priority_rules(spark, tmp_path):
    # reference "Test valid Azure prefixes": storage beats another service;
    # non-empty SystemService beats empty; '' region -> global
    dim = _dim(spark, tmp_path, azure={"values": [
        {"name": "ActionGroup.GermanyWestCentral",
         "properties": {"region": "india", "systemService": "service1",
                        "addressPrefixes": ["1.1.1.1/32"]}},
        {"name": "ActionGroup.GermanyWestCentral",
         "properties": {"region": "germanywestcentral", "systemService": "AzureStorage",
                        "addressPrefixes": ["1.1.1.1/32"]}},
        {"name": "ActionGroup.WestUS3",
         "properties": {"region": "", "systemService": "",
                        "addressPrefixes": ["2.2.2.2/32"]}},
        {"name": "ActionGroup.WestUS3",
         "properties": {"region": "", "systemService": "non-empty",
                        "addressPrefixes": ["2.2.2.2/32"]}},
    ]})
    assert len(dim) == 2
    assert (dim["1.1.1.1/32"].cloud, dim["1.1.1.1/32"].service, dim["1.1.1.1/32"].region) == ("azure", "azurestorage", "germanywestcentral")
    assert (dim["2.2.2.2/32"].service, dim["2.2.2.2/32"].region) == ("non-empty", "global")


def test_azure_service_fallbacks_and_ipv6_skip(spark, tmp_path):
    dim = _dim(spark, tmp_path, azure={"values": [
        {"name": "AzureCloud.westus",
         "properties": {"region": "westus", "systemService": "",
                        "addressPrefixes": ["3.3.3.0/24", "2600:1234::/32"]}},
        {"name": "SomethingElse",
         "properties": {"region": "", "systemService": "",
                        "addressPrefixes": ["4.4.4.0/24"]}},
    ]})
    assert len(dim) == 2  # IPv6 skipped
    assert dim["3.3.3.0/24"].service == "azurecloud"
    assert dim["4.4.4.0/24"].service == "azureservice"


def test_invalid_prefix_fails_build(spark, tmp_path):
    dfs = _feeds(spark, tmp_path, aws={"prefixes": [
        {"ip_prefix": "invalid-ip", "service": "s", "region": "r"},
    ]})
    with pytest.raises(ValueError, match="invalid IPv4 prefix"):
        build_prefixes_from_feeds(*dfs)


def test_regional_beats_global_same_service(spark, tmp_path):
    dim = _dim(spark, tmp_path, azure={"values": [
        {"name": "X", "properties": {"region": "", "systemService": "svc",
                                     "addressPrefixes": ["5.5.5.0/24"]}},
        {"name": "X", "properties": {"region": "eastus", "systemService": "svc",
                                     "addressPrefixes": ["5.5.5.0/24"]}},
    ]})
    assert dim["5.5.5.0/24"].region == "eastus"
