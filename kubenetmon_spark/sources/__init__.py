from kubenetmon_spark.sources.feeds import (
    AWS_FEED_SCHEMA,
    AZURE_FEED_SCHEMA,
    GCP_FEED_SCHEMA,
    GOOGLE_FEED_SCHEMA,
    build_prefixes_from_feeds,
    parse_aws_feed,
    parse_azure_feed,
    parse_gcp_feed,
    parse_google_feed,
    read_feed_json,
)

__all__ = [
    "AWS_FEED_SCHEMA",
    "AZURE_FEED_SCHEMA",
    "GCP_FEED_SCHEMA",
    "GOOGLE_FEED_SCHEMA",
    "build_prefixes_from_feeds",
    "parse_aws_feed",
    "parse_azure_feed",
    "parse_gcp_feed",
    "parse_google_feed",
    "read_feed_json",
]
