"""flowsql SQL-text path vs the DataFrame labeler path: row-identical
by construction, pinned here over every labeler scenario fixture
(accepts, all reject reasons, NAT shapes, AZ labels, ambiguity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kubenetmon_spark.dims import build_cloud_prefixes
from kubenetmon_spark.flowsql import (
    flow_batch_sql,
    flows_agg_sql,
    labeled_sql,
    register_flow_dim_views,
    supports_sql_path,
)
from kubenetmon_spark.functions.flags import canonical_flags_json
from kubenetmon_spark.operators.flows import summing_aggregate, to_flow_rows
from kubenetmon_spark.operators.label import (
    label_flows,
    prepare_label_dims,
    release_label_dims,
    split_rejected,
)
from kubenetmon_spark.operators.lpm import disjoint_prefixes
from tests.fixtures import CFG, nodes_df, observations_df, pods_df, raw_prefixes_df


def _snap(df):
    cols = [
        canonical_flags_json(c).alias(c) if c == "connectionFlags" else F.col(c)
        for c in df.columns
    ]
    return sorted(
        map(tuple, df.select(*cols).collect()),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


@pytest.fixture(scope="module")
def setup(spark):
    prefixes = build_cloud_prefixes(raw_prefixes_df(spark))
    disjoint = disjoint_prefixes(prefixes).persist()
    disjoint.count()
    prepared = prepare_label_dims(pods_df(spark), nodes_df(spark))
    assert supports_sql_path(CFG, prepared)
    views = register_flow_dim_views(spark, prepared, disjoint, tag="tfsql")
    obs = observations_df(spark)
    obs.createOrReplaceTempView("_tfsql_obs")
    yield {"prepared": prepared, "views": views, "obs": obs,
           "prefixes": prefixes, "disjoint": disjoint}
    release_label_dims(prepared)
    disjoint.unpersist()


def test_labeled_sql_identical_to_label_flows(spark, setup):
    df_path = label_flows(
        setup["obs"],
        pods_df(spark),
        nodes_df(spark),
        setup["disjoint"],
        CFG,
        prefixes_are_disjoint=True,
        prepared=setup["prepared"],
    )
    sql_path = spark.sql(
        labeled_sql(CFG, setup["prepared"], "_tfsql_obs", *setup["views"])
    )
    assert sql_path.columns == df_path.columns
    assert [f.dataType for f in sql_path.schema.fields] == [
        f.dataType for f in df_path.schema.fields
    ]
    assert _snap(sql_path) == _snap(df_path)


def test_flow_batch_sql_identical_to_aggregate_chain(spark, setup):
    labeled = label_flows(
        setup["obs"],
        pods_df(spark),
        nodes_df(spark),
        setup["disjoint"],
        CFG,
        prefixes_are_disjoint=True,
        prepared=setup["prepared"],
    )
    accepted, _ = split_rejected(labeled)
    df_flows = summing_aggregate(to_flow_rows(accepted))
    sql_flows = spark.sql(
        flow_batch_sql(CFG, setup["prepared"], "_tfsql_obs", *setup["views"])
    )
    assert sql_flows.columns == df_flows.columns
    assert [f.dataType for f in sql_flows.schema.fields] == [
        f.dataType for f in df_flows.schema.fields
    ]
    assert _snap(sql_flows) == _snap(df_flows)


def test_flows_agg_sql_over_view_matches(spark, setup):
    """The dead-letter split form: agg over a labeled view's accepted
    subset equals summing_aggregate(to_flow_rows(accepted))."""
    labeled = spark.sql(
        labeled_sql(CFG, setup["prepared"], "_tfsql_obs", *setup["views"])
    )
    labeled.createOrReplaceTempView("_tfsql_labeled")
    sql_flows = spark.sql(
        flows_agg_sql(
            "(SELECT * FROM _tfsql_labeled WHERE reject_reason IS NULL)"
        )
    )
    accepted, _ = split_rejected(labeled)
    df_flows = summing_aggregate(to_flow_rows(accepted))
    assert sql_flows.columns == df_flows.columns
    assert _snap(sql_flows) == _snap(df_flows)


def test_udp_kept_config_supported(spark, setup):
    """ignore_udp=False flips one reject branch; both paths must agree."""
    from kubenetmon_spark.config import RuntimeConfig

    cfg = RuntimeConfig(
        environment=CFG.environment,
        cloud=CFG.cloud,
        region=CFG.region,
        cluster=CFG.cluster,
        ignore_udp=False,
    )
    df_path = label_flows(
        setup["obs"],
        pods_df(spark),
        nodes_df(spark),
        setup["disjoint"],
        cfg,
        prefixes_are_disjoint=True,
        prepared=setup["prepared"],
    )
    sql_path = spark.sql(
        labeled_sql(cfg, setup["prepared"], "_tfsql_obs", *setup["views"])
    )
    assert _snap(sql_path) == _snap(df_path)


def test_lpm_literal_identical_to_join(spark, setup):
    """Small-dim CASE-chain LPM == the banded broadcast left join, over
    every scenario (hits in every segment, misses, private
    short-circuits, null remotes)."""
    from kubenetmon_spark.flowsql import (
        LITERAL_LPM_SEGMENT_LIMIT,
        collect_lpm_segments,
    )

    segments = collect_lpm_segments(setup["disjoint"])
    assert segments is not None  # fixture dim is small
    assert len(segments) <= LITERAL_LPM_SEGMENT_LIMIT
    join_path = spark.sql(
        labeled_sql(CFG, setup["prepared"], "_tfsql_obs", *setup["views"])
    )
    lit_path = spark.sql(
        labeled_sql(
            CFG,
            setup["prepared"],
            "_tfsql_obs",
            *setup["views"],
            lpm_segments=segments,
        )
    )
    assert lit_path.columns == join_path.columns
    assert [f.dataType for f in lit_path.schema.fields] == [
        f.dataType for f in join_path.schema.fields
    ]
    assert _snap(lit_path) == _snap(join_path)


def test_v6_mode_unsupported_falls_back(setup):
    from kubenetmon_spark.config import RuntimeConfig

    assert not supports_sql_path(
        RuntimeConfig(ignore_ipv6=False), setup["prepared"]
    )
    assert not supports_sql_path(CFG, None)
    assert not supports_sql_path(CFG, {"node_ip_set": None, "zone_map": {}})
