"""Per-micro-batch flow pipeline as ONE SQL text, built once per
dimension refresh.

Why this exists (guide §5 — driver work; VERDICT r07 #1): the labeler
chain (label_flows -> split_rejected -> to_flow_rows ->
summing_aggregate) is rebuilt from Python per micro-batch in the
streaming jobs, costing ~2,700 py4j roundtrips / ~0.4 s of driver time
per trigger before a single task runs — ~20-30% of a small batch. The
computation itself is static between dimension refreshes: only the
batch source changes. So render the WHOLE chain to SQL text once per
refresh (pure Python string work, zero JVM roundtrips) and per batch do
exactly two py4j calls: bind the batch under a temp view and
``spark.sql(text)``. Analysis also runs once over the final tree
instead of eagerly after each of ~15 DataFrame ops.

Equivalence: the text is generated from the same shared expression
builders as the DataFrame path (label.p4_select_exprs,
label.final_select_exprs, label.zone_map_sql), mirrors label_flows
stage by stage (stage names in comments match label.py's operator map),
and is pinned row-identical to the DataFrame path by
tests/test_flowsql.py over every labeler scenario. The SQL path only
engages for the configuration the streaming jobs actually run
(v4-reference mode + literal node dims + disjoint LPM, no extra
flags); anything else falls back to label_flows — never a silent
semantic fork.
"""

from __future__ import annotations

import ipaddress
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kubenetmon_spark.config import RuntimeConfig
from kubenetmon_spark.operators.label import (
    _POD_FIELDS,
    _sql_lit,
    final_select_exprs,
    p4_select_exprs,
    zone_map_sql,
)
from kubenetmon_spark.operators.lpm import BAND_SHIFT, MATCH_COLS
from kubenetmon_spark.schema import DIM_COLS


def supports_sql_path(cfg: RuntimeConfig, prepared: dict | None) -> bool:
    """True when the SQL-text path computes exactly what label_flows
    would for this configuration (reference v4 mode, literal node
    dims). Everything else uses the DataFrame path."""
    return (
        cfg.ignore_ipv6
        and prepared is not None
        and prepared.get("node_ip_set") is not None
        and prepared.get("zone_map") is not None
    )


def register_flow_dim_views(
    spark: SparkSession, prepared: dict, disjoint: DataFrame, tag: str = ""
) -> tuple[str, str]:
    """Register the two dimension views the SQL text joins against
    (once per dimension refresh): the pod-by-IP index and the banded
    disjoint-interval LPM dimension (same derivation as
    lpm.lpm_lookup_disjoint). Returns (pod_view, banded_view), fully
    qualified.

    GLOBAL temp views, deliberately: foreachBatch executes in a CLONED
    SparkSession whose session-local temp-view registry is a snapshot
    taken at stream start, so a dimension refresh re-registered as a
    session view would be invisible to later micro-batches. The global
    registry is shared live across all sessions of the application
    (and the cache manager is application-wide, so the views still
    resolve to the persisted dims)."""
    suffix = tag or uuid.uuid4().hex[:8]
    pod_view = f"_flow_pod_dim_{suffix}"
    banded_view = f"_flow_lpm_banded_{suffix}"
    prepared["pod_dim"].createOrReplaceGlobalTempView(pod_view)
    banded = disjoint.withColumn(
        "band",
        F.explode(
            F.sequence(
                F.shiftright(F.col("seg_start"), BAND_SHIFT),
                F.shiftright(F.col("seg_end"), BAND_SHIFT),
            )
        ),
    ).select("band", "seg_start", "seg_end", *MATCH_COLS)
    banded.createOrReplaceGlobalTempView(banded_view)
    return f"global_temp.{pod_view}", f"global_temp.{banded_view}"


# Above this many disjoint LPM segments, the lookup stays a broadcast
# join; at or below it, the segments inline into the SQL text as one
# CASE range chain (the reference's in-memory trie posture for a small
# dimension) — one broadcast build fewer per micro-batch. Production
# cloud-range dims (~43k prefixes -> ~87k segments) use the join.
LITERAL_LPM_SEGMENT_LIMIT = 64


def collect_lpm_segments(disjoint) -> list | None:
    """The disjoint LPM dimension as driver-side rows when it is small
    enough to inline (else None). Run once per dimension refresh."""
    rows = disjoint.limit(LITERAL_LPM_SEGMENT_LIMIT + 1).collect()
    if len(rows) > LITERAL_LPM_SEGMENT_LIMIT:
        return None
    return sorted(rows, key=lambda r: r["seg_start"])


def _lpm_literal_sql(segments: list) -> str:
    """The disjoint-interval lookup as one CASE chain producing a
    struct of the MATCH_COLS (segments are disjoint, so at most one
    branch fires — identical to the at-most-one-row left join)."""

    def lit(v):
        return "NULL" if v is None else _sql_lit(v)

    whens = " ".join(
        f"WHEN remote_ip_num >= {int(r['seg_start'])}"
        f" AND remote_ip_num <= {int(r['seg_end'])}"
        " THEN named_struct("
        f"'prefix', {lit(r['prefix'])}, "
        f"'prefix_len', {'NULL' if r['prefix_len'] is None else int(r['prefix_len'])}, "
        f"'cloud', {lit(r['cloud'])}, "
        f"'service', {lit(r['service'])}, "
        f"'region', {lit(r['region'])})"
        for r in segments
    )
    null_struct = (
        "CAST(NULL AS STRUCT<prefix:STRING,prefix_len:INT,"
        "cloud:STRING,service:STRING,region:STRING>)"
    )
    return f"CASE {whens} ELSE {null_struct} END"


def _n(ip: str) -> int:
    return int(ipaddress.IPv4Address(ip))


def _private_ip_sql(num: str) -> str:
    """functions.ip.is_private_ip_num as SQL text (same ranges:
    RFC1918 + loopback + link-local + unspecified)."""
    ranges = [
        ("10.0.0.0", "10.255.255.255"),
        ("172.16.0.0", "172.31.255.255"),
        ("192.168.0.0", "192.168.255.255"),
        ("127.0.0.0", "127.255.255.255"),
        ("169.254.0.0", "169.254.255.255"),
    ]
    parts = [f"({num} >= {_n(a)} AND {num} <= {_n(b)})" for a, b in ranges]
    parts.append(f"{num} = 0")  # unspecified 0.0.0.0
    return "(" + " OR ".join(parts) + ")"


_IP_TO_LONG_SQL = (
    "aggregate(transform(split(remote_ip, '\\\\.'), x -> try_cast(x AS LONG)), "
    "CAST(0 AS LONG), (acc, x) -> acc * 256 + x)"
)

_FLAGS_KEY_SQL = (
    "to_json(map_from_entries(array_sort(map_entries(connectionFlags))))"
)


def labeled_sql(
    cfg: RuntimeConfig,
    prepared: dict,
    obs_view: str,
    pod_view: str,
    banded_view: str,
    lpm_segments: list | None = None,
) -> str:
    """SQL text for label_flows(obs_view, ..., prepared=prepared) under
    :func:`supports_sql_path` preconditions. Stage comments mirror
    label.py's F/J/P operator map. ``lpm_segments`` (from
    :func:`collect_lpm_segments`) inlines the LPM lookup as a CASE
    chain instead of the broadcast join against ``banded_view``."""
    assert supports_sql_path(cfg, prepared)
    node_ip_set = prepared["node_ip_set"]
    zone_map = prepared["zone_map"]

    # --- F1-F5 reject chain (first reason wins => flat CASE) ---
    reject_whens = [
        (
            "(coalesce(orig_bytes, 0) = 0 AND coalesce(orig_packets, 0) = 0"
            " AND coalesce(reply_bytes, 0) = 0"
            " AND coalesce(reply_packets, 0) = 0)",
            "zero_counters",
        ),
        ("NOT (proto IN (6, 17))", "unsupported_proto"),
        (
            "(orig_src_ip = '127.0.0.1' OR orig_dst_ip = '127.0.0.1'"
            " OR reply_src_ip = '127.0.0.1' OR reply_dst_ip = '127.0.0.1')",
            "localhost",
        ),
    ]
    if cfg.ignore_udp:
        reject_whens.append(("proto = 17", "udp_ignored"))
    reject_whens.append(
        (
            "(orig_src_v6 IS NOT NULL OR orig_dst_v6 IS NOT NULL"
            " OR reply_src_v6 IS NOT NULL OR reply_dst_v6 IS NOT NULL)",
            "ipv6",
        )
    )
    r_sql = (
        "CASE "
        + " ".join(f"WHEN {c} THEN '{reason}'" for c, reason in reject_whens)
        + " ELSE NULL END"
    )

    # --- F6 node-flow hits as IN-set literals (null-safe via coalesce,
    # same as the isin path) ---
    if node_ip_set:
        in_list = ", ".join(_sql_lit(ip) for ip in sorted(node_ip_set))
        nip_hit = f"coalesce(orig_src_ip IN ({in_list}), false)"
        nip2_hit = f"coalesce(reply_src_ip IN ({in_list}), false)"
    else:
        nip_hit = nip2_hit = "false"

    # --- J1 pod-dim projections, one per endpoint side ---
    def pod_sub(side: str) -> str:
        cols = ", ".join(
            [f"pod_ip AS _{side}_pod_ip", f"ambiguous AS {side}_pod_ambiguous"]
            + [f"pod.{f} AS {side}_pod_{f}" for f in _POD_FIELDS]
        )
        return f"(SELECT {cols} FROM {pod_view})"

    # --- P3 flow type ---
    src_on = "(src_pod_name IS NOT NULL AND src_pod_node_name = node_name)"
    dst_on = "(dst_pod_name IS NOT NULL AND dst_pod_node_name = node_name)"
    flow_type_sql = (
        f"CASE WHEN {src_on} AND {dst_on} THEN 'betweenPodsOnNode' "
        f"WHEN {src_on} THEN 'fromPodOnNode' "
        f"WHEN {dst_on} THEN 'toPodOnNode' ELSE 'unknown' END"
    )

    # --- F6/J1/F7 reject fold (same first-wins order as label_flows) ---
    r2_sql = (
        "CASE WHEN _r IS NOT NULL THEN _r "
        "WHEN (_nip_hit OR _nip2_hit) THEN 'node_flow' "
        "WHEN (coalesce(src_pod_ambiguous, false)"
        " OR coalesce(dst_pod_ambiguous, false)) THEN 'ambiguous_pod' "
        "WHEN flow_type = 'unknown' THEN 'unknown_direction' "
        "ELSE NULL END"
    )

    # --- J7 classification + reject + remote projections ---
    cloud = _sql_lit(cfg.cloud)
    region = _sql_lit(cfg.region)
    cls_sql = (
        "CASE WHEN _remote_private THEN 'INTRA_VPC' "
        "WHEN lpm_cloud IS NULL THEN 'PUBLIC_INTERNET' "
        f"WHEN NOT (lpm_cloud = {cloud}) THEN 'PUBLIC_INTERNET' "
        "WHEN lpm_region = 'global' THEN 'INTRA_REGION' "
        f"WHEN lpm_region = {region} THEN 'INTRA_REGION' "
        "WHEN lpm_region = '' THEN 'UNKNOWN' "
        "ELSE 'INTER_REGION' END"
    )
    r3_sql = (
        "CASE WHEN _r IS NOT NULL THEN _r "
        "WHEN connection_class = 'UNKNOWN' THEN 'remote_label_error' "
        "ELSE NULL END"
    )
    remote_cloud_sql = (
        f"CASE WHEN _remote_private THEN {cloud} "
        "ELSE coalesce(lpm_cloud, '') END"
    )
    remote_region_sql = (
        f"CASE WHEN _remote_private THEN {region} "
        f"WHEN lpm_region = 'global' THEN {region} "
        "ELSE coalesce(lpm_region, '') END"
    )

    zmap = zone_map_sql(zone_map)
    if lpm_segments is not None:
        lit_out = ", ".join(f"_lpm.{c} AS lpm_{c}" for c in MATCH_COLS)
        s8 = (
            f"  SELECT *, {lit_out}\n"
            f"  FROM (SELECT *, {_lpm_literal_sql(lpm_segments)} AS _lpm"
            " FROM _s7)"
        )
    else:
        lpm_out = ", ".join(f"b.{c} AS lpm_{c}" for c in MATCH_COLS)
        s8 = (
            f"  SELECT /*+ BROADCAST(b) */ _s7.*, {lpm_out}\n"
            "  FROM _s7\n"
            f"  LEFT JOIN {banded_view} b\n"
            f"    ON shiftright(remote_ip_num, {BAND_SHIFT}) = b.band\n"
            "    AND remote_ip_num BETWEEN b.seg_start AND b.seg_end"
        )

    return f"""
WITH _s1 AS (
  SELECT *,
    {r_sql} AS _r,
    CAST(map_from_arrays(array(), array()) AS MAP<STRING,BOOLEAN>) AS _flags,
    orig_src_ip AS src_ip, orig_src_port AS src_port,
    reply_src_ip AS dst_ip, reply_src_port AS dst_port,
    {nip_hit} AS _nip_hit, {nip2_hit} AS _nip2_hit
  FROM {obs_view}
),
_s3 AS (
  SELECT /*+ BROADCAST(psrc), BROADCAST(pdst) */ _s1.*,
    psrc.src_pod_ambiguous,
    {', '.join(f'psrc.src_pod_{f}' for f in _POD_FIELDS)},
    pdst.dst_pod_ambiguous,
    {', '.join(f'pdst.dst_pod_{f}' for f in _POD_FIELDS)}
  FROM _s1
  LEFT JOIN {pod_sub('src')} psrc ON _s1.src_ip = psrc._src_pod_ip
  LEFT JOIN {pod_sub('dst')} pdst ON _s1.dst_ip = pdst._dst_pod_ip
),
_s4 AS (
  SELECT *, {flow_type_sql} AS flow_type FROM _s3
),
_s5 AS (
  SELECT node_name, ts, proto, flow_type,
    {r2_sql} AS _r,
    _flags,
    {', '.join(p4_select_exprs())}
  FROM _s4
),
_s6 AS (
  SELECT *, {_IP_TO_LONG_SQL} AS remote_ip_num FROM _s5
),
_s7 AS (
  SELECT *, {_private_ip_sql('remote_ip_num')} AS _remote_private FROM _s6
),
_s8 AS (
{s8}
),
_s9 AS (
  SELECT *, {cls_sql} AS connection_class FROM _s8
),
_s10 AS (
  SELECT *,
    {r3_sql} AS _r2,
    {remote_cloud_sql} AS remote_cloud,
    {remote_region_sql} AS remote_region,
    coalesce(lpm_service, '') AS remote_service
  FROM _s9
),
_s11 AS (
  SELECT *,
    coalesce(element_at({zmap}, local_pod_node_name), '') AS local_az,
    coalesce(element_at({zmap}, remote_pod_node_name), '') AS remote_az
  FROM _s10
)
SELECT {', '.join(final_select_exprs(cfg, reject_col='_r2'))} FROM _s11
"""


def flows_agg_sql(source: str) -> str:
    """to_flow_rows + summing_aggregate over ``source`` (a view or CTE
    of ACCEPTED labeled rows) as SQL text — X1 direction fan-out, P7/A2
    minute bucketing, A1 SummingMergeTree fold (operators/flows.py)."""
    exclude = {
        "reject_reason",
        "flow_type",
        "bytes_out",
        "bytes_in",
        "packets_out",
        "packets_in",
        "ts",
    }
    # label output column order = final_select_exprs order
    labeled_cols = [
        e.split(" AS ")[-1].strip() if " AS " in e else e
        for e in final_select_exprs(RuntimeConfig())
    ]
    keep = [c for c in labeled_cols if c not in exclude]
    group_cols = [c for c in DIM_COLS if c != "connectionFlags"]
    sel = ", ".join(
        "any_value(connectionFlags) AS connectionFlags"
        if c == "connectionFlags"
        else c
        for c in DIM_COLS
    )
    return f"""
SELECT {sel}, sum(bytes) AS bytes, sum(packets) AS packets
FROM (
  SELECT to_date(ts) AS date,
         date_trunc('minute', ts) AS intervalStartTime,
         CAST(60 AS INT) AS intervalSeconds,
         {', '.join(keep)},
         _d.direction AS direction,
         coalesce(_d.bytes, 0) AS bytes,
         coalesce(_d.packets, 0) AS packets
  FROM {source}
  LATERAL VIEW explode(array(
    named_struct('direction', 'out', 'bytes', bytes_out, 'packets', packets_out),
    named_struct('direction', 'in', 'bytes', bytes_in, 'packets', packets_in))) _t AS _d
)
GROUP BY {_FLAGS_KEY_SQL}, {', '.join(group_cols)}
"""


def flow_batch_sql(
    cfg: RuntimeConfig,
    prepared: dict,
    obs_view: str,
    pod_view: str,
    banded_view: str,
    lpm_segments: list | None = None,
) -> str:
    """The FULL per-batch pipeline (labeler -> accepted -> fan-out ->
    summing aggregation) as one SQL text over ``obs_view``."""
    body = labeled_sql(
        cfg, prepared, obs_view, pod_view, banded_view, lpm_segments
    )
    return (
        "WITH _labeled AS (" + body + "),\n"
        "_accepted AS (SELECT * FROM _labeled WHERE reject_reason IS NULL)\n"
        + flows_agg_sql("_accepted")
    )
