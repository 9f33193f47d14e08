"""Property-based tests (hypothesis) — the reference has none
(SURVEY.md §5 'Not used'); these pin the algebraic contracts the engine's
scale story depends on.
"""

from __future__ import annotations

from datetime import date, datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kubenetmon_spark.functions.ip import ip_to_long, long_to_ip
from kubenetmon_spark.operators.flows import summing_aggregate
from kubenetmon_spark.operators.lpm import disjoint_prefixes, lpm_lookup, lpm_lookup_disjoint
from kubenetmon_spark.schema import DIM_COLS

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@SLOW
@given(ips=st.lists(st.integers(min_value=0, max_value=2**32 - 1), min_size=1, max_size=20))
def test_ip_roundtrip(spark, ips):
    df = spark.createDataFrame([(v,) for v in ips], "ip_num long")
    rows = df.select("ip_num", ip_to_long(long_to_ip("ip_num")).alias("rt")).collect()
    assert all(r.ip_num == r.rt for r in rows)


_interval = st.integers(min_value=0, max_value=2**20).flatmap(
    lambda start: st.integers(min_value=0, max_value=2**14).map(
        lambda width: (start, start + width)
    )
)


@SLOW
@given(
    intervals=st.lists(_interval, min_size=1, max_size=12),
    probes=st.lists(st.integers(min_value=0, max_value=2**20 + 2**14), min_size=1, max_size=25),
)
def test_lpm_disjoint_equals_reduce_on_arbitrary_intervals(spark, intervals, probes):
    # arbitrary (even overlapping, non-CIDR) intervals: both LPM forms must
    # agree — winner = max prefix_len, tie-break min net_start
    rows = [
        (f"p{i}", s, e, (32 - (e - s).bit_length()), ["aws", "gcp", "azure"][i % 3], f"svc{i % 2}", f"r{i % 4}")
        for i, (s, e) in enumerate(intervals)
    ]
    prefixes = spark.createDataFrame(
        rows,
        "prefix string, net_start long, net_end long, prefix_len int, cloud string, service string, region string",
    )
    pdf = spark.createDataFrame([(p,) for p in probes], "ip_num long")
    cols = ["ip_num", "lpm_prefix", "lpm_cloud", "lpm_region"]
    a = sorted(map(tuple, lpm_lookup(pdf, prefixes, "ip_num").select(cols).collect()))
    b = sorted(
        map(tuple, lpm_lookup_disjoint(pdf, disjoint_prefixes(prefixes), "ip_num").select(cols).collect())
    )
    assert a == b


def _fact_df(spark, rows):
    base = {
        "date": date(2024, 3, 1),
        "intervalStartTime": datetime(2024, 3, 1, 12, 0),
        "intervalSeconds": 60,
        "environment": "development",
        "cluster": "c",
        "connectionFlags": {},
        "direction": "out",
        "localCloud": "aws",
        "localRegion": "r",
        "localCell": "",
        "localAvailabilityZone": "z",
        "localNode": "n",
        "localInstanceID": "",
        "localNamespace": "ns",
        "localPod": "p",
        "localApp": "a",
        "localIPv4": "10.0.0.1",
        "localPort": 1,
        "proto": "TCP",
        "connectionClass": "INTRA_VPC",
        "remoteCloud": "",
        "remoteRegion": "",
        "remoteCell": "",
        "remoteAvailabilityZone": "",
        "remoteCluster": "UNKNOWN",
        "remoteNode": "",
        "remoteInstanceID": "",
        "remoteNamespace": "",
        "remotePod": "",
        "remoteApp": "",
        "remoteIPv4": "1.2.3.4",
        "remotePort": 2,
        "remoteService": "",
    }
    data = []
    for pod, direction, port, flag, b, p in rows:
        r = dict(base)
        r.update(
            localPod=f"pod{pod}",
            direction="out" if direction else "in",
            localPort=port,
            connectionFlags={"f": True} if flag else {},
            bytes=b,
            packets=p,
        )
        data.append(r)
    from kubenetmon_spark.schema import NETWORK_FLOWS_SCHEMA

    return spark.createDataFrame(data, NETWORK_FLOWS_SCHEMA)


_fact_row = st.tuples(
    st.integers(min_value=0, max_value=3),   # pod
    st.booleans(),                            # direction
    st.integers(min_value=1, max_value=3),   # port
    st.booleans(),                            # flags
    st.integers(min_value=0, max_value=10**9),  # bytes
    st.integers(min_value=0, max_value=10**6),  # packets
)


def _rows(df):
    out = []
    for r in df.collect():
        d = r.asDict()
        d["connectionFlags"] = tuple(sorted(d["connectionFlags"].items()))
        out.append(tuple(d[k] for k in sorted(d)))
    return sorted(out)


@SLOW
@given(rows=st.lists(_fact_row, min_size=1, max_size=25))
def test_summing_aggregate_idempotent(spark, rows):
    fact = _fact_df(spark, rows)
    once = summing_aggregate(fact)
    twice = summing_aggregate(once)
    assert _rows(once) == _rows(twice)


@SLOW
@given(
    rows=st.lists(_fact_row, min_size=2, max_size=25),
    cut=st.integers(min_value=1, max_value=24),
)
def test_summing_aggregate_merge_associative(spark, rows, cut):
    # compaction correctness: aggregating per-batch then re-aggregating the
    # union equals aggregating everything at once (SummingMergeTree merges
    # are associative)
    cut = min(cut, len(rows) - 1)
    whole = summing_aggregate(_fact_df(spark, rows))
    parts = summing_aggregate(
        summing_aggregate(_fact_df(spark, rows[:cut])).unionByName(
            summing_aggregate(_fact_df(spark, rows[cut:]))
        )
    )
    assert _rows(whole) == _rows(parts)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.integers(min_value=-100, max_value=10**12), min_size=1, max_size=40))
def test_round_to_exp2_invariant(spark, vals):
    """roundToExp2(x): 0 for x<1, else the unique power of two p with
    p <= x < 2p — checked for arbitrary int64 inputs."""
    from kubenetmon_spark.sql import register_clickhouse_sql_functions

    register_clickhouse_sql_functions(spark)
    df = spark.createDataFrame([(v,) for v in vals], "x bigint")
    df.createOrReplaceTempView("_exp2_in")
    got = {
        r.x: r.p
        for r in spark.sql(
            "SELECT x, roundToExp2(x) AS p FROM _exp2_in"
        ).collect()
    }
    for v in vals:
        p = got[v]
        if v < 1:
            assert p == 0
        else:
            assert p & (p - 1) == 0  # power of two
            assert p <= v < 2 * p


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=2, max_size=40))
def test_timing_bucket_properties(spark, vals):
    """timing_bucket is monotone, idempotent, and never above its input
    (after the 0-clamp) — so quantileTiming can only round DOWN."""
    from kubenetmon_spark.operators.agg import timing_bucket

    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    got = [
        (r.v, r.b, r.bb)
        for r in df.select(
            "v",
            timing_bucket(F.col("v")).alias("b"),
            timing_bucket(timing_bucket(F.col("v"))).alias("bb"),
        ).collect()
    ]
    by_v = sorted(got)
    for i, (v, b, bb) in enumerate(by_v):
        assert b == bb                      # idempotent
        assert b <= max(v, 0)               # never rounds up
        assert 0 <= b <= 30000
        if i > 0:
            assert by_v[i - 1][1] <= b      # monotone


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.dictionaries(
                st.sampled_from(["a", "b", "c", "d"]),
                st.integers(min_value=-1000, max_value=1000),
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_map_aggregate_many_matches_python_reference(spark, rows):
    from kubenetmon_spark.operators.agg import map_aggregate_many

    df = spark.createDataFrame(rows, "g int, m map<string,bigint>")
    got = {
        r.g: r for r in map_aggregate_many(df, "m", ["g"], ["sum", "min", "max"]).collect()
    }
    ref: dict[int, dict[str, dict[str, int]]] = {}
    for g, m in rows:
        for k, v in m.items():
            d = ref.setdefault(g, {}).setdefault(k, {"sum": 0, "min": v, "max": v})
            d["sum"] += v
            d["min"] = min(d["min"], v)
            d["max"] = max(d["max"], v)
    for g, per_key in ref.items():
        if not per_key:
            continue
        assert got[g].sum_map == {k: d["sum"] for k, d in per_key.items()}
        assert got[g].min_map == {k: d["min"] for k, d in per_key.items()}
        assert got[g].max_map == {k: d["max"] for k, d in per_key.items()}


@SLOW
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta"]),
            min_size=0,
            max_size=5,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_dedup_lines_conservation_and_first_wins(spark, docs):
    from kubenetmon_spark.operators.curation import dedup_lines

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in dedup_lines(df, "doc_id").collect()}
    seen: set[str] = set()
    assert set(out) == set(range(len(docs)))  # one row per input doc
    for i, lines in enumerate(docs):
        nonempty = [l for l in lines if l != ""]
        if not nonempty:
            # no non-empty lines: the doc survives as ("", 0, 0)
            # instead of silently vanishing from the corpus
            r = out[i]
            assert (r.n_lines, r.n_kept, r.dedup_text) == (0, 0, "")
            continue
        expect = []
        for pos, l in enumerate(nonempty):
            # first occurrence corpus-wide wins, ordered by (doc, pos);
            # within a doc only the first copy of a line survives
            if l not in seen:
                seen.add(l)
                expect.append(l)
        r = out[i]
        assert r.n_lines == len(nonempty)
        assert r.dedup_text == "\n".join(expect)
        assert r.n_kept == len(expect)


@SLOW
@given(
    snaps=st.lists(
        st.tuples(
            st.sampled_from(["k0", "k1", "k2"]),
            st.integers(min_value=0, max_value=15),  # hour offset = ts
            st.sampled_from(["a", "b", None]),  # attr, null transitions incl.
        ),
        min_size=1,
        max_size=25,
        # one snapshot per (key, ts): duplicate timestamps have no
        # defined order and the operator documents snapshot granularity
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_scd2_matches_run_collapse_reference(spark, snaps):
    """scd2_from_snapshots == a sequential run-collapse over each key's
    time-ordered snapshots: intervals tile [first_ts, FAR_FUTURE), no two
    consecutive intervals share attrs (null-safely), and as-of lookup at
    every snapshot ts reproduces that snapshot exactly."""
    from kubenetmon_spark.operators.scd import (
        FAR_FUTURE,
        as_of_dimension,
        scd2_from_snapshots,
    )

    rows = [(k, datetime(2024, 1, 1, h), a) for k, h, a in snaps]
    df = spark.createDataFrame(rows, "k string, snapshot_ts timestamp, app string")
    out = scd2_from_snapshots(df, ["k"], ["app"]).collect()

    # python reference: collapse runs of equal attr per key
    expect: dict[str, list[tuple]] = {}
    for k, h, a in sorted(snaps):
        runs = expect.setdefault(k, [])
        if not runs or runs[-1][0] != a:
            runs.append((a, datetime(2024, 1, 1, h)))
    far = datetime.fromisoformat(FAR_FUTURE.replace(" ", "T"))
    nskey = lambda t: (t[0], t[1] is not None, t[1] or "", t[2])  # noqa: E731
    want = sorted(
        (
            (k, a, vf, runs[i + 1][1] if i + 1 < len(runs) else far)
            for k, runs in expect.items()
            for i, (a, vf) in enumerate(runs)
        ),
        key=nskey,
    )
    got = sorted(
        ((r.k, r.app, r.valid_from, r.valid_to) for r in out), key=nskey
    )
    assert got == want

    # as-of at each snapshot instant reproduces the snapshot
    by_ts: dict[datetime, dict[str, str | None]] = {}
    for k, h, a in snaps:
        by_ts.setdefault(datetime(2024, 1, 1, h), {})[k] = a
    scd2 = scd2_from_snapshots(df, ["k"], ["app"])
    for ts in list(by_ts)[:3]:  # cap lookups; each is a Spark job
        at = {r.k: r.app for r in as_of_dimension(scd2, ts).collect()}
        for k, a in by_ts[ts].items():
            assert at[k] == a


@SLOW
@given(
    left=st.lists(
        st.tuples(
            st.sampled_from(["k0", "k1"]),
            st.integers(min_value=0, max_value=100),  # ts (numeric units)
        ),
        min_size=1,
        max_size=20,
    ),
    right=st.lists(
        st.tuples(
            st.sampled_from(["k0", "k1"]),
            st.integers(min_value=0, max_value=100),
            st.integers(min_value=0, max_value=9),  # payload
        ),
        min_size=0,
        max_size=20,
        unique_by=lambda t: (t[0], t[1]),  # one right row per (key, ts):
        # equal-ts right rows tie on the window order and the winner
        # would be arbitrary — same precondition as any as-of source
    ),
    tol=st.sampled_from([None, 10, 40]),
)
def test_asof_join_matches_sequential_reference(spark, left, right, tol):
    """asof_join == per-left-row max{right.ts <= left.ts} scan, incl.
    inclusive-at-equal-ts semantics and the tolerance discard."""
    from kubenetmon_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left)], "k string, ts long, lid long"
    )
    rdf = spark.createDataFrame(right, "k string, ts long, v long")
    got = {
        r.lid: (r.asof_ts, r.v)
        for r in asof_join(ldf, rdf, ["k"], tolerance_seconds=tol).collect()
    }
    assert len(got) == len(left)
    for i, (k, ts) in enumerate(left):
        matches = [(rts, v) for rk, rts, v in right if rk == k and rts <= ts]
        want = max(matches) if matches else None
        if want is not None and tol is not None and ts - want[0] > tol:
            want = None
        assert got[i] == (want if want else (None, None)), (
            f"left row {i} (k={k}, ts={ts}): {got[i]} != {want}"
        )


@SLOW
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["u0", "u1"]),
            st.integers(min_value=0, max_value=500),  # epoch seconds
        ),
        min_size=1,
        max_size=30,
    ),
    gap=st.sampled_from([1, 30, 100]),
)
def test_sessionize_matches_sequential_scan(spark, events, gap):
    """sessionize == a per-key sequential scan over (ts, id)-ordered
    events, incl. duplicate timestamps (broken by the unique id)."""
    from kubenetmon_spark.operators.sessions import sessionize

    rows = [(k, datetime(2024, 1, 1, 0, 0, 0) + __import__("datetime").timedelta(seconds=s), i)
            for i, (k, s) in enumerate(events)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid long")
    got = {
        r.eid: r.session_id
        for r in sessionize(df, ["k"], gap_seconds=gap, order_cols=["eid"]).collect()
    }
    by_key: dict[str, list[tuple[int, int]]] = {}
    for i, (k, s) in enumerate(events):
        by_key.setdefault(k, []).append((s, i))
    for k, evs in by_key.items():
        sid, prev = 0, None
        for s, i in sorted(evs):
            if prev is None or s - prev > gap:
                sid += 1
            prev = s
            assert got[i] == sid, f"event {i} (k={k}, t={s}): {got[i]} != {sid}"


@SLOW
@given(
    snaps=st.lists(
        st.tuples(
            st.sampled_from(["k0", "k1", "k2"]),
            st.integers(min_value=0, max_value=15),
            st.sampled_from(["a", "b", None]),
        ),
        min_size=2,
        max_size=20,
        unique_by=lambda t: (t[0], t[1]),
    ),
    cuts=st.lists(st.integers(min_value=1, max_value=14), max_size=2, unique=True),
)
def test_scd2_incremental_equals_rebuild(spark, snaps, cuts):
    """Applying time-ordered snapshot batches via scd2_apply_batch, in any
    batching, equals scd2_from_snapshots over the concatenated history."""
    from kubenetmon_spark.operators.scd import (
        scd2_apply_batch,
        scd2_from_snapshots,
    )

    schema = "k string, snapshot_ts timestamp, app string"

    def df_of(sub):
        return spark.createDataFrame(
            [(k, datetime(2024, 1, 1, h), a) for k, h, a in sub], schema
        )

    bounds = sorted(set(cuts)) + [16]
    lo = -1
    batches = []
    for b in bounds:
        batch = [t for t in snaps if lo < t[1] <= b]
        lo = b
        if batch:
            batches.append(batch)
    if not batches:
        return
    inc = scd2_from_snapshots(df_of(batches[0]), ["k"], ["app"])
    for batch in batches[1:]:
        inc = scd2_apply_batch(inc, df_of(batch), ["k"], ["app"])
    full = scd2_from_snapshots(df_of(snaps), ["k"], ["app"])
    nskey = lambda t: (t[0], t[1] is not None, t[1] or "", t[2])  # noqa: E731
    rows = lambda df: sorted(  # noqa: E731
        ((r.k, r.app, r.valid_from, r.valid_to) for r in df.collect()), key=nskey
    )
    assert rows(inc) == rows(full)


_series = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=1_000_000),
        st.one_of(st.none(), st.integers(min_value=-1_000_000, max_value=1_000_000)),
    ),
    min_size=1,
    max_size=24,
    unique_by=lambda t: (t[0], t[1]),
)


@SLOW
@given(rows=_series)
def test_interpolate_linear_matches_sequential_reference(spark, rows):
    """interpolate_linear == per-key sequential scan: anchors pass
    through, interior nulls get prev + floor-div slope fill, edge nulls
    (missing anchor on either side) stay null. Python // on ints IS the
    exact floor the operator's IEEE-double quotient reproduces."""
    from kubenetmon_spark.operators.timeseries import interpolate_linear

    df = spark.createDataFrame(rows, "k string, x long, y long")
    got = {
        (r.k, r.x): r.y_filled
        for r in interpolate_linear(df, ["k"], "x", "y").collect()
    }

    expected = {}
    by_key: dict = {}
    for k, x, y in rows:
        by_key.setdefault(k, []).append((x, y))
    for k, series in by_key.items():
        series.sort()
        for i, (x, y) in enumerate(series):
            if y is not None:
                expected[(k, x)] = y
                continue
            prev = next(
                ((px, py) for px, py in reversed(series[:i]) if py is not None),
                None,
            )
            nxt = next(
                ((nx, ny) for nx, ny in series[i + 1 :] if ny is not None), None
            )
            if prev is None or nxt is None:
                expected[(k, x)] = None
            else:
                (px, py), (nx, ny) = prev, nxt
                expected[(k, x)] = py + ((ny - py) * (x - px)) // (nx - px)
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    tokens=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=60),
    n_shards=st.integers(min_value=1, max_value=9),
)
def test_shard_pack_matches_serpentine_spec(spark, tokens, n_shards):
    """shard_pack_balanced == the sequential serpentine deal over
    (tokens DESC, id), for arbitrary token multisets and shard counts."""
    from kubenetmon_spark.operators.curation import shard_pack_balanced

    rows = list(enumerate(tokens))
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.doc_id: (r._rank, r._shard)
        for r in shard_pack_balanced(df, n_shards, "n_tokens", "doc_id").collect()
    }
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    for rank, (i, _) in enumerate(order):
        p = rank % (2 * n_shards)
        shard = p if p < n_shards else 2 * n_shards - 1 - p
        assert got[i] == (rank, shard)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),      # stratum
            st.integers(min_value=1, max_value=400),    # tokens
        ),
        min_size=1,
        max_size=40,
    ),
    mult_bp=st.lists(
        st.integers(min_value=0, max_value=35000), min_size=3, max_size=3
    ),
)
def test_mixture_epochs_matches_spec(spark, data, mult_bp):
    """mixture_epochs == the per-row md5 spec for arbitrary strata sizes
    and targets from 0 to 3.5x the corpus."""
    import hashlib

    from kubenetmon_spark.operators.curation import mixture_epochs

    rows = [(i, f"s{s}", t) for i, (s, t) in enumerate(data)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    totals = {}
    for _, s, t in rows:
        totals[s] = totals.get(s, 0) + t
    targets = {
        f"s{j}": totals.get(f"s{j}", 0) * mult_bp[j] // 10000 for j in range(3)
    }
    got = {
        (r.doc_id, r.epoch)
        for r in mixture_epochs(df, targets, "n_tokens", "source", "doc_id").collect()
    }
    want = set()
    for i, s, _ in rows:
        n, tgt = totals[s], targets.get(s, 0)
        if tgt <= 0:
            continue
        full, bp = tgt // n, (tgt % n) * 10000 // n
        thr = format(65536 * bp // 10000, "04x")
        for e in range(full + 1):
            if e < full or hashlib.md5(f"{i}|{e}".encode()).hexdigest()[:4] < thr:
                want.add((i, e))
    assert got == want


def test_k_hop_and_temporal_reachability_match_python_bfs(spark):
    """Randomized differential: level-synchronous BFS and min-arrival
    relaxation vs sequential Python references on random digraphs."""
    import random

    from kubenetmon_spark.operators.graph import (
        k_hop_reachability,
        temporal_reachability,
    )

    rng = random.Random(23)
    for trial in range(3):
        n = rng.randrange(6, 14)
        nodes = [f"n{i}" for i in range(n)]
        edges = [
            (rng.choice(nodes), rng.choice(nodes), rng.randrange(0, 50))
            for _ in range(rng.randrange(5, 40))
        ]
        seeds = rng.sample(nodes, rng.randrange(1, 3))
        k = rng.randrange(1, 5)

        # Python BFS (min hops)
        exp_hops = {s: 0 for s in seeds}
        frontier = set(seeds)
        for lvl in range(1, k + 1):
            nxt = {
                d for (s, d, _) in edges if s in frontier
            } - exp_hops.keys()
            for d in nxt:
                exp_hops[d] = lvl
            frontier = nxt
            if not frontier:
                break

        # Python Bellman-Ford min-arrival (k rounds, seeds arrival 0)
        exp_arr = {s: 0 for s in seeds}
        for _ in range(k):
            cur = dict(exp_arr)
            for (s, d, t) in edges:
                if s in cur and t >= cur[s]:
                    if d not in exp_arr or t < exp_arr[d]:
                        exp_arr[d] = min(exp_arr.get(d, t), t)
            # recompute fixpoint-style against updated table next round

        e_df = spark.createDataFrame(edges, "s string, d string, ts long")
        seed_df = spark.createDataFrame(
            [(s,) for s in seeds], "node string"
        )
        got_hops = {
            r.node: r.hops
            for r in k_hop_reachability(e_df, "s", "d", seed_df, k).collect()
        }
        assert got_hops == exp_hops, f"trial {trial} hops"

        seed_arr = spark.createDataFrame(
            [(s, 0) for s in seeds], "node string, arrival long"
        )
        got_arr = {
            r.node: r.arrival
            for r in temporal_reachability(
                e_df, "s", "d", "ts", seed_arr, k
            ).collect()
        }
        assert got_arr == exp_arr, f"trial {trial} arrivals"


@SLOW
@given(
    docs=st.lists(
        st.text(alphabet=" ab", max_size=24),  # tiny alphabet -> real dup spans
        min_size=1,
        max_size=6,
    ),
    k=st.sampled_from([2, 3]),
)
def test_remove_duplicate_spans_matches_bruteforce(spark, docs, k):
    """ExactSubstr removal == a sequential Python scan: first (doc,pos)
    occurrence of every duplicated k-gram survives, all other
    occurrences' tokens are cut, every input doc survives (empty docs
    included — the silent-doc-loss regression)."""
    import re

    from kubenetmon_spark.operators.dedup import remove_duplicate_spans

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.dedup_text, r.n_tokens, r.n_removed)
        for r in remove_duplicate_spans(df, "doc_id", "text", k=k).collect()
    }

    toks = {
        i: [t for t in re.split(r"\s+", text) if t]
        for i, text in enumerate(docs)
    }
    occs: dict[str, list[tuple[int, int]]] = {}
    for i in sorted(toks):
        a = toks[i]
        for p in range(len(a) - k + 1):
            occs.setdefault(" ".join(a[p : p + k]), []).append((i, p))
    covered: dict[int, set] = {i: set() for i in toks}
    for g, lst in occs.items():
        if len(lst) > 1:
            for i, p in lst[1:]:  # (doc, pos) order = first survives
                covered[i].update(range(p, p + k))
    for i, a in toks.items():
        kept = " ".join(t for x, t in enumerate(a) if x not in covered[i])
        want = (kept, len(a), len(covered[i]))
        assert got[i] == want, f"doc {i}: {got[i]} != {want}"
    assert set(got) == set(toks)  # every doc survives, empty ones too
