"""Tests for the ClickHouse time-ordered/map aggregate analogues:
retention, sequenceMatch, deltaSum, sumMap/minMap/maxMap, and LTTB
downsampling — each validated against a pure-Python reference on
randomized data, plus empty-input robustness.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from kubenetmon_spark.operators.agg import map_aggregate
from kubenetmon_spark.operators.funnel import retention, sequence_match
from kubenetmon_spark.operators.timeseries import delta_sum, lttb_downsample

EV_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t", LongType()),
        StructField("event_type", StringType()),
        StructField("x", LongType()),
        StructField("event_id", LongType()),
    ]
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def _rand_rows(seed, n_users=8, n=200, types=("a", "b", "c", "d")):
    rng = random.Random(seed)
    return [
        (
            rng.randrange(n_users),
            rng.randrange(0, 500),
            rng.choice(types),
            rng.randrange(-1000, 1000),
            i,
        )
        for i in range(n)
    ]


class TestRetention:
    def test_matches_python(self, spark):
        rows = _rand_rows(7)
        conds = ["a", "b", "c"]
        got = {
            r.user_id: (r.r1, r.r2, r.r3)
            for r in retention(
                _mk(spark, rows),
                [F.col("event_type") == c for c in conds],
            ).collect()
        }
        users = {u for u, *_ in rows}
        for u in users:
            seen = {tp for uu, _, tp, _, _ in rows if uu == u}
            c0 = int("a" in seen)
            exp = (c0, c0 * int("b" in seen), c0 * int("c" in seen))
            assert got[u] == exp, u

    def test_anchor_gates_later_flags(self, spark):
        # user has 'b' events but never the anchor 'a' -> all flags 0
        rows = [(1, 10, "b", 0, 0), (1, 20, "b", 0, 1)]
        out = retention(
            _mk(spark, rows),
            [F.col("event_type") == "a", F.col("event_type") == "b"],
        ).collect()
        assert out[0].r1 == 0 and out[0].r2 == 0


class TestSequenceMatch:
    def _brute(self, rows, steps):
        # exists a strictly-increasing-ts chain of the step types
        by_user = {}
        for u, t, tp, _, _ in rows:
            by_user.setdefault(u, []).append((t, tp))
        out = {}
        for u, evs in by_user.items():
            if not any(tp in steps for _, tp in evs):
                continue
            evs.sort()
            best = -1  # earliest end-ts of a chain to level i (greedy)
            level = 0
            for t, tp in evs:
                if level < len(steps) and tp == steps[level] and t > best:
                    level += 1
                    best = t
            out[u] = level >= len(steps)
        return out

    def test_matches_brute_force(self, spark):
        for seed in (1, 2, 3):
            rows = _rand_rows(seed, n_users=6, n=120)
            steps = ["a", "b", "c"]
            df = _mk(spark, rows).withColumn(
                "ts", F.timestamp_seconds(F.col("t"))
            )
            got = {
                r.user_id: r.matched
                for r in sequence_match(df, steps).collect()
            }
            assert got == self._brute(rows, steps), seed

    def test_equal_ts_never_chain(self, spark):
        rows = [(1, 100, "a", 0, 0), (1, 100, "b", 0, 1)]
        df = _mk(spark, rows).withColumn(
            "ts", F.timestamp_seconds(F.col("t"))
        )
        got = sequence_match(df, ["a", "b"]).collect()
        assert got[0].matched is False


class TestDeltaSum:
    def test_matches_python(self, spark):
        rows = _rand_rows(11)
        got = {
            r.user_id: r.delta_sum
            for r in delta_sum(
                _mk(spark, rows), ["user_id"], "t", "x", "event_id"
            ).collect()
        }
        by_user = {}
        for u, t, _, x, eid in rows:
            by_user.setdefault(u, []).append((t, eid, x))
        for u, vs in by_user.items():
            vs.sort()
            exp = sum(
                max(0, b[2] - a[2]) for a, b in zip(vs, vs[1:])
            )
            assert got[u] == exp, u

    def test_single_row_is_zero(self, spark):
        out = delta_sum(
            _mk(spark, [(1, 5, "a", 42, 0)]), ["user_id"], "t", "x", "event_id"
        ).collect()
        assert out[0].delta_sum == 0


class TestMapAggregate:
    def test_sum_min_max_match_python(self, spark):
        rows = _rand_rows(13)
        df = _mk(spark, rows).select(
            "user_id", F.create_map(F.col("event_type"), F.col("x")).alias("m")
        )
        ref: dict[int, dict[str, list[int]]] = {}
        for u, _, tp, x, _ in rows:
            ref.setdefault(u, {}).setdefault(tp, []).append(x)
        for how, fold in [("sum", sum), ("min", min), ("max", max)]:
            got = {
                r.user_id: r.out
                for r in map_aggregate(
                    df, "m", ["user_id"], how=how, out_col="out"
                ).collect()
            }
            for u, per_key in ref.items():
                assert got[u] == {k: fold(v) for k, v in per_key.items()}, (
                    how,
                    u,
                )

    def test_entries_key_sorted(self, spark):
        rows = [(1, 0, "z", 1, 0), (1, 0, "a", 2, 1), (1, 0, "m", 3, 2)]
        df = _mk(spark, rows).select(
            "user_id", F.create_map(F.col("event_type"), F.col("x")).alias("m")
        )
        out = map_aggregate(df, "m", ["user_id"]).select(
            F.map_keys("sum_map").alias("ks")
        ).collect()
        assert out[0].ks == ["a", "m", "z"]

    def test_rejects_unknown_how(self, spark):
        df = _mk(spark, []).select(
            "user_id", F.create_map(F.col("event_type"), F.col("x")).alias("m")
        )
        with pytest.raises(ValueError):
            map_aggregate(df, "m", ["user_id"], how="avg")


def _py_lttb(points, n_buckets):
    """Pure-Python reference of the parallel LTTB variant: neighbor
    bucket-average anchors, exact integer cross products."""
    pts = sorted(points)  # (t, tb, v) ordering below; store as (t, tb, v)
    n = len(pts)
    if n == 0:
        return []
    buckets: dict[int, list] = {}
    for i, p in enumerate(pts):
        rn = i + 1
        if rn == 1:
            b = 0
        elif rn == n:
            b = n_buckets - 1
        else:
            b = (rn - 2) * (n_buckets - 2) // max(n - 2, 1) + 1
        buckets.setdefault(b, []).append((rn, p))
    sums = {
        b: (
            sum(p[0] for _, p in v),
            sum(p[2] for _, p in v),
            len(v),
        )
        for b, v in buckets.items()
    }
    out = []
    ordered = sorted(sums)
    for bi, b in enumerate(ordered):
        if b == 0 or b == n_buckets - 1:
            out.extend((b, p) for _, p in buckets[b])
            continue
        pb, nb = ordered[bi - 1], ordered[bi + 1]
        pt_, pv_, pc = sums[pb]
        nt_, nv_, nc = sums[nb]
        best = None
        for rn, (t, tb, v) in buckets[b]:
            a2 = abs(
                (pt_ - pc * t) * (nv_ - nc * v)
                - (nt_ - nc * t) * (pv_ - pc * v)
            )
            key = (a2, -rn)
            if best is None or key > best[0]:
                best = (key, (t, tb, v))
        out.append((b, best[1]))
    return sorted((b, t, v, tb) for b, (t, tb, v) in out)


class TestLTTB:
    def test_matches_python_reference(self, spark):
        for seed in (3, 5):
            rng = random.Random(seed)
            rows = [
                (1, rng.randrange(0, 10_000), "a", rng.randrange(-500, 500), i)
                for i in range(300)
            ]
            got = sorted(
                (r.bucket, r.t, r.x, r.event_id)
                for r in lttb_downsample(
                    _mk(spark, rows).select("user_id", "t", "x", "event_id"),
                    ["user_id"],
                    "t",
                    "x",
                    10,
                    "event_id",
                ).collect()
            )
            exp = _py_lttb([(t, eid, x) for _, t, _, x, eid in rows], 10)
            assert got == exp, seed

    def test_keeps_first_and_last(self, spark):
        rows = [(1, i, "a", i * 7 % 13, i) for i in range(50)]
        out = lttb_downsample(
            _mk(spark, rows).select("user_id", "t", "x", "event_id"),
            ["user_id"],
            "t",
            "x",
            5,
            "event_id",
        ).collect()
        ts = {r.t for r in out}
        assert 0 in ts and 49 in ts
        assert len(out) <= 5

    def test_rejects_tiny_bucket_count(self, spark):
        with pytest.raises(ValueError):
            lttb_downsample(
                _mk(spark, []), ["user_id"], "t", "x", 2, "event_id"
            )


class TestEmptyInputs:
    def test_all_empty_safe(self, spark):
        e = _mk(spark, [])
        assert retention(e, [F.col("event_type") == "a"]).count() == 0
        ets = e.withColumn("ts", F.timestamp_seconds(F.col("t")))
        assert sequence_match(ets, ["a", "b"]).count() == 0
        assert delta_sum(e, ["user_id"], "t", "x", "event_id").count() == 0
        m = e.select(
            "user_id", F.create_map(F.col("event_type"), F.col("x")).alias("m")
        )
        assert map_aggregate(m, "m", ["user_id"]).count() == 0
        assert (
            lttb_downsample(e, ["user_id"], "t", "x", 5, "event_id").count()
            == 0
        )


class TestWeightedQuantile:
    def test_matches_python(self, spark):
        from kubenetmon_spark.operators.agg import weighted_quantile_exact

        rows = _rand_rows(17, n_users=4, n=150)
        df = _mk(spark, rows).select(
            "user_id", "x", (F.col("event_id") % 5 + 1).alias("w")
        )
        got = {
            r.user_id: (r.p25, r.p50, r.p90)
            for r in weighted_quantile_exact(
                df, ["user_id"], "x", "w", [25, 50, 90]
            ).collect()
        }
        by_user = {}
        for u, _, _, x, eid in rows:
            by_user.setdefault(u, []).append((x, eid % 5 + 1))
        for u, vs in by_user.items():
            vs.sort()
            tot = sum(w for _, w in vs)
            exp = []
            for p in (25, 50, 90):
                cum = 0
                for x, w in vs:
                    cum += w
                    if cum * 100 >= tot * p:
                        exp.append(x)
                        break
            assert got[u] == tuple(exp), u

    def test_unit_weights_are_plain_quantiles(self, spark):
        from kubenetmon_spark.operators.agg import weighted_quantile_exact

        df = _mk(
            spark, [(1, 0, "a", v, i) for i, v in enumerate(range(1, 101))]
        ).select("user_id", "x", F.lit(1).alias("w"))
        r = weighted_quantile_exact(
            df, ["user_id"], "x", "w", [50, 100]
        ).collect()[0]
        assert r.p50 == 50 and r.p100 == 100


class TestIntervalUnion:
    def test_matches_python_sweep(self, spark):
        from kubenetmon_spark.operators.timeseries import interval_union_length

        rng = random.Random(9)
        rows = [
            (rng.randrange(5), rng.randrange(1000), 0, i)
            for i in range(300)
        ]
        ivs = [(u, s, s + rng.randrange(1, 50), i) for i, (u, s, _, _) in enumerate(rows)]
        df = spark.createDataFrame(ivs, ["user_id", "s", "e", "event_id"])
        got = {
            r.user_id: r.union_len
            for r in interval_union_length(
                df, ["user_id"], "s", "e", "event_id"
            ).collect()
        }
        by_user: dict = {}
        for u, s, e, _ in ivs:
            by_user.setdefault(u, []).append((s, e))
        for u, v in by_user.items():
            v.sort()
            total, cur_s, cur_e = 0, None, None
            for s, e in v:
                if cur_e is None or s > cur_e:
                    if cur_e is not None:
                        total += cur_e - cur_s
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
            total += cur_e - cur_s
            assert got[u] == total, u

    def test_disjoint_and_nested(self, spark):
        from kubenetmon_spark.operators.timeseries import interval_union_length

        ivs = [(1, 0, 10, 0), (1, 20, 30, 1), (1, 2, 5, 2)]  # nested inside [0,10)
        got = interval_union_length(
            spark.createDataFrame(ivs, ["u", "s", "e", "id"]), ["u"], "s", "e", "id"
        ).collect()[0].union_len
        assert got == 20


class TestStatsAggregates:
    def test_welch_matches_scipy_formula(self, spark):
        import math

        from kubenetmon_spark.operators.stats import welch_t_test

        rng = random.Random(21)
        rows = [
            ("g", "a" if i % 2 else "b", rng.randrange(-500, 500))
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, ["grp", "variant", "x"])
        r = welch_t_test(df, ["grp"], "x", "variant", "a", "b").collect()[0]
        xa = [x for _, v, x in rows if v == "a"]
        xb = [x for _, v, x in rows if v == "b"]

        def mv(xs):
            n = len(xs)
            m = sum(xs) / n
            var = sum((x - m) ** 2 for x in xs) / (n - 1)
            return n, m, var

        na, ma, va = mv(xa)
        nb, mb, vb = mv(xb)
        t = (ma - mb) / math.sqrt(va / na + vb / nb)
        assert abs(r.t_stat - t) < 1e-5
        assert r.n1 == na and r.n2 == nb

    def test_corr_perfect_and_independent(self, spark):
        from kubenetmon_spark.operators.stats import pearson_corr_exact

        lin = [("g", i, 3 * i + 7) for i in range(100)]
        r = pearson_corr_exact(
            spark.createDataFrame(lin, ["grp", "x", "y"]), ["grp"], "x", "y"
        ).collect()[0]
        assert abs(r.corr - 1.0) < 1e-9
        const = [("g", i, 5) for i in range(10)]
        r2 = pearson_corr_exact(
            spark.createDataFrame(const, ["grp", "x", "y"]), ["grp"], "x", "y"
        ).collect()[0]
        assert r2.corr is None  # zero variance side -> null

    def test_entropy_uniform_and_point_mass(self, spark):
        from kubenetmon_spark.operators.stats import shannon_entropy

        uni = [("u", v) for v in range(8) for _ in range(5)]
        r = shannon_entropy(
            spark.createDataFrame(uni, ["grp", "v"]), ["grp"], "v"
        ).collect()[0]
        assert abs(r.entropy_bits - 3.0) < 1e-9  # 8 equally likely -> 3 bits
        point = [("p", 42)] * 10
        r2 = shannon_entropy(
            spark.createDataFrame(point, ["grp", "v"]), ["grp"], "v"
        ).collect()[0]
        assert abs(r2.entropy_bits - 0.0) < 1e-9


class TestRankStats:
    def _data(self, seed, n=300):
        rng = random.Random(seed)
        # coarse values force ties so midrank handling is exercised
        return [
            ("g", "a" if rng.random() < 0.5 else "b", rng.randrange(0, 40))
            for _ in range(n)
        ]

    def test_mann_whitney_matches_python(self, spark):
        import math

        from kubenetmon_spark.operators.stats import mann_whitney_u

        rows = self._data(31)
        df = spark.createDataFrame(rows, ["grp", "variant", "x"])
        r = mann_whitney_u(df, ["grp"], "x", "variant", "a", "b").collect()[0]
        xs = sorted((x, v) for _, v, x in rows)
        # midranks
        ranks = {}
        i = 0
        vals = [x for x, _ in xs]
        while i < len(vals):
            j = i
            while j < len(vals) and vals[j] == vals[i]:
                j += 1
            mid = (i + 1 + j) / 2  # average of ranks i+1..j
            ranks.setdefault(vals[i], mid)
            i = j
        r1 = sum(ranks[x] for x, v in xs if v == "a")
        n1 = sum(1 for _, v in xs if v == "a")
        n2 = len(xs) - n1
        u1 = r1 - n1 * (n1 + 1) / 2
        n = n1 + n2
        tie3 = sum(
            t**3 - t
            for t in __import__("collections").Counter(vals).values()
        )
        sigma2 = n1 * n2 / 12 * ((n + 1) - tie3 / (n * (n - 1)))
        z = (u1 - n1 * n2 / 2) / math.sqrt(sigma2)
        assert r.n1 == n1 and r.n2 == n2
        assert abs(r.u1 - u1) < 1e-9
        assert abs(r.z - z) < 1e-5

    def test_ks_matches_python(self, spark):
        from kubenetmon_spark.operators.stats import ks_test

        rows = self._data(37)
        df = spark.createDataFrame(rows, ["grp", "variant", "x"])
        r = ks_test(df, ["grp"], "x", "variant", "a", "b").collect()[0]
        a = sorted(x for _, v, x in rows if v == "a")
        b = sorted(x for _, v, x in rows if v == "b")
        n1, n2 = len(a), len(b)
        points = sorted(set(a + b))
        import bisect

        d = max(
            abs(
                bisect.bisect_right(a, p) / n1
                - bisect.bisect_right(b, p) / n2
            )
            for p in points
        )
        assert r.n1 == n1 and r.n2 == n2
        assert abs(r.d_stat - d) < 1e-6

    def test_ks_identical_samples_zero(self, spark):
        from kubenetmon_spark.operators.stats import ks_test

        rows = [("g", v, x) for x in range(20) for v in ("a", "b")]
        df = spark.createDataFrame(rows, ["grp", "variant", "x"])
        assert ks_test(df, ["grp"], "x", "variant", "a", "b").collect()[0].d_stat == 0.0


class TestMomentAndAssociationStats:
    def test_spearman_matches_python(self, spark):
        import math

        from kubenetmon_spark.operators.stats import spearman_rank_corr

        rng = random.Random(41)
        # coarse values on both axes force midrank ties on both sides
        rows = [("g", rng.randrange(0, 25), rng.randrange(0, 12)) for _ in range(300)]
        df = spark.createDataFrame(rows, ["grp", "x", "y"])
        r = spearman_rank_corr(df, ["grp"], "x", "y").collect()[0]

        def midranks(vals):
            order = sorted(range(len(vals)), key=lambda i: vals[i])
            ranks = [0.0] * len(vals)
            i = 0
            while i < len(order):
                j = i
                while j < len(order) and vals[order[j]] == vals[order[i]]:
                    j += 1
                mid = (i + 1 + j) / 2
                for k in range(i, j):
                    ranks[order[k]] = mid
                i = j
            return ranks

        xs = [x for _, x, _ in rows]
        ys = [y for _, _, y in rows]
        rx, ry = midranks(xs), midranks(ys)
        mx = sum(rx) / len(rx)
        my = sum(ry) / len(ry)
        num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        den = math.sqrt(
            sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
        )
        assert r.n == 300
        assert abs(r.rho - num / den) < 1e-5

    def test_spearman_monotone_is_one(self, spark):
        from kubenetmon_spark.operators.stats import spearman_rank_corr

        rows = [("g", i, i * i) for i in range(50)]  # monotone, nonlinear
        r = spearman_rank_corr(
            spark.createDataFrame(rows, ["grp", "x", "y"]), ["grp"], "x", "y"
        ).collect()[0]
        assert r.rho == 1.0

    def test_cramers_v_matches_python(self, spark):
        import math

        from kubenetmon_spark.operators.stats import cramers_v

        rng = random.Random(43)
        rows = [("g", rng.randrange(0, 4), rng.randrange(0, 5)) for _ in range(500)]
        df = spark.createDataFrame(rows, ["grp", "a", "b"])
        r = cramers_v(df, ["grp"], "a", "b").collect()[0]
        from collections import Counter

        cells = Counter((a, b) for _, a, b in rows)
        ra = Counter(a for _, a, _ in rows)
        cb = Counter(b for _, _, b in rows)
        n = len(rows)
        chi2 = sum(
            (o - ra[a] * cb[b] / n) ** 2 / (ra[a] * cb[b] / n)
            for (a, b), o in cells.items()
        ) + sum(
            ra[a] * cb[b] / n
            for a in ra
            for b in cb
            if (a, b) not in cells
        )
        v = math.sqrt(chi2 / (n * (min(len(ra), len(cb)) - 1)))
        assert r.n == n and r.ka == len(ra) and r.kb == len(cb)
        assert abs(r.v - v) < 1e-6

    def test_cramers_v_perfect_association(self, spark):
        from kubenetmon_spark.operators.stats import cramers_v

        rows = [("g", i % 3, i % 3) for i in range(90)]  # b determined by a
        r = cramers_v(
            spark.createDataFrame(rows, ["grp", "a", "b"]), ["grp"], "a", "b"
        ).collect()[0]
        assert abs(r.v - 1.0) < 1e-6

    def test_linear_regression_exact_line(self, spark):
        from kubenetmon_spark.operators.stats import simple_linear_regression

        rows = [("g", i, 5 * i - 40) for i in range(100)]
        r = simple_linear_regression(
            spark.createDataFrame(rows, ["grp", "x", "y"]), ["grp"], "x", "y"
        ).collect()[0]
        assert r.slope == 5.0 and r.intercept == -40.0
        const = [("c", 3, y) for y in range(10)]
        r2 = simple_linear_regression(
            spark.createDataFrame(const, ["grp", "x", "y"]), ["grp"], "x", "y"
        ).collect()[0]
        assert r2.slope is None  # constant x -> undefined slope

    def test_linear_regression_matches_python(self, spark):
        from kubenetmon_spark.operators.stats import simple_linear_regression

        rng = random.Random(47)
        rows = [("g", rng.randrange(0, 100), rng.randrange(-500, 500)) for _ in range(400)]
        r = simple_linear_regression(
            spark.createDataFrame(rows, ["grp", "x", "y"]), ["grp"], "x", "y"
        ).collect()[0]
        xs = [x for _, x, _ in rows]
        ys = [y for _, _, y in rows]
        n = len(rows)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        assert abs(r.slope - slope) < 1e-5
        assert abs(r.intercept - intercept) < 1e-4

    def test_skew_kurtosis_matches_python(self, spark):
        from kubenetmon_spark.operators.stats import skew_kurtosis

        rng = random.Random(53)
        rows = [("g", rng.randrange(1, 51)) for _ in range(500)]
        r = skew_kurtosis(
            spark.createDataFrame(rows, ["grp", "x"]), ["grp"], "x"
        ).collect()[0]
        xs = [x for _, x in rows]
        n = len(xs)
        m = sum(xs) / n
        m2 = sum((x - m) ** 2 for x in xs) / n
        m3 = sum((x - m) ** 3 for x in xs) / n
        m4 = sum((x - m) ** 4 for x in xs) / n
        assert abs(r.mean - m) < 1e-6
        assert abs(r.skew_pop - m3 / m2**1.5) < 1e-5
        assert abs(r.kurt_pop - m4 / m2**2) < 1e-5

    def test_skew_symmetric_is_zero(self, spark):
        from kubenetmon_spark.operators.stats import skew_kurtosis

        rows = [("g", x) for x in (-2, -1, -1, 0, 0, 0, 1, 1, 2)]
        r = skew_kurtosis(
            spark.createDataFrame(rows, ["grp", "x"]), ["grp"], "x"
        ).collect()[0]
        assert r.skew_pop == 0.0


class TestBitmapAggregate:
    def test_matches_python_sets(self, spark):
        from kubenetmon_spark.operators.agg import bitmap_aggregate

        rng = random.Random(61)
        rows = [
            ("g", rng.randrange(0, 5), rng.randrange(0, 30))
            for _ in range(400)
        ]
        df = spark.createDataFrame(rows, ["grp", "s", "elem"])
        r = bitmap_aggregate(df, ["grp"], "s", "elem").collect()[0]
        sets = {}
        for _, s, e in rows:
            sets.setdefault(s, set()).add(e)
        bitmaps = list(sets.values())
        union = set().union(*bitmaps)
        inter = set.intersection(*bitmaps)
        xor = {e for e in union if sum(e in b for b in bitmaps) % 2 == 1}
        assert r.n_sets == len(bitmaps)
        assert r.or_card == len(union)
        assert r.and_card == len(inter)
        assert r.xor_card == len(xor)

    def test_single_set_all_equal(self, spark):
        from kubenetmon_spark.operators.agg import bitmap_aggregate

        rows = [("g", 1, e) for e in range(10)] * 3  # duplicates collapse
        r = bitmap_aggregate(
            spark.createDataFrame(rows, ["grp", "s", "elem"]), ["grp"], "s", "elem"
        ).collect()[0]
        assert (r.n_sets, r.and_card, r.or_card, r.xor_card) == (1, 10, 10, 10)

    def test_null_group_key_survives(self, spark):
        # Regression: the join-back on group cols used plain equality,
        # so the NULL group's cardinalities silently vanished.
        from kubenetmon_spark.operators.agg import bitmap_aggregate

        rows = [(None, 1, 1), (None, 1, 2), (None, 2, 2), ("g", 1, 9)]
        df = spark.createDataFrame(rows, "grp string, s int, elem int")
        got = {
            r.grp: (r.n_sets, r.and_card, r.or_card, r.xor_card)
            for r in bitmap_aggregate(df, ["grp"], "s", "elem").collect()
        }
        assert got[None] == (2, 1, 2, 1)
        assert got["g"] == (1, 1, 1, 1)


class TestMaxIntersections:
    def test_matches_python_sweep(self, spark):
        from kubenetmon_spark.operators.timeseries import max_intersections

        rng = random.Random(67)
        ivs = []
        for i in range(200):
            s = rng.randrange(0, 500)
            ivs.append(("u", s, s + rng.randrange(1, 60), i))
        df = spark.createDataFrame(ivs, ["u", "s", "e", "id"])
        r = max_intersections(df, ["u"], "s", "e", "id").collect()[0]
        # brute force: depth at every start point (max occurs at a start)
        best, pos = 0, None
        for p in sorted({s for _, s, _, _ in ivs}):
            depth = sum(1 for _, s, e, _ in ivs if s <= p < e)
            if depth > best:
                best, pos = depth, p
        assert r.max_intersections == best
        assert r.position == pos

    def test_half_open_no_touch_overlap(self, spark):
        from kubenetmon_spark.operators.timeseries import max_intersections

        ivs = [("u", 0, 10, 0), ("u", 10, 20, 1)]  # [0,10) and [10,20) don't overlap
        r = max_intersections(
            spark.createDataFrame(ivs, ["u", "s", "e", "id"]), ["u"], "s", "e", "id"
        ).collect()[0]
        assert r.max_intersections == 1 and r.position == 0


class TestAssociationFamily:
    def _contingency(self, seed, n=500):
        rng = random.Random(seed)
        return [("g", rng.randrange(0, 4), rng.randrange(0, 5)) for _ in range(n)]

    def test_theils_u_matches_python(self, spark):
        import math
        from collections import Counter

        from kubenetmon_spark.operators.stats import association_measures

        rows = self._contingency(71)
        df = spark.createDataFrame(rows, ["grp", "a", "b"])
        r = association_measures(df, ["grp"], "a", "b").collect()[0]
        n = len(rows)
        ca = Counter(a for _, a, _ in rows)
        cb = Counter(b for _, _, b in rows)
        cab = Counter((a, b) for _, a, b in rows)

        def h(counter):
            return -sum(c / n * math.log2(c / n) for c in counter.values())

        mi = h(ca) + h(cb) - h(cab)
        assert abs(r.theils_u - mi / h(ca)) < 1e-5

    def test_theils_u_deterministic_relation(self, spark):
        from kubenetmon_spark.operators.stats import association_measures

        rows = [("g", i % 4, (i % 4) * 2) for i in range(200)]  # b = f(a)
        r = association_measures(
            spark.createDataFrame(rows, ["grp", "a", "b"]), ["grp"], "a", "b"
        ).collect()[0]
        # knowing b fully determines a -> U(a|b) = 1
        assert abs(r.theils_u - 1.0) < 1e-6
        assert abs(r.cramers_v_corr - 1.0) < 1e-2  # bias correction shrinks

    def test_contingency_coef_matches_python(self, spark):
        import math
        from collections import Counter

        from kubenetmon_spark.operators.stats import association_measures

        rows = self._contingency(73)
        r = association_measures(
            spark.createDataFrame(rows, ["grp", "a", "b"]), ["grp"], "a", "b"
        ).collect()[0]
        n = len(rows)
        ca = Counter(a for _, a, _ in rows)
        cb = Counter(b for _, _, b in rows)
        cab = Counter((a, b) for _, a, b in rows)
        chi2 = sum(
            (cab.get((a, b), 0) - ca[a] * cb[b] / n) ** 2 / (ca[a] * cb[b] / n)
            for a in ca
            for b in cb
        )
        assert abs(r.contingency_coef - math.sqrt(chi2 / (chi2 + n))) < 1e-5

    def test_student_t_matches_python(self, spark):
        import math

        from kubenetmon_spark.operators.stats import student_t_test

        rng = random.Random(79)
        rows = [
            ("g", "a" if i % 2 else "b", rng.randrange(-500, 500))
            for i in range(400)
        ]
        r = student_t_test(
            spark.createDataFrame(rows, ["grp", "variant", "x"]),
            ["grp"], "x", "variant", "a", "b",
        ).collect()[0]
        xa = [x for _, v, x in rows if v == "a"]
        xb = [x for _, v, x in rows if v == "b"]
        na, nb = len(xa), len(xb)
        ma, mb = sum(xa) / na, sum(xb) / nb
        ssa = sum((x - ma) ** 2 for x in xa)
        ssb = sum((x - mb) ** 2 for x in xb)
        sp2 = (ssa + ssb) / (na + nb - 2)
        t = (ma - mb) / math.sqrt(sp2 * (1 / na + 1 / nb))
        assert abs(r.t_stat - t) < 1e-5

    def test_covariance_matches_python(self, spark):
        from kubenetmon_spark.operators.stats import covariance_exact

        rng = random.Random(83)
        rows = [("g", rng.randrange(-100, 100), rng.randrange(0, 50)) for _ in range(300)]
        r = covariance_exact(
            spark.createDataFrame(rows, ["grp", "x", "y"]), ["grp"], "x", "y"
        ).collect()[0]
        xs = [x for _, x, _ in rows]
        ys = [y for _, _, y in rows]
        n = len(rows)
        mx, my = sum(xs) / n, sum(ys) / n
        cp = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / n
        cs = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / (n - 1)
        assert abs(r.covar_pop - cp) < 1e-5
        assert abs(r.covar_samp - cs) < 1e-5


class TestVarianceAndQuantiles:
    def test_variance_matches_python(self, spark):
        import math

        from kubenetmon_spark.operators.stats import variance_exact

        rng = random.Random(97)
        rows = [("g", rng.randrange(-300, 300)) for _ in range(400)]
        r = variance_exact(
            spark.createDataFrame(rows, ["grp", "x"]), ["grp"], "x"
        ).collect()[0]
        xs = [x for _, x in rows]
        n = len(xs)
        m = sum(xs) / n
        vp = sum((x - m) ** 2 for x in xs) / n
        vs = sum((x - m) ** 2 for x in xs) / (n - 1)
        assert abs(r.var_pop - vp) < 1e-5
        assert abs(r.var_samp - vs) < 1e-5
        assert abs(r.stddev_pop - math.sqrt(vp)) < 1e-5
        assert abs(r.stddev_samp - math.sqrt(vs)) < 1e-5

    def test_quantiles_match_python(self, spark):
        import math

        from kubenetmon_spark.operators.stats import quantile_definitions

        rng = random.Random(101)
        rows = [("g", rng.randrange(0, 1000)) for _ in range(257)]
        r = quantile_definitions(
            spark.createDataFrame(rows, ["grp", "x"]), ["grp"], "x", (0.5, 0.9)
        ).collect()[0]
        xs = sorted(x for _, x in rows)
        n = len(xs)
        for p, tag in [(0.5, "50"), (0.9, "90")]:
            h = p * (n - 1)
            lo, hi = xs[math.floor(h)], xs[math.ceil(h)]
            inc = lo + (h - math.floor(h)) * (hi - lo)
            assert r[f"p{tag}_low"] == lo
            assert r[f"p{tag}_high"] == hi
            assert abs(r[f"p{tag}_inc"] - inc) < 1e-5

    def test_quantiles_small_group_edges(self, spark):
        from kubenetmon_spark.operators.stats import quantile_definitions

        rows = [("g", v) for v in (10, 20)]  # n=2: median interpolates
        r = quantile_definitions(
            spark.createDataFrame(rows, ["grp", "x"]), ["grp"], "x", (0.5,)
        ).collect()[0]
        assert r.p50_low == 10 and r.p50_high == 20 and r.p50_inc == 15.0
        one = [("s", 7)]
        r1 = quantile_definitions(
            spark.createDataFrame(one, ["grp", "x"]), ["grp"], "x", (0.5, 0.9)
        ).collect()[0]
        assert r1.p50_low == 7 and r1.p90_high == 7 and r1.p90_inc == 7.0


class TestQuantileTiming:
    def test_bucket_map_and_quantiles(self, spark):
        from kubenetmon_spark.operators.agg import quantile_timing

        # values spanning the three bands, plus a negative (clamps to 0)
        vals = [-5, 0, 1, 1023, 1024, 1039, 1040, 29999, 30000, 30001,
                99999, 500, 500, 500]
        df = spark.createDataFrame([("g", v) for v in vals], ["k", "v"])
        row = quantile_timing(df, ["k"], "v", [0, 50, 100]).collect()[0]

        def bucket(v):
            v = max(v, 0)
            if v < 1024:
                return v
            if v <= 30000:
                return v - v % 16
            return 30000

        mapped = sorted(bucket(v) for v in vals)
        n = len(mapped)

        def q(p):
            # smallest value whose cumulative count reaches p% of total
            need = p * n
            cum = 0
            for i, m in enumerate(mapped):
                cum += 100
                if cum * n >= need * n and 100 * (i + 1) >= p * n:
                    return m
            return mapped[-1]

        assert row.p0 == mapped[0]
        assert row.p100 == mapped[-1]
        # p50: lower-bound rule — cumw*100 >= 50*totw
        cum = 0
        want = None
        for m in mapped:
            cum += 1
            if cum * 100 >= 50 * n:
                want = m
                break
        assert row.p50 == want

    def test_bands_are_exact_vs_bucketed(self, spark):
        from kubenetmon_spark.operators.agg import timing_bucket
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(v,) for v in [500, 1025, 1039, 30010]], ["v"]
        )
        got = [
            r.b
            for r in df.select(timing_bucket(F.col("v")).alias("b"))
            .orderBy("v")
            .collect()
        ]
        assert got == [500, 1024, 1024, 30000]


class TestGroupArraySample:
    def test_deterministic_and_k_bounded(self, spark):
        import hashlib

        from kubenetmon_spark.operators.agg import group_array_sample

        rows = [("g", v) for v in range(40)] + [("h", v) for v in range(3)]
        df = spark.createDataFrame(rows * 2, ["k", "v"])  # dups collapse
        out = {
            r.k: r.sample
            for r in group_array_sample(df, ["k"], "v", 5).collect()
        }
        # reference: md5 rank over distinct values, take 5, sort
        def ref(vals, k):
            ranked = sorted(
                vals,
                key=lambda v: (hashlib.md5(f"{v}|s0".encode()).hexdigest(), v),
            )
            return sorted(ranked[:k])

        assert out["g"] == ref(range(40), 5)
        assert out["h"] == ref(range(3), 5)  # fewer than k -> all
        # rerun: identical draw
        out2 = {
            r.k: r.sample
            for r in group_array_sample(df, ["k"], "v", 5).collect()
        }
        assert out == out2

    def test_null_values_never_occupy_slots(self, spark):
        # Regression: a NULL value won a rank slot then vanished from
        # collect_list, shrinking the sample below k.
        from kubenetmon_spark.operators.agg import group_array_sample

        rows = [("g", v) for v in range(10)] + [("g", None)] * 5
        df = spark.createDataFrame(rows, "k string, v int")
        got = group_array_sample(df, ["k"], "v", 10).collect()[0].sample
        assert len(got) == 10 and None not in got


class TestCorrMatrix:
    def test_matches_numpy(self, spark):
        import numpy as np

        from kubenetmon_spark.operators.stats import corr_matrix

        rng = np.random.RandomState(3)
        x0 = rng.randint(0, 1000, 200)
        x1 = (x0 * 2 + rng.randint(0, 300, 200))  # correlated
        x2 = rng.randint(0, 1000, 200)            # independent
        rows = [("g", int(a), int(b), int(c)) for a, b, c in zip(x0, x1, x2)]
        df = spark.createDataFrame(rows, ["k", "x0", "x1", "x2"])
        got = {
            (r.i, r.j): r.corr
            for r in corr_matrix(df, ["k"], ["x0", "x1", "x2"]).collect()
        }
        m = np.corrcoef(np.vstack([x0, x1, x2]))
        for i in range(3):
            for j in range(i, 3):
                assert abs(got[(i, j)] - m[i, j]) < 2e-6, (i, j)
        assert got[(0, 0)] == 1.0
        assert got[(0, 1)] > 0.9

    def test_constant_column_yields_null(self, spark):
        from kubenetmon_spark.operators.stats import corr_matrix

        df = spark.createDataFrame(
            [("g", 1, 5), ("g", 2, 5), ("g", 3, 5)], ["k", "a", "b"]
        )
        got = {
            (r.i, r.j): r.corr
            for r in corr_matrix(df, ["k"], ["a", "b"]).collect()
        }
        assert got[(0, 1)] is None and got[(1, 1)] is None
        assert got[(0, 0)] == 1.0


class TestSparkbar:
    def test_rendering_matches_reference(self, spark):
        from kubenetmon_spark.operators.agg import sparkbar

        rows = (
            [("g", 0, 1)] * 1          # bucket 0 small
            + [("g", 5, 7)]            # mid bucket, max value
            + [("g", 9, 3)]            # last bucket, mid value
        )
        df = spark.createDataFrame(rows, ["k", "x", "y"])
        got = sparkbar(df, ["k"], "x", "y", width=5).collect()[0].sparkbar
        # span = 10; buckets of 2: x=0->0, x=5->2, x=9->4
        # maxy=7: levels 1+(1*7)//7=2? no: 1+(1*7)//7 = 2 -> '▂';
        # y=7 -> 1+49//7=8 -> '█'; y=3 -> 1+21//7=4 -> '▄'
        assert got == "▂ █ ▄"
        assert len(got) == 5

    def test_single_x_value(self, spark):
        from kubenetmon_spark.operators.agg import sparkbar

        df = spark.createDataFrame([("g", 4, 5), ("g", 4, 5)], ["k", "x", "y"])
        got = sparkbar(df, ["k"], "x", "y", width=3).collect()[0].sparkbar
        assert got == "█  "  # all mass in bucket 0, rest empty

    def test_null_group_key_survives(self, spark):
        from kubenetmon_spark.operators.agg import sparkbar

        df = spark.createDataFrame(
            [(None, 0, 1), (None, 1, 7), ("g", 0, 3)],
            "k string, x int, y int",
        )
        got = {r.k: r.sparkbar for r in sparkbar(df, ["k"], "x", "y", width=2).collect()}
        assert set(got) == {None, "g"}
        assert got[None] == "▂█"


class TestMeanZTest:
    def test_matches_scipy_style_formula(self, spark):
        import math

        from kubenetmon_spark.operators.stats import mean_z_test

        xs = [100, 120, 130, 90, 110]
        ys = [80, 95, 105]
        rows = [("g", "x", v) for v in xs] + [("g", "y", v) for v in ys]
        df = spark.createDataFrame(rows, ["k", "side", "v"])
        got = mean_z_test(df, ["k"], "v", "side", 400, 250).collect()[0]
        want = (sum(xs) / len(xs) - sum(ys) / len(ys)) / math.sqrt(
            400 / len(xs) + 250 / len(ys)
        )
        assert got.nx == 5 and got.ny == 3
        assert abs(got.z - round(want, 6)) < 1e-9


class TestExactAuc:
    def test_matches_sklearn_style_reference(self, spark):
        from kubenetmon_spark.operators.stats import exact_auc

        # hand-checkable: scores with ties across both classes
        rows = [("g", s, l) for s, l in
                [(10, 1), (8, 1), (8, 0), (5, 0), (5, 1), (1, 0)]]
        df = spark.createDataFrame(rows, ["k", "score", "label"])
        got = exact_auc(df, ["k"], "score", "label").collect()[0]

        def ref_auc(pairs):
            pos = [s for s, l in pairs if l == 1]
            neg = [s for s, l in pairs if l == 0]
            total = 0.0
            for p in pos:
                for n in neg:
                    total += 1.0 if p > n else (0.5 if p == n else 0.0)
            return total / (len(pos) * len(neg))

        want = ref_auc([(s, l) for _, s, l in rows])
        assert got.n_pos == 3 and got.n_neg == 3
        assert abs(got.auc - round(want, 6)) < 1e-9

    def test_perfect_and_random(self, spark):
        from kubenetmon_spark.operators.stats import exact_auc

        perfect = [("g", s, 1 if s >= 50 else 0) for s in range(100)]
        df = spark.createDataFrame(perfect, ["k", "score", "label"])
        assert exact_auc(df, ["k"], "score", "label").collect()[0].auc == 1.0
        const = [("g", 7, l) for l in [0, 1] * 20]
        df2 = spark.createDataFrame(const, ["k", "score", "label"])
        assert exact_auc(df2, ["k"], "score", "label").collect()[0].auc == 0.5


class TestMapAggregateMany:
    def test_matches_single_how(self, spark):
        from kubenetmon_spark.operators.agg import (
            map_aggregate,
            map_aggregate_many,
        )

        rows = [
            (1, {"a": 3, "b": 1}),
            (1, {"a": 5}),
            (2, {"c": 7, "a": 2}),
        ]
        df = spark.createDataFrame(rows, "g int, m map<string,bigint>")
        many = {
            r.g: r
            for r in map_aggregate_many(
                df, "m", ["g"], ["min", "max", "sum"]
            ).collect()
        }
        for how in ["min", "max", "sum"]:
            single = {
                r.g: r
                for r in map_aggregate(df, "m", ["g"], how=how).collect()
            }
            for g in (1, 2):
                assert single[g][f"{how}_map"] == many[g][f"{how}_map"]
        assert many[1].min_map == {"a": 3, "b": 1}
        assert many[1].max_map == {"a": 5, "b": 1}
        assert many[1].sum_map == {"a": 8, "b": 1}

    def test_rejects_bad_how(self, spark):
        import pytest

        from kubenetmon_spark.operators.agg import map_aggregate_many

        df = spark.createDataFrame([(1, {"a": 1})], "g int, m map<string,bigint>")
        with pytest.raises(ValueError):
            map_aggregate_many(df, "m", ["g"], ["avg"])
        with pytest.raises(ValueError):
            map_aggregate_many(df, "m", ["g"], [])


class TestOls2Exact:
    def test_exact_plane_recovered(self, spark):
        from kubenetmon_spark.operators.stats import ols2_exact

        # y = 3 + 2*x1 - 5*x2, no noise -> betas are exact rationals
        rows = [
            ("g", x1, x2, 3 + 2 * x1 - 5 * x2)
            for x1 in range(6)
            for x2 in range(5)
        ]
        df = spark.createDataFrame(rows, ["g", "x1", "x2", "y"])
        r = ols2_exact(df, ["g"], "x1", "x2", "y").collect()[0]
        det = int(r.det)
        assert det > 0
        assert int(r.b1_num) == 2 * det
        assert int(r.b2_num) == -5 * det
        assert int(r.b0_num) == 3 * int(r.b0_den)
        assert (r.b1, r.b2, r.b0) == (2.0, -5.0, 3.0)

    def test_collinear_features_null_betas(self, spark):
        from kubenetmon_spark.operators.stats import ols2_exact

        rows = [("g", x, 2 * x, x + 1) for x in range(8)]
        df = spark.createDataFrame(rows, ["g", "x1", "x2", "y"])
        r = ols2_exact(df, ["g"], "x1", "x2", "y").collect()[0]
        assert int(r.det) == 0
        assert r.b1 is None and r.b2 is None and r.b0 is None


class TestWinsorize:
    def test_bounds_and_clamping(self, spark):
        from kubenetmon_spark.operators.stats import winsorize

        rows = [("g", v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 100]]
        df = spark.createDataFrame(rows, ["g", "x"])
        out = winsorize(df, ["g"], "x", 0.1, 0.9)
        got = sorted(r.x_wins for r in out.collect())
        # p10 low = value at floor(.1*9)=0 -> 1; p90 low = floor(.9*9)=8 -> 9
        assert got == [1, 2, 3, 4, 5, 6, 7, 8, 9, 9]
        # untouched original column still present
        assert {r.x for r in out.collect()} == {1, 2, 3, 4, 5, 6, 7, 8, 9, 100}

    def test_groups_independent(self, spark):
        from kubenetmon_spark.operators.stats import winsorize

        rows = [("a", v) for v in range(1, 11)] + [("b", v * 100) for v in range(1, 11)]
        df = spark.createDataFrame(rows, ["g", "x"])
        out = winsorize(df, ["g"], "x", 0.1, 0.9)
        per = {}
        for r in out.collect():
            per.setdefault(r.g, []).append(r.x_wins)
        assert max(per["a"]) == 9 and max(per["b"]) == 900


class TestCalibrationBins:
    def test_bins_against_python(self, spark):
        from kubenetmon_spark.operators.stats import calibration_bins

        rows = [(s, 1 if s >= 6000 else 0) for s in range(0, 10000, 173)]
        df = spark.createDataFrame(rows, ["score", "y"])
        got = {r.bin: r for r in calibration_bins(df, "score", "y").collect()}
        import math
        from collections import defaultdict

        bins = defaultdict(lambda: [0, 0, 0])
        for s, y in rows:
            b = min(s * 10 // 10000, 9)
            bins[b][0] += 1
            bins[b][1] += y
            bins[b][2] += s
        for b, (n, npos, ssum) in bins.items():
            assert got[b].n == n and got[b].n_pos == npos
            assert got[b].pos_rate_bp == npos * 10000 // n
            assert got[b].mean_score_bp == math.floor(ssum * 10000 / (n * 10000))
        # perfect separation: low bins 0% positive, high bins 100%
        assert got[0].pos_rate_bp == 0 and got[9].pos_rate_bp == 10000

    def test_top_edge_closed(self, spark):
        from kubenetmon_spark.operators.stats import calibration_bins

        df = spark.createDataFrame([(10000, 1)], ["score", "y"])
        r = calibration_bins(df, "score", "y").collect()[0]
        assert r.bin == 9  # score == scale lands in the last bin


class TestCohensKappa:
    def test_against_sklearn_formula(self, spark):
        from kubenetmon_spark.operators.stats import cohens_kappa

        rows = [
            ("x", "x")] * 20 + [("y", "y")] * 15 + [("x", "y")] * 5 + [
            ("y", "x")] * 10
        df = spark.createDataFrame(rows, ["a", "b"])
        r = cohens_kappa(df, "a", "b").collect()[0]
        n = 50
        po = 35 / n
        pe = (25 / n) * (30 / n) + (25 / n) * (20 / n)
        kappa = (po - pe) / (1 - pe)
        assert r.n == 50 and r.s_diag == 35
        assert abs(r.kappa_num / r.kappa_den - kappa) < 1e-12
        from fractions import Fraction

        exact = Fraction(r.kappa_num, r.kappa_den)
        assert exact == Fraction(
            Fraction(35, 50) - (Fraction(25 * 30 + 25 * 20, 2500)),
            1 - Fraction(25 * 30 + 25 * 20, 2500),
        )
        assert r.kappa_bp == (exact * 10000).__floor__()

    def test_perfect_and_chance(self, spark):
        from kubenetmon_spark.operators.stats import cohens_kappa

        same = spark.createDataFrame(
            [(str(i % 3), str(i % 3)) for i in range(30)], ["a", "b"]
        )
        r = cohens_kappa(same, "a", "b").collect()[0]
        assert r.kappa_num == r.kappa_den and r.kappa_bp == 10000
        # independent raters hover near zero (exact value data-driven)
        ind = spark.createDataFrame(
            [(str(i % 2), str((i // 2) % 2)) for i in range(40)],
            ["a", "b"],
        )
        r2 = cohens_kappa(ind, "a", "b").collect()[0]
        assert abs(r2.kappa_bp) < 1500


class TestLogisticRegressionGd:
    def test_learns_separable_data(self, spark):
        from kubenetmon_spark.operators.stats import logistic_regression_gd

        # y = 1 iff x1 >= 3: weights must separate with positive w1
        rows = [(x1, x2, 1 if x1 >= 3 else 0)
                for x1 in range(6) for x2 in range(3) for _ in range(5)]
        df = spark.createDataFrame(rows, ["x1", "x2", "y"])
        w = logistic_regression_gd(df, ["x1", "x2"], "y", iterations=20)
        assert w[1] > 0            # x1 drives the label
        assert abs(w[2]) < w[1]    # x2 is noise
        # decision at the boundary: score(x1=5) > 0 > score(x1=0)
        assert w[0] + 5 * w[1] > 0 > w[0] + 0 * w[1]

    def test_partitioning_invariant(self, spark):
        from kubenetmon_spark.operators.stats import logistic_regression_gd

        rows = [((i * 7) % 5, (i * 3) % 4, (i % 3) % 2) for i in range(200)]
        df = spark.createDataFrame(rows, ["x1", "x2", "y"])
        a = logistic_regression_gd(df, ["x1", "x2"], "y", iterations=5)
        b = logistic_regression_gd(
            df.repartition(13), ["x1", "x2"], "y", iterations=5
        )
        assert a == b


class TestKaplanMeier:
    def test_textbook_example(self, spark):
        import math

        from kubenetmon_spark.operators.stats import kaplan_meier

        # classic toy: durations (event=1 observed, 0 censored)
        rows = [
            ("g", 6, 1), ("g", 6, 1), ("g", 6, 0), ("g", 7, 1),
            ("g", 9, 0), ("g", 10, 1), ("g", 13, 1),
        ]
        df = spark.createDataFrame(rows, ["g", "dur", "ev"])
        got = {r.duration: r for r in kaplan_meier(df, ["g"], "dur", "ev").collect()}
        # step 6: n=7, d=2 -> S = 5/7
        assert (got[6].n_risk, got[6].d_events) == (7, 2)
        s = 1.0
        expect_log = 0
        for t in sorted(got):
            r = got[t]
            if r.d_events < r.n_risk:
                expect_log += round(
                    math.log(1 - r.d_events / r.n_risk) * 1e6
                )
            else:  # everyone at risk dies: survival hits exactly 0
                expect_log += -(10 ** 12)
            assert r.s_log_micro == expect_log, t
        # survival after step 6 close to 5/7
        assert abs(got[6].survival - 5 / 7) < 1e-5

    def test_all_die_hits_zero(self, spark):
        from kubenetmon_spark.operators.stats import kaplan_meier

        df = spark.createDataFrame(
            [("g", 1, 1), ("g", 1, 1)], ["g", "dur", "ev"]
        )
        r = kaplan_meier(df, ["g"], "dur", "ev").collect()[0]
        assert r.s_log_micro <= -(10 ** 11) and r.survival < 1e-40


class TestMinSampleSizes:
    def test_against_hand_formula(self, spark):
        import math

        from kubenetmon_spark.operators.stats import (
            Z_ALPHA_2,
            Z_POWER,
            min_sample_sizes,
        )

        # p1 = 0.25 (50 of 200), values with known mean/variance
        rows = [("g", 100 + (i % 21), 1 if i % 4 == 0 else 0) for i in range(200)]
        df = spark.createDataFrame(rows, ["g", "x", "s"])
        r = min_sample_sizes(df, ["g"], "x", "s").collect()[0]
        p1, mde = 0.25, 0.02
        p2 = p1 - mde
        pbar = (p1 + p2) / 2
        conv = (
            Z_ALPHA_2 * math.sqrt(2 * pbar * (1 - pbar))
            + Z_POWER * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
        ) / mde
        assert r.n_conversion == math.ceil(conv * conv)
        xs = [100 + (i % 21) for i in range(200)]
        mean = sum(xs) / 200
        var = (sum(x * x for x in xs) - sum(xs) ** 2 / 200) / 199
        cont = 2 * (Z_ALPHA_2 + Z_POWER) ** 2 * var / ((0.01 * mean) ** 2)
        assert abs(r.n_continuous - math.ceil(cont)) <= 1
        assert r.n == 200 and r.npos == 50

    def test_degenerate_groups_null(self, spark):
        from kubenetmon_spark.operators.stats import min_sample_sizes

        # p1 = 0.01 < mde -> conversion null; constant x -> continuous null
        rows = [("g", 5, 1 if i == 0 else 0) for i in range(100)]
        df = spark.createDataFrame(rows, ["g", "x", "s"])
        r = min_sample_sizes(df, ["g"], "x", "s").collect()[0]
        assert r.n_conversion is None and r.n_continuous is None

    def test_fractional_values_not_rounded(self, spark):
        """A DOUBLE value column must not ride the integral
        decimal(19,0) Σx² path — that rounds each value to an integer
        and corrupts the variance (r6 advisor catch). Values 0.25 apart
        would all round to 0/1, collapsing the variance entirely."""
        import math

        from kubenetmon_spark.operators.stats import (
            Z_ALPHA_2,
            Z_POWER,
            min_sample_sizes,
        )

        xs = [0.25 * (i % 8) for i in range(160)]
        rows = [("g", float(x), 0) for x in xs]
        df = spark.createDataFrame(rows, "g string, x double, s int")
        r = min_sample_sizes(df, ["g"], "x", "s").collect()[0]
        n = len(xs)
        mean = sum(xs) / n
        var = (sum(x * x for x in xs) - sum(xs) ** 2 / n) / (n - 1)
        cont = 2 * (Z_ALPHA_2 + Z_POWER) ** 2 * var / ((0.01 * mean) ** 2)
        assert abs(r.n_continuous - math.ceil(cont)) <= 1


class TestInterpolateLinear:
    def _run(self, spark, rows):
        from kubenetmon_spark.operators.timeseries import interpolate_linear

        df = spark.createDataFrame(rows, "k string, x long, y long")
        out = interpolate_linear(df, ["k"], "x", "y")
        return {(r.k, r.x): r.y_filled for r in out.collect()}

    def test_anchors_gaps_and_edges(self, spark):
        got = self._run(spark, [
            ("a", 1, None),           # leading gap -> stays null
            ("a", 2, 0), ("a", 3, None), ("a", 4, None), ("a", 5, 10),
            ("a", 6, None),           # trailing gap -> stays null
            ("b", 1, 7),              # single anchor
        ])
        assert got[("a", 1)] is None and got[("a", 6)] is None
        assert got[("a", 2)] == 0 and got[("a", 5)] == 10
        assert got[("a", 3)] == 3 and got[("a", 4)] == 6  # floor(10i/3)
        assert got[("b", 1)] == 7

    def test_floor_toward_neg_infinity_on_descending(self, spark):
        # (ny-py) negative: floor, NOT truncation-toward-zero
        got = self._run(spark, [
            ("a", 0, 0), ("a", 1, None), ("a", 2, None), ("a", 3, -5),
        ])
        assert got[("a", 1)] == -2  # floor(-5/3) = -2, trunc would say -1
        assert got[("a", 2)] == -4  # floor(-10/3)

    def test_nonuniform_axis(self, spark):
        got = self._run(spark, [
            ("a", 10, 100), ("a", 13, None), ("a", 20, 200),
        ])
        assert got[("a", 13)] == 100 + (100 * 3) // 10


class TestAggForeach:
    def test_ragged_arrays_positionwise(self, spark):
        from kubenetmon_spark.operators.agg import agg_foreach

        df = spark.createDataFrame(
            [("a", [1, 2, 3]), ("a", [10, 20]), ("a", [100]), ("b", [])],
            "g string, arr array<long>",
        )
        out = {r.g: (r.sums, r.counts) for r in agg_foreach(df, ["g"], "arr").collect()}
        # ClickHouse rule: each position counts rows that reach it
        assert out["a"] == ([111, 22, 3], [3, 2, 1])
        assert "b" not in out  # empty arrays contribute no positions

    def test_value_transform(self, spark):
        from pyspark.sql import functions as F

        from kubenetmon_spark.operators.agg import agg_foreach

        df = spark.createDataFrame(
            [("a", [1.04, 2.06]), ("a", [0.5, 0.5])], "g string, arr array<double>"
        )
        r = agg_foreach(
            df, ["g"], "arr",
            value=F.expr("cast(floor(col * 10 + 0.5) as bigint)"),
        ).collect()[0]
        assert r.sums == [10 + 5, 21 + 5] and r.counts == [2, 2]


class TestPromqlGrid:
    def _run(self, spark, rows, **kw):
        from kubenetmon_spark.operators.timeseries import promql_to_grid

        df = spark.createDataFrame(rows, "k string, ts_s long, v long")
        out = promql_to_grid(df, ["k"], "ts_s", "v", **kw)
        return {
            (r.k, r.bucket_ts): r for r in out.collect()
        }

    def test_counter_with_reset_hand_computed(self, spark):
        rows = [("a", 10, 5), ("a", 20, 8), ("a", 30, 2), ("a", 40, 4)]
        got = self._run(
            spark, rows, start_s=0, n_buckets=6, step_s=10, window_s=25
        )
        assert ("a", 0) not in got  # empty window -> no row
        r10 = got[("a", 10)]
        assert (r10.n_samples, r10.last_v) == (1, 5)
        assert r10.delta is None and r10.increase is None
        assert r10.rate_bp is None and r10.irate_bp is None
        r20 = got[("a", 20)]
        assert (r20.delta, r20.increase) == (3, 3)
        assert (r20.rate_bp, r20.irate_bp) == (3000, 3000)
        r30 = got[("a", 30)]  # reset 8->2 counts from 0
        assert (r30.last_v, r30.delta, r30.increase) == (2, -3, 5)
        assert (r30.rate_bp, r30.irate_bp) == (2500, 2000)
        r40 = got[("a", 40)]  # window (15,40]: first=8, reset inside
        assert (r40.delta, r40.increase, r40.rate_bp) == (-4, 4, 2000)
        r50 = got[("a", 50)]  # window (25,50]: {30,40} only
        assert (r50.n_samples, r50.delta, r50.increase) == (2, 2, 2)

    def test_grid_clamps_and_keys_are_independent(self, spark):
        rows = [
            ("a", -100, 1), ("a", 5, 2), ("a", 999, 3),  # outside grid
            ("b", 5, 7), ("b", 15, 9),
        ]
        got = self._run(
            spark, rows, start_s=0, n_buckets=2, step_s=10, window_s=10
        )
        # ts=5 covers only t=10 (window (0,10]); t=0's window (-10,0]
        # is empty; -100 and 999 never leak into the 2-point grid
        assert set(got) == {("a", 10), ("b", 10)}
        # b's ts=15 covers only t in [15,24] — beyond the 2-point grid
        assert got[("b", 10)].n_samples == 1
        assert got[("b", 10)].increase is None
        assert got[("a", 10)].n_samples == 1

    def test_empty_input(self, spark):
        from kubenetmon_spark.operators.timeseries import promql_to_grid

        df = spark.createDataFrame([], "k string, ts_s long, v long")
        out = promql_to_grid(
            df, ["k"], "ts_s", "v",
            start_s=0, n_buckets=4, step_s=10, window_s=20,
        )
        assert out.count() == 0

    def test_differential_vs_python_spec(self, spark):
        import random

        rng = random.Random(77)
        rows = []
        for k in ("a", "b", "c"):
            ts = sorted(rng.sample(range(0, 500), 40))
            cum = 0
            for t in ts:
                cum = (cum + rng.randint(0, 50)) % 300  # forced resets
                rows.append((k, t, cum))
        start, n, step, win = 0, 12, 40, 100
        got = self._run(
            spark, rows,
            start_s=start, n_buckets=n, step_s=step, window_s=win,
        )

        by_key = {}
        for k, t, v in rows:
            by_key.setdefault(k, []).append((t, v))
        import math

        for k, series in by_key.items():
            series.sort()
            for i in range(n):
                t = start + i * step
                inw = [(ts, v) for ts, v in series if t - win < ts <= t]
                if not inw:
                    assert (k, t) not in got
                    continue
                r = got[(k, t)]
                assert r.n_samples == len(inw)
                assert r.last_v == inw[-1][1]
                if len(inw) >= 2:
                    resets = sum(
                        pv
                        for (pts, pv), (ts, v) in zip(inw, inw[1:])
                        if v < pv
                    )
                    inc = inw[-1][1] - inw[0][1] + resets
                    assert r.delta == inw[-1][1] - inw[0][1]
                    assert r.increase == inc
                    assert r.rate_bp == math.floor(
                        inc * 10000 / (inw[-1][0] - inw[0][0])
                    )
                    (pts, pv), (lts, lv) = inw[-2], inw[-1]
                    pinc = lv - pv if lv >= pv else lv
                    assert r.irate_bp == math.floor(
                        pinc * 10000 / (lts - pts)
                    )
                else:
                    assert r.delta is None and r.increase is None


class TestAggResample:
    def test_buckets_fill_and_drop(self, spark):
        from kubenetmon_spark.operators.agg import agg_resample

        df = spark.createDataFrame(
            [
                ("g", 1, 10), ("g", 2, 20),   # bucket 0 (keys 1-3)
                ("g", 5, 5),                  # bucket 1 (keys 4-6)
                ("g", 12, 99),                # >= end: dropped
                ("g", 0, 99),                 # < start: dropped
                ("h", 7, 1),                  # bucket 2 (keys 7-9)
            ],
            "k string, key int, v int",
        )
        out = {
            r.k: r
            for r in agg_resample(
                df, ["k"], "v", "key", start=1, end=12, step=3
            ).collect()
        }
        # ceil((12-1)/3) = 4 buckets
        assert out["g"].sums == [30, 5, 0, 0]
        assert out["g"].counts == [2, 1, 0, 0]
        assert out["h"].sums == [0, 0, 1, 0]
        assert out["h"].counts == [0, 0, 1, 0]

    def test_validation(self, spark):
        from kubenetmon_spark.operators.agg import agg_resample

        with pytest.raises(ValueError):
            agg_resample(None, ["k"], "v", "key", start=5, end=5, step=1)
        with pytest.raises(ValueError):
            agg_resample(None, ["k"], "v", "key", start=0, end=5, step=0)
