"""ClickHouse-compatible SQL function surface.

A ClickHouse/kubenetmon user lives in SQL (reference README.md:180-185
queries the flow table with ``formatReadableSize``, ``today()``, interval
arithmetic). This module registers that vocabulary as **Spark SQL UDFs**
(``CREATE OR REPLACE TEMPORARY FUNCTION ... RETURN <expr>``) — declarative
function bodies that Catalyst inlines into the caller's plan, so every one
of these stays inside whole-stage codegen: zero Python, zero UDF call
overhead, full predicate pushdown through the function body.

Names follow ClickHouse (camelCase); semantic deviations are documented
per function. Registration is idempotent (OR REPLACE) and session-scoped
(TEMPORARY — no catalog pollution).

Caveat on hashes: ``cityHash64`` here is Spark's xxhash64 — a stable,
splittable 64-bit hash with the same USES (sampling, bucketing, shard
keys) but different VALUES than ClickHouse's CityHash; anything persisted
by hash value must be re-derived on migration.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# U+2588 full block, then the ascending eighth blocks U+258F..U+2589.
_FULL = "█"
_EIGHTHS = "▏▎▍▌▋▊▉█"

def _size_case() -> str:
    arms = []
    units = ["B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB"]
    for p in range(6, 0, -1):
        denom = f"CAST(pow(CAST(1024 AS DOUBLE), {p}) AS DOUBLE)"
        arms.append(
            f"WHEN x >= {denom} THEN concat(cast(cast(x / {denom} as "
            f"decimal(38,2)) as string), ' {units[p]}')"
        )
    arms.append(
        "ELSE concat(cast(cast(x as decimal(38,2)) as string), ' B')"
    )
    return "CASE " + " ".join(arms) + " END"


def _decimal_size_case() -> str:
    """ClickHouse formatReadableDecimalSize: powers of 1000, KB/MB/...
    (vs formatReadableSize's 1024 KiB/MiB ladder)."""
    arms = []
    units = ["B", "KB", "MB", "GB", "TB", "PB", "EB"]
    for p in range(6, 0, -1):
        denom = f"CAST(pow(CAST(1000 AS DOUBLE), {p}) AS DOUBLE)"
        arms.append(
            f"WHEN x >= {denom} THEN concat(cast(cast(x / {denom} as "
            f"decimal(38,2)) as string), ' {units[p]}')"
        )
    arms.append(
        "ELSE concat(cast(cast(x as decimal(38,2)) as string), ' B')"
    )
    return "CASE " + " ".join(arms) + " END"


def _quantity_case() -> str:
    arms = []
    units = ["", " thousand", " million", " billion", " trillion",
             " quadrillion"]
    for p in range(5, 0, -1):
        denom = f"CAST(pow(CAST(1000 AS DOUBLE), {p}) AS DOUBLE)"
        arms.append(
            f"WHEN x >= {denom} THEN concat(cast(cast(x / {denom} as "
            f"decimal(38,2)) as string), '{units[p]}')"
        )
    arms.append("ELSE cast(cast(x as decimal(38,2)) as string)")
    return "CASE " + " ".join(arms) + " END"


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash6_sql(lon: str, lat: str) -> str:
    """Pure-SQL geohash at precision 6 (30 bits: 15 lon + 15 lat,
    lon first — the standard even/odd interleave).

    Engine-portable by construction: cell indices come from one float
    multiply-divide chain every IEEE 754 engine computes identically,
    and the interleave/base32 steps are integer shifts and a constant-
    alphabet substring — usable verbatim as a DuckDB oracle expression.
    """
    loni = (f"cast(least(32767, greatest(0, floor(({lon} + 180) / 360 "
            f"* 32768))) as bigint)")
    lati = (f"cast(least(32767, greatest(0, floor(({lat} + 90) / 180 "
            f"* 32768))) as bigint)")
    # every term fully parenthesized: SQL engines in the Postgres
    # tradition give '+' HIGHER precedence than '<<', so an unwrapped
    # 'x << 29 + y << 28' chain-shifts instead of summing
    terms = []
    for i in range(15):
        terms.append(f"(((({loni}) >> {14 - i}) & 1) << {29 - 2 * i})")
        terms.append(f"(((({lati}) >> {14 - i}) & 1) << {28 - 2 * i})")
    g = "(" + " + ".join(terms) + ")"
    chars = [
        f"substring('{_GEOHASH32}', "
        f"cast((({g}) >> {25 - 5 * c}) & 31 as int) + 1, 1)"
        for c in range(6)
    ]
    return "concat(" + ", ".join(chars) + ")"


#: (name, signature, return type, body) — bodies are pure SQL expressions.
_FUNCTIONS: list[tuple[str, str, str, str]] = [
    (
        "IPv4NumToString",
        "(ip BIGINT)",
        "STRING",
        "concat(cast(ip div 16777216 % 256 as string), '.',"
        " cast(ip div 65536 % 256 as string), '.',"
        " cast(ip div 256 % 256 as string), '.',"
        " cast(ip % 256 as string))",
    ),
    (
        "IPv4StringToNum",
        "(s STRING)",
        "BIGINT",
        "cast(split_part(s, '.', 1) as bigint) * 16777216"
        " + cast(split_part(s, '.', 2) as bigint) * 65536"
        " + cast(split_part(s, '.', 3) as bigint) * 256"
        " + cast(split_part(s, '.', 4) as bigint)",
    ),
    (
        "isIPv4String",
        "(s STRING)",
        "BOOLEAN",
        r"s rlike '^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.)"
        r"{3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$'",
    ),
    ("formatReadableSize", "(x DOUBLE)", "STRING", _size_case()),
    ("formatReadableDecimalSize", "(x DOUBLE)", "STRING",
     _decimal_size_case()),
    ("fromUnixTimestamp64Milli", "(ms BIGINT)", "TIMESTAMP",
     "timestamp_millis(ms)"),
    ("fromUnixTimestamp64Micro", "(us BIGINT)", "TIMESTAMP",
     "timestamp_micros(us)"),
    ("toUnixTimestamp64Milli", "(t TIMESTAMP)", "BIGINT",
     "unix_millis(t)"),
    ("toUnixTimestamp64Micro", "(t TIMESTAMP)", "BIGINT",
     "unix_micros(t)"),
    ("formatReadableQuantity", "(x DOUBLE)", "STRING", _quantity_case()),
    ("today", "()", "DATE", "current_date()"),
    ("yesterday", "()", "DATE", "date_sub(current_date(), 1)"),
    ("toYYYYMMDD", "(d DATE)", "BIGINT",
     "year(d) * 10000 + month(d) * 100 + day(d)"),
    ("toYYYYMM", "(d DATE)", "BIGINT", "year(d) * 100 + month(d)"),
    ("toStartOfMinute", "(t TIMESTAMP)", "TIMESTAMP",
     "date_trunc('minute', t)"),
    ("toStartOfFiveMinutes", "(t TIMESTAMP)", "TIMESTAMP",
     "timestamp_seconds(unix_timestamp(t) div 300 * 300)"),
    ("toStartOfHour", "(t TIMESTAMP)", "TIMESTAMP", "date_trunc('hour', t)"),
    ("toStartOfDay", "(t TIMESTAMP)", "TIMESTAMP", "date_trunc('day', t)"),
    # ClickHouse weeks start Monday (mode 1 in the reference deployments)
    ("toStartOfWeek", "(d DATE)", "DATE",
     "date_sub(d, (weekday(d) + 0))"),
    ("toStartOfMonth", "(d DATE)", "DATE", "trunc(d, 'month')"),
    ("toStartOfQuarter", "(d DATE)", "DATE", "trunc(d, 'quarter')"),
    ("toStartOfYear", "(d DATE)", "DATE", "trunc(d, 'year')"),
    ("toUnixTimestamp", "(t TIMESTAMP)", "BIGINT", "unix_timestamp(t)"),
    ("toDateTime", "(epoch BIGINT)", "TIMESTAMP",
     "timestamp_seconds(epoch)"),
    ("intDiv", "(a BIGINT, b BIGINT)", "BIGINT", "a div b"),
    ("intDivOrZero", "(a BIGINT, b BIGINT)", "BIGINT",
     "CASE WHEN b = 0 THEN 0 ELSE a div b END"),
    ("moduloOrZero", "(a BIGINT, b BIGINT)", "BIGINT",
     "CASE WHEN b = 0 THEN 0 ELSE a % b END"),
    ("cityHash64", "(s STRING)", "BIGINT", "xxhash64(s)"),
    # MD5/SHA1 cannot be registered (Spark builtins of the same name
    # are non-shadowable); Spark's md5/sha1/sha2 already emit the
    # lowercase hex a ClickHouse user writes as lower(hex(MD5(s))).
    # SHA256 is free and returns ClickHouse's FixedString-shaped BINARY.
    ("SHA256", "(s STRING)", "BINARY", "to_binary(sha2(s, 256), 'hex')"),
    # sipHash64: same USES (stable 64-bit hash), different VALUES —
    # the cityHash64 caveat in the module docstring applies.
    ("sipHash64", "(s STRING)", "BIGINT", "xxhash64(s, 1)"),
    # parseDateTimeBestEffort: ClickHouse's forgiving ingest parser as a
    # coalesce over the format ladder real feeds contain (ISO with/out
    # 'T', slashed, date-only, dotted European, 10-digit epoch);
    # unparseable input returns NULL like parseDateTimeBestEffortOrNull.
    ("parseDateTimeBestEffort", "(s STRING)", "TIMESTAMP",
     "coalesce("
     "try_to_timestamp(s, 'yyyy-MM-dd HH:mm:ss'),"
     "try_to_timestamp(s, 'yyyy-MM-dd''T''HH:mm:ss'),"
     "try_to_timestamp(s, 'yyyy/MM/dd HH:mm:ss'),"
     "try_to_timestamp(s, 'yyyy-MM-dd'),"
     "try_to_timestamp(s, 'yyyy/MM/dd'),"
     "try_to_timestamp(s, 'dd.MM.yyyy'),"
     "CASE WHEN s rlike '^[0-9]{10}$'"
     " THEN timestamp_seconds(cast(s as bigint)) END)"),
    ("splitByChar", "(sep STRING, s STRING)", "ARRAY<STRING>",
     "split(s, regexp_replace(sep, '([^a-zA-Z0-9])', '\\\\\\\\$1'))"),
    ("arrayStringConcat", "(a ARRAY<STRING>, sep STRING)", "STRING",
     "array_join(a, sep)"),
    ("empty", "(s STRING)", "BOOLEAN", "s IS NULL OR s = ''"),
    ("notEmpty", "(s STRING)", "BOOLEAN", "s IS NOT NULL AND s != ''"),
    ("splitByRegexp", "(re STRING, s STRING)", "ARRAY<STRING>",
     "split(s, re)"),
    # ClickHouse extract(haystack, pattern) cannot take that name here —
    # 'extract' is Spark's EXTRACT(field FROM timestamp) builtin and a
    # SQL UDF may not replace it. The unambiguous forms:
    ("extractFirst", "(s STRING, re STRING)", "STRING",
     "regexp_extract(s, re, 0)"),
    ("extractGroup", "(s STRING, re STRING)", "STRING",
     "regexp_extract(s, re, 1)"),
    ("extractAll", "(s STRING, re STRING)", "ARRAY<STRING>",
     "regexp_extract_all(s, re, 0)"),
    ("JSONExtractKeys", "(j STRING)", "ARRAY<STRING>",
     "json_object_keys(j)"),
    # --- string-search family (ClickHouse docs/sql-reference/functions/
    # string-search-functions) ---
    # position: 1-based offset of the first occurrence, 0 if absent.
    # 'position' itself is Spark's POSITION(substr IN str) builtin and a
    # SQL UDF may not replace it (the 'extract' precedent above) — the
    # UTF8 alias is the ClickHouse-parity name we can register; our
    # strings are always UTF-8 so the semantics coincide.
    ("positionUTF8", "(s STRING, n STRING)", "INT", "instr(s, n)"),
    ("positionCaseInsensitive", "(s STRING, n STRING)", "INT",
     "instr(lower(s), lower(n))"),
    # countSubstrings counts NON-overlapping occurrences (ClickHouse
    # semantics): the replace-length identity is exact for that contract
    # and stays a pure codegen expression.
    ("countSubstrings", "(s STRING, n STRING)", "BIGINT",
     "CASE WHEN n IS NULL OR length(n) = 0 THEN CAST(0 AS BIGINT) ELSE"
     " (length(s) - length(replace(s, n, ''))) div length(n) END"),
    # hasToken: needle bounded by non-word separators (or string edges).
    # Implemented by collapsing every separator to a space and padding —
    # no runtime regex-escaping of the needle is ever needed.
    ("hasToken", "(s STRING, tok STRING)", "BOOLEAN",
     "contains(concat(' ', regexp_replace(s, '[^A-Za-z0-9_]', ' '), ' '),"
     " concat(' ', tok, ' '))"),
    # multiSearchAny: any needle occurs as a substring (HOF exists —
    # inlined, short-circuits per row inside codegen).
    ("multiSearchAny", "(s STRING, needles ARRAY<STRING>)", "BOOLEAN",
     "exists(needles, n -> contains(s, n))"),
    # multiSearchFirstIndex: 1-based index (into the needle list) of the
    # needle whose occurrence starts LEFTMOST in s; ties keep the earlier
    # list index; 0 when none occur (ClickHouse contract). One aggregate()
    # fold over the needle indices — no explode, no shuffle.
    ("multiSearchFirstIndex", "(s STRING, needles ARRAY<STRING>)", "INT",
     "aggregate(sequence(1, size(needles)),"
     " named_struct('p', 2147483647, 'i', 0),"
     " (acc, k) -> CASE WHEN instr(s, element_at(needles, k)) > 0"
     " AND instr(s, element_at(needles, k)) < acc.p"
     " THEN named_struct('p', instr(s, element_at(needles, k)), 'i', k)"
     " ELSE acc END).i"),
    # formatDateTime: ClickHouse/MySQL %-patterns translated to Java
    # date_format patterns by a chained replace (composite %F/%T first).
    # Contract: fmt = %-patterns + punctuation/space only — bare
    # letters would be read as Java pattern letters. %i is minute
    # (ClickHouse), %M intentionally unmapped (its meaning flipped
    # between ClickHouse versions — refuse the ambiguity).
    ("formatDateTime", "(t TIMESTAMP, f STRING)", "STRING",
     "date_format(t, "
     "replace(replace(replace(replace(replace(replace(replace(replace("
     "replace(replace(replace(replace(replace(f,"
     " '%F', 'yyyy-MM-dd'), '%T', 'HH:mm:ss'),"
     " '%Y', 'yyyy'), '%y', 'yy'), '%m', 'MM'), '%d', 'dd'),"
     " '%e', 'd'), '%H', 'HH'), '%h', 'hh'), '%i', 'mm'),"
     " '%S', 'ss'), '%j', 'DDD'), '%%', '%'))"),
    ("replaceRegexpAll", "(s STRING, re STRING, r STRING)", "STRING",
     "regexp_replace(s, re, r)"),
    # replaceRegexpOne: replace only the FIRST match. The match is
    # located by instr on the extracted text — correct for patterns
    # without anchors/lookarounds (leftmost-first scanning means the
    # extracted text's first occurrence IS the match position; an
    # earlier occurrence of the same text would itself have matched).
    ("replaceRegexpOne", "(s STRING, re STRING, r STRING)", "STRING",
     "CASE WHEN regexp_extract(s, re, 0) = '' THEN s ELSE"
     " concat(substring(s, 1, instr(s, regexp_extract(s, re, 0)) - 1),"
     " regexp_replace(regexp_extract(s, re, 0), re, r),"
     " substring(s, instr(s, regexp_extract(s, re, 0))"
     " + length(regexp_extract(s, re, 0)))) END"),
    ("countMatches", "(s STRING, re STRING)", "BIGINT",
     "size(regexp_extract_all(s, re, 0))"),
    # --- array completion (ClickHouse docs/sql-reference/functions/
    # array-functions). SQL UDFs are monomorphic — registered for
    # ARRAY<BIGINT>, the measure-array shape; other element types call
    # the same expression bodies inline. ---
    # arrayCompact: collapse CONSECUTIVE duplicates (not a distinct).
    ("arrayCompact", "(a ARRAY<BIGINT>)", "ARRAY<BIGINT>",
     "transform(filter(transform(a, (x, i) -> named_struct('x', x, 'i', i)),"
     " s -> s.i = 0 OR NOT (s.x <=> element_at(a, s.i))), s -> s.x)"),
    # arrayFill with the fixed predicate x != 0 (ClickHouse's lambda
    # parameter cannot cross a SQL-UDF boundary): forward-fill zeros
    # with the last non-zero; leading zeros stay zero. The aggregate-
    # fold rebuilds the array per element — O(len^2) — so this is for
    # row-bounded arrays (hundreds of elements); for long sequences
    # fill at the ROW level with an IGNORE NULLS window (q163) before
    # collecting.
    ("arrayFillForward", "(a ARRAY<BIGINT>)", "ARRAY<BIGINT>",
     "aggregate(a, cast(array() as array<bigint>),"
     " (acc, x) -> if(x != 0 OR size(acc) = 0, concat(acc, array(x)),"
     " concat(acc, array(element_at(acc, -1)))))"),
    ("arrayJaccardIndex", "(a ARRAY<BIGINT>, b ARRAY<BIGINT>)", "DOUBLE",
     "size(array_intersect(a, b)) / size(array_union(a, b))"),
    # arrayEnumerateDense: dense rank by FIRST OCCURRENCE order —
    # array_distinct preserves first-occurrence order in Spark, so the
    # rank is just the position in the distinct array.
    ("arrayEnumerateDense", "(a ARRAY<BIGINT>)", "ARRAY<INT>",
     "transform(a, x -> cast(array_position(array_distinct(a), x) as int))"),
    # mapPopulateSeries: fill integer keys from min(key) to max(key)
    # step 1, missing values 0; entries come out key-ascending by
    # construction (the sequence IS the order).
    ("mapPopulateSeries", "(m MAP<BIGINT,BIGINT>)", "MAP<BIGINT,BIGINT>",
     "map_from_entries(transform("
     "sequence(array_min(map_keys(m)), array_max(map_keys(m))),"
     " k -> struct(k, coalesce(element_at(m, k), CAST(0 AS BIGINT)))))"),
    # --- datetime completion (ClickHouse docs/sql-reference/functions/
    # date-time-functions) ---
    # Relative-number family: monotone bucket ordinals since epoch —
    # the idiom behind "group by hour number" queries.
    ("toRelativeDayNum", "(t TIMESTAMP)", "BIGINT",
     "floor(cast(t as double) / 86400)"),
    ("toRelativeHourNum", "(t TIMESTAMP)", "BIGINT",
     "floor(cast(t as double) / 3600)"),
    ("toRelativeMinuteNum", "(t TIMESTAMP)", "BIGINT",
     "floor(cast(t as double) / 60)"),
    ("toLastDayOfMonth", "(t TIMESTAMP)", "DATE", "last_day(t)"),
    # ClickHouse dayOfWeek: Monday=1..Sunday=7 (Spark's weekday is
    # Monday=0, dayofweek is Sunday=1 — neither matches directly).
    ("toDayOfWeek", "(t TIMESTAMP)", "INT", "weekday(t) + 1"),
    ("addDays", "(t TIMESTAMP, n INT)", "TIMESTAMP",
     "timestampadd(DAY, n, t)"),
    ("addHours", "(t TIMESTAMP, n INT)", "TIMESTAMP",
     "timestampadd(HOUR, n, t)"),
    ("addMinutes", "(t TIMESTAMP, n INT)", "TIMESTAMP",
     "timestampadd(MINUTE, n, t)"),
    # timeSlots(start, duration, size): every size-second slot boundary
    # the half-open interval [start, start+duration] touches —
    # ClickHouse's session-to-slots fan-out for per-slot accounting.
    ("timeSlots",
     "(t TIMESTAMP, duration BIGINT, size BIGINT)",
     "ARRAY<TIMESTAMP>",
     "transform(sequence(floor(cast(t as double) / size),"
     " floor((cast(t as double) + duration) / size)),"
     " k -> timestamp_seconds(k * size))"),
    # --- rounding family (ClickHouse docs/sql-reference/functions/rounding-functions) ---
    # roundBankers: IEEE 754 round-half-to-even (ClickHouse's default for
    # Float inputs); Spark's bround is exactly that. Single-arg (scale 0)
    # form only: bround requires a FOLDABLE scale, which a SQL-UDF
    # parameter is not — for other scales call bround(x, n) directly.
    ("roundBankers", "(x DOUBLE)", "DOUBLE", "bround(x, 0)"),
    # roundToExp2: x < 1 -> 0, else the largest power of two <= x.
    # floor(log2(x)) computed EXACTLY as length(bin(x)) - 1 — a string
    # length, not a float log, so values at/near powers of two can never
    # land in the wrong bucket.
    (
        "roundToExp2",
        "(x BIGINT)",
        "BIGINT",
        "CASE WHEN x < 1 THEN CAST(0 AS BIGINT) ELSE"
        " shiftleft(CAST(1 AS BIGINT), cast(length(bin(x)) as int) - 1) END",
    ),
    # roundDown: largest array element <= x; below the lowest bound the
    # lowest bound is returned (ClickHouse semantics).
    (
        "roundDown",
        "(x BIGINT, arr ARRAY<BIGINT>)",
        "BIGINT",
        "coalesce(array_max(filter(arr, e -> e <= x)), array_min(arr))",
    ),
    # roundAge / roundDuration: ClickHouse's fixed CASE ladders.
    (
        "roundAge",
        "(x BIGINT)",
        "BIGINT",
        "CASE WHEN x < 1 THEN 0 WHEN x < 18 THEN 17 WHEN x < 25 THEN 18"
        " WHEN x < 35 THEN 25 WHEN x < 45 THEN 35 WHEN x < 55 THEN 45"
        " ELSE 55 END",
    ),
    (
        "roundDuration",
        "(x BIGINT)",
        "BIGINT",
        "CASE WHEN x < 1 THEN 0 WHEN x < 10 THEN 1 WHEN x < 30 THEN 10"
        " WHEN x < 60 THEN 30 WHEN x < 120 THEN 60 WHEN x < 180 THEN 120"
        " WHEN x < 240 THEN 180 WHEN x < 300 THEN 240 WHEN x < 600 THEN 300"
        " WHEN x < 1200 THEN 600 WHEN x < 1800 THEN 1200"
        " WHEN x < 3600 THEN 1800 WHEN x < 7200 THEN 3600"
        " WHEN x < 18000 THEN 7200 WHEN x < 36000 THEN 18000"
        " ELSE 36000 END",
    ),
    # --- bit family (docs/sql-reference/functions/bit-functions) ---
    # hex/unhex/bin are native Spark builtins with the ClickHouse names
    # already (numeric hex is unpadded here — document, don't shadow).
    ("bitCount", "(x BIGINT)", "BIGINT", "cast(bit_count(x) as bigint)"),
    ("bitTest", "(x BIGINT, k INT)", "BIGINT", "shiftright(x, k) & 1"),
    ("bitHammingDistance", "(a BIGINT, b BIGINT)", "BIGINT",
     "cast(bit_count(a ^ b) as bigint)"),
    # 32-bit rotate; defined (as in ClickHouse) on the UInt32 value range.
    (
        "bitRotateLeft32",
        "(x BIGINT, k INT)",
        "BIGINT",
        "(shiftleft(x % 4294967296, k) % 4294967296)"
        " + shiftright(x % 4294967296, 32 - k)",
    ),
    # --- encoding / math (exact-integer bodies only) ---
    ("base64Encode", "(s STRING)", "STRING", "base64(cast(s as binary))"),
    ("base64Decode", "(s STRING)", "STRING",
     "cast(unbase64(s) as string)"),
    ("intExp2", "(n INT)", "BIGINT", "shiftleft(CAST(1 AS BIGINT), n)"),
    # exact for n <= 18 (fits int64) — a string build, not pow()'s double
    ("intExp10", "(n INT)", "BIGINT",
     "cast(concat('1', repeat('0', n)) as bigint)"),
    # --- IP range family (docs/sql-reference/functions/ip-address-functions) ---
    # IPv4CIDRToRange: (network base, broadcast) of ip/prefix as a struct.
    (
        "IPv4CIDRToRange",
        "(ip BIGINT, prefix INT)",
        "STRUCT<lo: BIGINT, hi: BIGINT>",
        "named_struct("
        " 'lo', ip - (ip % shiftleft(CAST(1 AS BIGINT), 32 - prefix)),"
        " 'hi', ip - (ip % shiftleft(CAST(1 AS BIGINT), 32 - prefix))"
        "       + shiftleft(CAST(1 AS BIGINT), 32 - prefix) - 1)",
    ),
    # isIPAddressInRange('1.2.3.4', '10.0.0.0/8') — the dotted-quad parse
    # is inlined (a SQL UDF body can't reliably call sibling temp
    # functions at definition time).
    (
        "isIPAddressInRange",
        "(s STRING, cidr STRING)",
        "BOOLEAN",
        "(cast(split_part(s, '.', 1) as bigint) * 16777216"
        " + cast(split_part(s, '.', 2) as bigint) * 65536"
        " + cast(split_part(s, '.', 3) as bigint) * 256"
        " + cast(split_part(s, '.', 4) as bigint))"
        " div shiftleft(CAST(1 AS BIGINT),"
        "   32 - cast(split_part(cidr, '/', 2) as int))"
        " = (cast(split_part(split_part(cidr, '/', 1), '.', 1) as bigint) * 16777216"
        " + cast(split_part(split_part(cidr, '/', 1), '.', 2) as bigint) * 65536"
        " + cast(split_part(split_part(cidr, '/', 1), '.', 3) as bigint) * 256"
        " + cast(split_part(split_part(cidr, '/', 1), '.', 4) as bigint))"
        " div shiftleft(CAST(1 AS BIGINT),"
        "   32 - cast(split_part(cidr, '/', 2) as int))",
    ),
    # --- remaining date/string aliases ---
    # generic bucket: toStartOfInterval(t, INTERVAL n SECOND) — the
    # seconds form covers minute/hour/day buckets (pass 60/3600/86400)
    ("toStartOfInterval", "(t TIMESTAMP, secs BIGINT)", "TIMESTAMP",
     "timestamp_seconds(unix_timestamp(t) div secs * secs)"),
    ("toDayOfYear", "(d DATE)", "BIGINT", "dayofyear(d)"),
    ("toISOWeek", "(d DATE)", "BIGINT", "weekofyear(d)"),
    ("leftPad", "(s STRING, n INT, p STRING)", "STRING", "lpad(s, n, p)"),
    ("rightPad", "(s STRING, n INT, p STRING)", "STRING", "rpad(s, n, p)"),
    ("trimLeft", "(s STRING)", "STRING", "ltrim(s)"),
    ("trimRight", "(s STRING)", "STRING", "rtrim(s)"),
    ("trimBoth", "(s STRING)", "STRING", "trim(s)"),
    # formatReadableTimeDelta(sec): "N days, N hours, N minutes,
    # N seconds" — largest-unit-first, zero units skipped (except a
    # bare "0 seconds"), singular/plural exact; pure integer splits.
    (
        "formatReadableTimeDelta",
        "(sec BIGINT)",
        "STRING",
        "CASE WHEN sec = 0 THEN '0 seconds' ELSE concat_ws(', ',"
        " CASE WHEN sec div 86400 = 1 THEN '1 day'"
        "      WHEN sec div 86400 > 1 THEN concat(sec div 86400, ' days')"
        " END,"
        " CASE WHEN sec % 86400 div 3600 = 1 THEN '1 hour'"
        "      WHEN sec % 86400 div 3600 > 1"
        "        THEN concat(sec % 86400 div 3600, ' hours') END,"
        " CASE WHEN sec % 3600 div 60 = 1 THEN '1 minute'"
        "      WHEN sec % 3600 div 60 > 1"
        "        THEN concat(sec % 3600 div 60, ' minutes') END,"
        " CASE WHEN sec % 60 = 1 THEN '1 second'"
        "      WHEN sec % 60 > 1 THEN concat(sec % 60, ' seconds') END)"
        " END",
    ),
    # --- conditional family (docs/sql-reference/functions/conditional-functions) ---
    # ClickHouse transform(x, from, to, default). Registered under its
    # ClickHouse ALIAS caseWithExpression: the name 'transform' would
    # shadow Spark's higher-order transform(array, lambda), which this
    # engine (and any user lambda) relies on. ClickHouse's
    # 'CASE x WHEN ... END' form works verbatim in Spark SQL too.
    (
        "caseWithExpression",
        "(x STRING, f ARRAY<STRING>, t ARRAY<STRING>, d STRING)",
        "STRING",
        "CASE WHEN array_position(f, x) > 0"
        " THEN element_at(t, cast(array_position(f, x) as int)) ELSE d END",
    ),
    # multiIf in the two-branch arity (SQL UDFs are fixed-arity; deeper
    # ladders nest, or use native CASE which is what multiIf compiles to).
    (
        "multiIf",
        "(c1 BOOLEAN, v1 STRING, c2 BOOLEAN, v2 STRING, e STRING)",
        "STRING",
        "CASE WHEN c1 THEN v1 WHEN c2 THEN v2 ELSE e END",
    ),
    # --- JSON family (docs/sql-reference/functions/json-functions) ---
    # ClickHouse's JSONExtract* take a path of keys/indices; the common
    # single-key form maps to get_json_object with a '$.key' path.
    ("JSONHas", "(j STRING, k STRING)", "BOOLEAN",
     "get_json_object(j, concat('$.', k)) IS NOT NULL"),
    ("JSONExtractString", "(j STRING, k STRING)", "STRING",
     "get_json_object(j, concat('$.', k))"),
    ("JSONExtractInt", "(j STRING, k STRING)", "BIGINT",
     "cast(get_json_object(j, concat('$.', k)) as bigint)"),
    ("JSONExtractFloat", "(j STRING, k STRING)", "DOUBLE",
     "cast(get_json_object(j, concat('$.', k)) as double)"),
    ("JSONExtractBool", "(j STRING, k STRING)", "BOOLEAN",
     "cast(get_json_object(j, concat('$.', k)) as boolean)"),
    # JSONLength of an array at key (ClickHouse returns element count)
    ("JSONLength", "(j STRING, k STRING)", "BIGINT",
     "json_array_length(get_json_object(j, concat('$.', k)))"),
    # geohashEncode at fixed precision 6 (ClickHouse's is 1..12; six
    # chars ≈ 1.2 km cells — the bucketing/skipping use case). The body
    # is geohash6_sql(), shared verbatim with the DuckDB oracle.
    ("geohashEncode", "(lon DOUBLE, lat DOUBLE)", "STRING",
     geohash6_sql("lon", "lat")),
    # bar(): eighth-block rendering via pure floor arithmetic (no
    # round-half ambiguity): e8 = floor(scaled_width * 8) eighths total.
    (
        "bar",
        "(x DOUBLE, lo DOUBLE, hi DOUBLE, width DOUBLE)",
        "STRING",
        # e8 = total eighth-blocks via pure floor (no round-half hazard);
        # rem = 0 must yield '' (substr(s, 0, 1) would NOT — Spark treats
        # position 0 as 1), hence the CASE.
        f"concat(repeat('{_FULL}', cast(floor(greatest(CAST(0 AS DOUBLE),"
        f" least(width, (x - lo) / (hi - lo) * width)) * 8) as int) div 8),"
        f" CASE WHEN cast(floor(greatest(CAST(0 AS DOUBLE),"
        f" least(width, (x - lo) / (hi - lo) * width)) * 8) as int) % 8 = 0"
        f" THEN '' ELSE substr('{_EIGHTHS}',"
        f" cast(floor(greatest(CAST(0 AS DOUBLE),"
        f" least(width, (x - lo) / (hi - lo) * width)) * 8) as int) % 8, 1)"
        f" END)",
    ),
]


#: per-session registration memo: id(session) -> content hash. Running
#: ~70 CREATE OR REPLACE statements costs seconds; callers (the gate,
#: notebooks) invoke registration defensively before every query, so
#: the re-registration of an unchanged surface must be free.
_REGISTERED: dict[int, int] = {}


def register_clickhouse_sql_functions(spark: SparkSession) -> list[str]:
    """Register the ClickHouse-name scalar surface; returns the names.

    Every body is a plain SQL expression, so Catalyst inlines it at the
    call site — ``EXPLAIN`` on a caller shows the expanded expression
    inside WholeStageCodegen, never a UDF boundary.

    Idempotent AND cheap when repeated: a per-session memo skips the
    DDL round-trips if this exact surface is already registered
    (functions are session-scoped TEMPORARY, so the memo key is the
    session object identity).
    """
    key = hash(tuple(_FUNCTIONS))
    names = [name for name, _, _, _ in _FUNCTIONS]
    if _REGISTERED.get(id(spark)) == key:
        return names
    for name, sig, ret, body in _FUNCTIONS:
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {ret} RETURN {body}"
        )
    _REGISTERED[id(spark)] = key
    return names


def register_sql_surface(spark: SparkSession, sf_dir: str) -> list[str]:
    """Functions + the driver tables as views: the full ``spark.sql``
    migration surface in one call."""
    from kubenetmon_spark.tables import register_views

    register_views(spark, sf_dir)
    return register_clickhouse_sql_functions(spark)
