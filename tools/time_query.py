#!/usr/bin/env python
"""Time one or more gate queries on a warm session — the bench.py
methodology (noop sink, warmed tables/SQL surface/codegen) isolated to
a handful of queries so an optimization's effect can be A/B'd in
seconds instead of a full 319-query suite run.

Usage: python tools/time_query.py [sf_dir] qNN [qMM ...] [--reps=N]
Defaults: sf_dir=/root/testdata/sf0.1, reps=3. Prints per-rep and best
times; numbers are comparable to BENCH_DETAIL.json entries (same sink,
same warmup discipline).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    args = sys.argv[1:]
    reps = 3
    for a in list(args):
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
            args.remove(a)
    sf_dir = "/root/testdata/sf0.1"
    if args and "/" in args[0]:
        sf_dir = args.pop(0)
    if not args:
        print(__doc__)
        return 2

    from kubenetmon_spark.gate import gate_queries
    from kubenetmon_spark.session import get_spark
    from kubenetmon_spark.sql import register_sql_surface
    from kubenetmon_spark.tables import load_tables

    queries = gate_queries()
    unknown = [a for a in args if a not in queries]
    # allow prefix match (q56 -> q56_approx_sketches)
    resolved = []
    for a in args:
        if a in queries:
            resolved.append(a)
            continue
        hits = [q for q in queries if q.startswith(a)]
        if len(hits) != 1:
            print(f"unknown/ambiguous query {a!r}: {hits[:5]}")
            return 2
        resolved.append(hits[0])

    spark = get_spark("time_query")
    spark.sparkContext.setLogLevel("ERROR")
    for df in load_tables(spark, sf_dir).values():
        df.limit(1).write.format("noop").mode("overwrite").save()
    register_sql_surface(spark, sf_dir)
    spark.sql(
        "SELECT l_returnflag, sum(l_quantity) s FROM lineitem "
        "GROUP BY l_returnflag ORDER BY s"
    ).write.format("noop").mode("overwrite").save()

    for name in resolved:
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
        print(
            f"{name}: best {min(times):.3f}s  reps {times}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
