"""Concurrent-query serving benchmark: dashboard-style load.

The reference's users point Grafana at ClickHouse and many panels fire
at once; ClickHouse time-slices them natively. This tool measures the
same posture here: N threads each loop over a mixed panel set (the
README top-talkers plus rollup/top-N/scan shapes) against one shared
SparkSession with the FAIR scheduler, and we report per-query p50/p95
plus aggregate throughput, next to the single-threaded baseline.

Run: python tools/concurrency_bench.py [sf_dir] [n_threads] [rounds]
Prints one JSON line; paste the table into SCALE.md when it changes.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kubenetmon_spark.gate import gate_queries
from kubenetmon_spark.session import get_spark

#: A dashboard's worth of panel shapes, heaviest first so FIFO's
#: worst case (cheap panels queueing behind the rollup) is on display.
PANELS = [
    "q04_minute_rollup",
    "q02_top_talkers",
    "q03_global_sum",
    "q12_topn_per_group",
    "q57_word_count",
]


def pctl(xs: list[float], q: float) -> float:
    ys = sorted(xs)
    return ys[min(len(ys) - 1, int(q * len(ys)))]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_threads = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark(app_name="concurrency_bench", fair_scheduler=True)
    qs = gate_queries()

    def run_one(name: str) -> float:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).collect()
        return time.monotonic() - t0

    # warm: plans compiled, views/codegen cached, file listings done
    for name in PANELS:
        run_one(name)

    # single-threaded baseline (per-panel median of `rounds`)
    base = {
        name: sorted(run_one(name) for _ in range(rounds))[rounds // 2]
        for name in PANELS
    }

    # concurrent: each thread loops the full panel mix
    lat: dict[str, list[float]] = {name: [] for name in PANELS}

    def worker(tid: int) -> None:
        for _ in range(rounds):
            for name in PANELS[tid % len(PANELS):] + PANELS[: tid % len(PANELS)]:
                d = run_one(name)
                lat[name].append(d)  # list.append is GIL-atomic

    t0 = time.monotonic()
    with ThreadPoolExecutor(max_workers=n_threads) as ex:
        list(ex.map(worker, range(n_threads)))
    wall = time.monotonic() - t0

    n_queries = sum(len(v) for v in lat.values())
    out = {
        "sf_dir": sf_dir,
        "n_threads": n_threads,
        "queries_run": n_queries,
        "wall_s": round(wall, 2),
        "queries_per_sec": round(n_queries / wall, 2),
        "panels": {
            name: {
                "base_s": round(base[name], 3),
                "p50_s": round(pctl(lat[name], 0.50), 3),
                "p95_s": round(pctl(lat[name], 0.95), 3),
            }
            for name in PANELS
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
