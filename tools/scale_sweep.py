#!/usr/bin/env python
"""Whole-surface scaling sweep: execute EVERY gate query at a larger
scale factor and report failures + timings — the scale-bug hunter that
caught the q100/q170 int64 overflows (SCALE.md round-2 section).

Usage:
    python tools/scale_sweep.py [SF_DIR] [--skip qNN,qMM] [--start-at qNNN]

``--start-at`` resumes an interrupted sweep at the named query
(registration order) — everything before it prints SKIP; merge the two
logs for the full picture.

SF_DIR defaults to .scale/sf1 (build it with tools/make_scale_data.py).
Queries run one at a time through the no-op sink; failures are caught
and summarized instead of aborting the sweep. Exit code 1 if anything
failed.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: known output-bound quadratic baselines excluded by default (their
#: documented scale substitutes are swept instead — see SCALE.md).
#: q22's all-pairs Jaccard was once here and graduated out (its gate
#: now runs the max_df-guarded bounded-fan-out form). q88 re-enters in
#: round 6: its TRUE output is quadratic in the data by TPC-H name
#: construction (names draw from a tiny vocabulary, so pairs within
#: levenshtein<=3 genuinely explode — 55M output pairs at sf1, ~5.5B
#: at sf10 ≈ hours of legitimate OUTPUT emission, caught by the sf10
#: sweep wedging on it). No operator fix makes a 5.5B-row answer
#: cheap; the documented scale substitute is q231_entity_resolution
#: (exact-collapse first, then compare distinct texts — ~2s), which
#: sweeps normally.
DEFAULT_SKIP: set[str] = {"q88_fuzzy_pairs"}


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else str(
        Path(__file__).resolve().parent.parent / ".scale/sf1"
    )
    skip = set(DEFAULT_SKIP)
    start_at = None
    for a in sys.argv[1:]:
        if a.startswith("--skip"):
            skip |= set(a.split("=", 1)[1].split(","))
        elif a.startswith("--start-at"):
            start_at = a.split("=", 1)[1]

    # sf1-in-local-mode needs the big-box heap (SCALE.md driver-heap
    # note); pin it here, not in the library default.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from kubenetmon_spark.gate import gate_queries
    from kubenetmon_spark.session import get_spark
    from kubenetmon_spark.tables import load_tables

    spark = get_spark("scale_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    for df in load_tables(spark, sf_dir).values():
        df.limit(1).write.format("noop").mode("overwrite").save()

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    fails: list[str] = []
    empties: list[str] = []
    t_all = time.perf_counter()
    started = start_at is None
    for name, fn in gate_queries().items():
        if not started:
            if name == start_at:
                started = True
            else:
                print(f"SKIP {name}")
                continue
        if any(name.startswith(s) for s in skip):
            print(f"SKIP {name}")
            continue
        t0 = time.perf_counter()
        try:
            # Row-count Observation on the noop write: "ran without
            # error" is not "computed something" — the r5 q26 sf10
            # phantom (SCALE.md round-6 correction) executed a whole
            # labeler pipeline that rejected 100% of rows and swept
            # green. Zero-row outputs are reported as DEGENERATE for
            # adjudication (a few gates are legitimately empty at some
            # SFs — q08's anti-join is empty whenever every customer
            # has an order — so this is a report, not a hard failure).
            obs = Observation()
            df = fn(spark, sf_dir)
            df.observe(obs, F.count(F.lit(1)).alias("n")).write.format(
                "noop"
            ).mode("overwrite").save()
            n = int(obs.get["n"])
            tag = "OK" if n > 0 else "DEGENERATE"
            if n == 0:
                empties.append(name)
            print(
                f"{tag} {name} rows={n} {time.perf_counter() - t0:.1f}s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 - sweep must not abort
            fails.append(name)
            msg = str(e).splitlines()[0][:160]
            print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
    print(
        f"DONE {time.perf_counter() - t_all:.0f}s; "
        f"{len(fails)} failures: {fails}; "
        f"{len(empties)} zero-row outputs to adjudicate: {empties}"
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
