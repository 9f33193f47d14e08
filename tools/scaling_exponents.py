#!/usr/bin/env python
"""Scaling-exponent study over the engine's five most expensive
operator shapes (r04 VERDICT #4; six GATES — minhash-LSH has a batch
and an incremental registration): measure wall-clock at sf{0.1,1,10}
and fit the per-decade exponent e = log10(t_next / t_prev). A shape is
scale-linear when e ~ 1; e > ~1.2 on the 1 -> 10 decade (where fixed
overhead no longer matters) is a super-linear outlier that needs a fix.

    python tools/scaling_exponents.py [--runs=2] [--out=json_path]
                                      [--shapes=qNN,qMM]

``--shapes`` overrides the default shape list with named gates — the
round-7 span/minhash re-baseline (VERDICT r06 #1: the rotate-built sf1
corpus was span-degenerate, so those exponents needed re-fitting on
the word-suffix rebuild) runs exactly the affected family.

Inputs: /root/testdata/sf0.1, .scale/sf1 (tools/make_scale_data.py),
.scale/sf10 (same tool, --off=100000000 --docs=word-suffix — see its
header for why the second decade needs word-suffix diversification).
One SparkSession per SF (sessions are not resized mid-run); each shape
runs ``--runs`` times warm after one discarded cold run per SF, best
time kept (host-noise posture from PLAN_AUDIT adjudications).
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

# The five heavy shapes (r04 VERDICT #4) as six gate registrations
# (minhash-LSH twice: batch + incremental) — gates take (spark,
# sf_dir), so the same code paths the correctness manifest pins are
# what get timed.
SHAPES = [
    "q23_minhash_lsh",
    "q279_minhash_dedup_incremental",
    "q281_ivf_index_search",
    "q26_flow_pipeline",
    "q101_duplicate_spans",
    "q315_streaming_rates",
]

SFS = [
    ("sf0.1", "/root/testdata/sf0.1", 0.1),
    ("sf1", str(ROOT / ".scale/sf1"), 1.0),
    ("sf10", str(ROOT / ".scale/sf10"), 10.0),
]


def _time_sf(sf_dir: str, runs: int, shapes: list[str] = None) -> dict[str, float]:
    """Run every shape at one SF in a fresh subprocess (one JVM per SF:
    heap sizing and cache state can't leak across decades)."""
    shapes = shapes or SHAPES
    code = f"""
import json, sys, time
sys.path.insert(0, {str(ROOT)!r})
from kubenetmon_spark.gate import _REGISTRY
from kubenetmon_spark.session import get_spark
spark = get_spark("scaling_exponents")
spark.sparkContext.setLogLevel("ERROR")
by_name = {{q.name: q.spark_fn for q in _REGISTRY}}
out = {{}}
for name in {shapes!r}:
    fn = by_name[name]
    # Discard run doubles as the CARDINALITY CHECK: round 6 found the
    # r5 q26 sf10 reading had timed an empty pipeline (a synthetic
    # pod-IP wrap made the labeler reject 100% of rows — SCALE.md
    # round-6 correction). A timing of zero output rows is not a
    # measurement of the shape.
    n_rows = len(fn(spark, {sf_dir!r}).collect())
    assert n_rows > 0, f"{{name}} returned 0 rows at {sf_dir!r} - timing it would measure an empty pipeline"
    best = None
    for _ in range({runs}):
        t0 = time.monotonic()
        fn(spark, {sf_dir!r}).collect()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    out[name] = round(best, 3)
    print(f"  {{name}}: {{best:.2f}}s", file=sys.stderr)
print(json.dumps(out))
"""
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        timeout=7200,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"timing subprocess failed for {sf_dir}:\n{proc.stderr[-4000:]}"
        )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> int:
    runs = 2
    out_path = str(ROOT / ".scale/exponents.json")
    shapes = list(SHAPES)
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        elif a.startswith("--shapes="):
            shapes = [s for s in a.split("=", 1)[1].split(",") if s]

    results: dict[str, dict[str, float]] = {}
    for sf_name, sf_dir, _mult in SFS:
        if not Path(sf_dir).is_dir():
            raise SystemExit(f"missing {sf_dir} — build it first (see header)")
        print(f"== {sf_name} ({sf_dir})", flush=True)
        t0 = time.monotonic()
        results[sf_name] = _time_sf(sf_dir, runs, shapes)
        print(f"   {sf_name} done in {time.monotonic() - t0:.0f}s", flush=True)

    report = {"runs": runs, "times_s": results, "exponents": {}}
    print(f"\n{'shape':36} {'sf0.1':>8} {'sf1':>8} {'sf10':>8} "
          f"{'e(0.1->1)':>10} {'e(1->10)':>9}")
    for name in shapes:
        t01 = results["sf0.1"][name]
        t1 = results["sf1"][name]
        t10 = results["sf10"][name]
        e01 = math.log10(t1 / t01)
        e110 = math.log10(t10 / t1)
        report["exponents"][name] = {
            "e_01_to_1": round(e01, 3),
            "e_1_to_10": round(e110, 3),
        }
        flag = "  <-- SUPER-LINEAR" if e110 > 1.2 else ""
        print(f"{name:36} {t01:8.2f} {t1:8.2f} {t10:8.2f} "
              f"{e01:10.2f} {e110:9.2f}{flag}")

    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    Path(out_path).write_text(json.dumps(report, indent=1) + "\n")
    print(f"\nwrote {out_path}")
    worst = max(v["e_1_to_10"] for v in report["exponents"].values())
    return 0 if worst <= 1.2 else 1


if __name__ == "__main__":
    raise SystemExit(main())
