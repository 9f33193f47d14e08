#!/usr/bin/env python
"""Whole-surface scaling sweep: execute EVERY gate query at a larger
scale factor and report failures + timings — the scale-bug hunter that
caught the q100/q170 int64 overflows (SCALE.md round-2 section).

Usage:
    python tools/scale_sweep.py [SF_DIR] [--skip qNN,qMM] [--start-at qNNN]
                                [--only qNN,qMM]

``--only`` restricts the sweep to the named queries (prefix match,
like --skip) — the targeted re-sweep shape for a corpus rebuild or a
new gate, when the full surface has already swept at that SF.

``--start-at`` resumes an interrupted sweep at the named query
(registration order) — everything before it prints SKIP; merge the two
logs for the full picture.

SF_DIR defaults to .scale/sf1 (build it with tools/make_scale_data.py).
Queries run one at a time through the no-op sink; failures are caught
and summarized instead of aborting the sweep.

Exit code 1 if anything failed OR any query returned zero rows without
a standing adjudication in tools/degenerate_adjudications.json — the
DEGENERATE queue is a GATE, not a report (VERDICT r06 #5): a zero-row
output either has written DuckDB-cross-checked evidence that empty is
the correct answer at this scale, or the sweep is red. The r5
empty-labeler phantom (a pipeline that rejected 100% of rows and swept
green) is the failure mode this closes permanently.
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


def parse_args(
    argv: list[str],
) -> tuple[list[str], set[str], str | None, set[str]]:
    """Parse sweep argv into (positionals, skip set, start_at).

    Accepts BOTH ``--skip=qNN,qMM`` and ``--skip qNN,qMM`` forms (the
    usage line always advertised the space form but the old parser
    only handled ``=``, mis-parsing the value as SF_DIR — r6 advisor
    catch). Unknown flags and a flag missing its value fail loud with
    the usage text instead of being silently swallowed."""
    skip = set(DEFAULT_SKIP)
    start_at = None
    only: set[str] = set()
    pos: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--"):
            if "=" in a:
                flag, val = a.split("=", 1)
            else:
                flag = a
                i += 1
                if i >= len(argv):
                    raise SystemExit(f"{flag} needs a value\n{__doc__}")
                val = argv[i]
            if flag == "--skip":
                skip |= {s for s in val.split(",") if s}
            elif flag == "--start-at":
                start_at = val
            elif flag == "--only":
                only |= {s for s in val.split(",") if s}
            else:
                raise SystemExit(f"unknown flag {flag}\n{__doc__}")
        else:
            pos.append(a)
        i += 1
    return pos, skip, start_at, only


def main() -> int:
    args, skip, start_at, only = parse_args(sys.argv[1:])
    sf_dir = args[0] if args else str(
        Path(__file__).resolve().parent.parent / ".scale/sf1"
    )

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
        if only and not any(name.startswith(s) for s in only):
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
            # green. Zero-row outputs are DEGENERATE: either a standing
            # adjudication in degenerate_adjudications.json documents
            # that empty is correct at this scale (DuckDB-verified), or
            # the sweep exits nonzero (VERDICT r06 #5).
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
    adjudicated, unadjudicated = split_adjudicated(
        empties, load_adjudications()
    )
    print(
        f"DONE {time.perf_counter() - t_all:.0f}s; "
        f"{len(fails)} failures: {fails}; "
        f"{len(adjudicated)} adjudicated-empty (see "
        f"degenerate_adjudications.json): {adjudicated}; "
        f"{len(unadjudicated)} UNADJUDICATED DEGENERATE (sweep is red "
        f"until each has DuckDB-verified evidence in the sidecar): "
        f"{unadjudicated}"
    )
    spark.stop()
    return 1 if fails or unadjudicated else 0


def load_adjudications(
    path: str | Path | None = None,
) -> dict[str, str]:
    """The standing DEGENERATE adjudication sidecar (query name ->
    written evidence note). Missing file = no adjudications: every
    zero-row output fails the sweep until adjudicated."""
    import json

    p = Path(path or Path(__file__).resolve().parent
             / "degenerate_adjudications.json")
    if not p.exists():
        return {}
    doc = json.loads(p.read_text())
    return {k: v for k, v in doc.items() if not k.startswith("_")}


def split_adjudicated(
    empties: list[str], adjudications: dict[str, str]
) -> tuple[list[str], list[str]]:
    """(adjudicated, unadjudicated) partition of the sweep's zero-row
    queries. Unadjudicated entries make the sweep exit nonzero."""
    adj = [q for q in empties if q in adjudications]
    unadj = [q for q in empties if q not in adjudications]
    return adj, unadj


if __name__ == "__main__":
    raise SystemExit(main())
