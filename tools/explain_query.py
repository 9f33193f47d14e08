#!/usr/bin/env python
"""Print the formatted physical plan of any gate query — the
``.explain("formatted")`` loop the SCALE.md/PLAN_AUDIT.md notes are
derived from, for one query at a time.

Usage: python tools/explain_query.py q10_lpm_classify [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    from kubenetmon_spark.gate import gate_queries
    from kubenetmon_spark.session import get_spark

    queries = gate_queries()
    if name not in queries:
        import difflib

        close = difflib.get_close_matches(name, queries, n=5)
        print(f"unknown query {name!r}; close matches: {close}")
        return 2
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    df = queries[name](spark, sf_dir)
    df.explain("formatted")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
