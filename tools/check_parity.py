#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() in DuckDB over the
same parquet tables; compare row count, column names, and
order-insensitive values.

Usage: python tools/check_parity.py [sf_dir] [query_name ...]
Defaults to /root/testdata/sf0.001 and all queries.
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from kubenetmon_spark.session import get_spark
from kubenetmon_spark.tables import TABLE_NAMES


def normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, int):
        return int(v)
    return str(v)


def normalize_df(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(normalize_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    wanted = [a for a in args if "/" not in a]

    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = wanted or list(queries)

    spark = get_spark("parity", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    passed, failed, rows_only = [], [], []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
        except Exception as e:
            failed.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failed.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            continue
        scols, srows = normalize_df(sdf)
        ocols, orows = normalize_df(odf)
        if scols != ocols:
            failed.append((name, f"columns differ: spark={scols} oracle={ocols}"))
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            continue
        if len(srows) != len(orows):
            failed.append((name, f"row count: spark={len(srows)} oracle={len(orows)}"))
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            continue
        if srows != orows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            failed.append((name, f"values differ, first diffs: {diffs}"))
            print(f"FAIL {name}: values differ; first diffs:")
            for a, b in diffs:
                print(f"   spark:  {a}")
                print(f"   oracle: {b}")
            continue
        passed.append(name)
        print(f"PASS {name}: {len(srows)} rows, cols={scols} ({time.time()-t0:.1f}s)")

    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(rows_only)} rows-only of {len(names)}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
