#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() in DuckDB over the
same parquet tables; compare row count, column names, and
order-insensitive values.

Usage: python tools/check_parity.py [sf_dir] [query_name ...]
Defaults to /root/testdata/sf0.001 and all queries.

Every run also updates PARITY_MANIFEST.json at the repo root — one
entry per (sf, query): status (hash_pass / rows_only / fail:reason)
plus the md5 of the normalized result rows. The manifest is COMMITTED,
so a regression in any gate (including the q51+ tail the driver's
50-query sample never sees) shows up as a diff in review, not only in
a tool run. Partial runs update only the entries they executed.
"""

from __future__ import annotations

import hashlib
import json
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


MANIFEST = Path(__file__).resolve().parent.parent / "PARITY_MANIFEST.json"


def _update_manifest(
    sf_dir: str, entries: dict[str, dict], full_run: bool
) -> None:
    """Record this run's results in the committed manifest (sorted
    keys -> stable diffs). A FULL run REPLACES the sf section, so
    renamed/removed gates and typo'd one-off entries don't linger;
    a partial run merges only what it executed."""
    sf_key = Path(sf_dir).name
    data: dict = {}
    if MANIFEST.is_file():
        data = json.loads(MANIFEST.read_text())
    if full_run:
        sec = dict(entries)
    else:
        sec = data.setdefault(sf_key, {})
        sec.update(entries)
    data[sf_key] = dict(sorted(sec.items()))
    MANIFEST.write_text(
        json.dumps(dict(sorted(data.items())), indent=1, sort_keys=True)
        + "\n"
    )


def _rows_md5(rows) -> str:
    h = hashlib.md5()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    wanted = [a for a in args if "/" not in a]

    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    unknown = [w for w in wanted if w not in queries]
    if unknown:
        print(f"unknown query name(s): {unknown} — not recorded")
        return 2
    names = wanted or list(queries)

    spark = get_spark("parity", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    passed, failed, rows_only = [], [], []
    manifest: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
        except Exception as e:
            failed.append((name, f"SPARK ERROR: {e}"))
            manifest[name] = {"status": f"fail:spark:{str(e)[:120]}"}
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            rows_only.append(name)
            _, rrows = normalize_df(sdf)
            manifest[name] = {
                "status": "rows_only",
                "n_rows": len(rrows),
                "md5": _rows_md5(rrows),
            }
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failed.append((name, f"ORACLE ERROR: {e}"))
            manifest[name] = {"status": f"fail:oracle:{str(e)[:120]}"}
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            continue
        scols, srows = normalize_df(sdf)
        ocols, orows = normalize_df(odf)
        if scols != ocols:
            failed.append((name, f"columns differ: spark={scols} oracle={ocols}"))
            manifest[name] = {"status": "fail:columns"}
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            continue
        if len(srows) != len(orows):
            failed.append((name, f"row count: spark={len(srows)} oracle={len(orows)}"))
            manifest[name] = {"status": "fail:rows"}
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            continue
        if srows != orows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            failed.append((name, f"values differ, first diffs: {diffs}"))
            print(f"FAIL {name}: values differ; first diffs:")
            for a, b in diffs:
                print(f"   spark:  {a}")
                print(f"   oracle: {b}")
            manifest[name] = {"status": "fail:values"}
            continue
        passed.append(name)
        manifest[name] = {
            "status": "hash_pass",
            "n_rows": len(srows),
            "md5": _rows_md5(srows),
        }
        print(f"PASS {name}: {len(srows)} rows, cols={scols} ({time.time()-t0:.1f}s)")

    _update_manifest(sf_dir, manifest, full_run=not wanted)
    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(rows_only)} rows-only of {len(names)}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
