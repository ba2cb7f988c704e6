#!/usr/bin/env python3
"""Run every (or a subset of) registry query side-by-side against the
DuckDB oracle at a given scale factor — the local replica of the
driver's correctness gate, runnable as one script.

Usage:
    python tools/oracle_sweep.py [--sf-dir /root/testdata/sf0.01] \
        [--only name1,name2] [--start-at name]

Prints one line per query: `ok <name>`, `FAIL <name>: <problems>`, or
`rows-only <name> (<rows>)` for rows without an oracle entry.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--start-at", default="")
    args = ap.parse_args()

    from stglib_spark import queries as registry
    from stglib_spark.session import get_spark
    from tests.oracle_harness import compare, duck_connection

    spark = get_spark("oracle-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(args.sf_dir)

    qs = registry.queries()
    oracle = registry.oracle_sql()
    names = list(qs)
    if args.only:
        keep = set(args.only.split(","))
        names = [n for n in names if n in keep]
    if args.start_at and args.start_at in names:
        names = names[names.index(args.start_at):]

    n_ok = n_fail = n_rows = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, args.sf_dir)
            if name not in oracle:
                rows = sdf.count()
                if rows > 0:
                    n_rows += 1
                    print(f"rows-only {name} ({rows}) "
                          f"[{time.perf_counter() - t0:.1f}s]", flush=True)
                else:
                    n_fail += 1
                    print(f"FAIL {name}: rows-only query returned 0 rows",
                          flush=True)
                continue
            ddf = con.execute(oracle[name]).df()
            problems = compare(sdf, ddf, name)
            if problems:
                n_fail += 1
                print(f"FAIL {name}: {problems[:3]}", flush=True)
            else:
                n_ok += 1
                print(f"ok {name} [{time.perf_counter() - t0:.1f}s]",
                      flush=True)
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"FAIL {name}: exception {e!r}", flush=True)
            traceback.print_exc(file=sys.stderr)
    print(f"TOTAL ok={n_ok} fail={n_fail} rows_only={n_rows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
