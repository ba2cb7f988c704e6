#!/usr/bin/env python
"""Per-query bench regression diff.

Compares two bench results (driver ``BENCH_r{N}.json`` artifacts, raw
``bench.py`` one-line JSON output, or a file containing it) and flags
queries slower than ``--threshold`` (default 1.5x). Exit code 1 when any
regression is flagged, so it can gate CI.

Usage:
    python tools/bench_regression.py BENCH_r01.json BENCH_r03.json
    python tools/bench_regression.py BENCH_r01.json current_bench.json -t 1.3
    python bench.py | tail -1 > now.json && \
        python tools/bench_regression.py BENCH_r01.json now.json

Adjudication mode (VERDICT r12 task #3 — ambient-drift control): with
``--adjudicate OUT.json --sf-dir DIR``, every flagged query is re-timed
in-process (interleaved passes, median), and the machine-written verdict
— {query, t_prev, t_now, rerun_times, rerun_median, verdict} — lands in
OUT.json. Run it on an otherwise idle box (never concurrently with the
driver sim or pytest).
"""

from __future__ import annotations

import argparse
import json
import sys


def load_bench(path: str) -> dict:
    """Accept either the driver artifact ({"rc":..,"parsed":{...}}) or the
    raw bench.py JSON line ({"metric":...,"queries":{...}})."""
    with open(path, encoding="utf-8") as f:
        text = f.read().strip()
    doc = json.loads(text)
    if "parsed" in doc:
        if doc.get("rc", 0) != 0 or not doc.get("parsed"):
            raise SystemExit(
                f"{path}: bench run crashed (rc={doc.get('rc')}); no metrics"
            )
        doc = doc["parsed"]
    if "queries" not in doc:
        raise SystemExit(f"{path}: no 'queries' map found")
    return doc


def compare(base: dict, new: dict, threshold: float) -> tuple[list[tuple], int]:
    rows = []
    flagged = 0
    bq, nq = base["queries"], new["queries"]
    for name in nq:
        t_new = nq[name]
        t_base = bq.get(name)
        if t_base is None:
            rows.append((name, None, t_new, None, "NEW"))
            continue
        ratio = t_new / t_base if t_base > 0 else float("inf")
        mark = ""
        if ratio > threshold:
            mark = "REGRESSION"
            flagged += 1
        elif ratio < 1 / threshold:
            mark = "improved"
        rows.append((name, t_base, t_new, ratio, mark))
    for name in bq:
        if name not in nq:
            rows.append((name, bq[name], None, None, "REMOVED"))
    return rows, flagged


def adjudicate(
    flagged: list[tuple], sf_dir: str, reruns: int, threshold: float,
    baseline_file: str, current_file: str,
) -> dict:
    """Re-time each flagged query with bench.py's protocol (noop sink,
    sf0.01 warm pass, interleaved passes, per-query median) in ONE
    session, and classify: rerun_median within threshold of t_prev =
    ambient-noise (the committed number was a drift artifact), else
    confirmed-regression. Machine-written so the committed adjudication
    can't drift from what actually ran."""
    import os
    import statistics
    import time

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    record = {
        "baseline_file": baseline_file,
        "current_file": current_file,
        "sf_dir": sf_dir,
        "threshold": threshold,
        "reruns": reruns,
        "rows": [],
    }
    if not flagged:
        return record
    from stglib_spark import queries as registry
    from stglib_spark.session import get_spark

    spark = get_spark("bench-adjudicate")
    spark.sparkContext.setLogLevel("ERROR")
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    names = [name for name, _, _ in flagged if name in registry.QUERIES]
    for name in names:
        registry.QUERIES[name](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(max(1, reruns)):
        for name in names:
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[name].append(round(time.perf_counter() - t0, 3))
    spark.stop()
    for name, t_prev, t_now in flagged:
        times = runs.get(name, [])
        med = round(statistics.median(times), 3) if times else None
        if med is None:
            verdict = "not-rerunnable"
        elif t_prev and med / t_prev <= threshold:
            verdict = "ambient-noise"
        else:
            verdict = "confirmed-regression"
        record["rows"].append(
            {
                "query": name,
                "t_prev": t_prev,
                "t_now": t_now,
                "rerun_times": times,
                "rerun_median": med,
                "verdict": verdict,
            }
        )
    return record


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("baseline", help="older bench JSON")
    ap.add_argument("current", help="newer bench JSON")
    ap.add_argument("-t", "--threshold", type=float, default=1.5,
                    help="flag ratio above this (default 1.5)")
    ap.add_argument("--adjudicate", default=None, metavar="OUT_JSON",
                    help="re-time every flagged query in-process and write "
                         "the machine adjudication record to OUT_JSON")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1",
                    help="data dir for --adjudicate reruns")
    ap.add_argument("--reruns", type=int, default=3,
                    help="interleaved rerun passes per flagged query")
    ap.add_argument("--expect-scale", type=float, default=None,
                    help="scale-gate mode: `current` ran on N x the data of "
                         "`baseline` (e.g. 10 for sf1 vs sf0.1); a query is "
                         "flagged when its time grew more than N x threshold, "
                         "i.e. worse than linear-in-data by the threshold "
                         "margin — the per-query superlinear-scaling gate")
    args = ap.parse_args(argv)

    base = load_bench(args.baseline)
    new = load_bench(args.current)
    threshold = args.threshold
    if args.expect_scale:
        threshold = args.expect_scale * args.threshold
    rows, flagged = compare(base, new, threshold)

    w = max(len(r[0]) for r in rows) if rows else 10
    print(f"{'query':<{w}}  {'base':>8}  {'now':>8}  {'ratio':>6}  flag")
    for name, t_base, t_new, ratio, mark in sorted(rows):
        tb = f"{t_base:.3f}" if t_base is not None else "-"
        tn = f"{t_new:.3f}" if t_new is not None else "-"
        rt = f"{ratio:.2f}x" if ratio is not None else "-"
        print(f"{name:<{w}}  {tb:>8}  {tn:>8}  {rt:>6}  {mark}")
    tb, tn = base.get("value"), new.get("value")
    if tb and tn:
        print(f"{'TOTAL':<{w}}  {tb:>8.3f}  {tn:>8.3f}  {tn / tb:>5.2f}x")
    if args.adjudicate:
        flagged_rows = [
            (name, t_base, t_new)
            for name, t_base, t_new, ratio, mark in rows
            if mark == "REGRESSION"
        ]
        record = adjudicate(
            flagged_rows, args.sf_dir, args.reruns, threshold,
            args.baseline, args.current,
        )
        with open(args.adjudicate, "w", encoding="utf-8") as f:
            json.dump(record, f, indent=2)
        print(f"adjudication -> {args.adjudicate} "
              f"({len(record['rows'])} rows)", file=sys.stderr)
        for r in record["rows"]:
            print(f"  {r['query']}: median {r['rerun_median']}s vs "
                  f"prev {r['t_prev']}s -> {r['verdict']}", file=sys.stderr)
        # reruns settle the question; exit red only on confirmed rows
        return 1 if any(
            r["verdict"] == "confirmed-regression" for r in record["rows"]
        ) else 0
    if flagged:
        kind = "scaled superlinearly" if args.expect_scale else "regressed"
        print(f"\n{flagged} quer{'y' if flagged == 1 else 'ies'} {kind} "
              f">{threshold}x", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
