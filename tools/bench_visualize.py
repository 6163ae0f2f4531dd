"""Benchmark result visualizer — the PySpark analog of the reference's
``cae/benches/visualize_results.py`` (matplotlib bar charts of throughput,
rows/sec, and latency per benchmark).

This container has no matplotlib and no display, so the same three views
render as aligned terminal bar charts plus a ``bench_report.csv`` export
(the reference's benchmark.cpp also exports CSV, benchmark.cpp:233-276).

Usage:
  python tools/bench_visualize.py [BENCH.json]       single-run view
  python tools/bench_visualize.py --sweep SWEEP.json scalability view
"""

from __future__ import annotations

import csv
import json
import sys

BAR_WIDTH = 44


def _bar(value: float, vmax: float) -> str:
    n = 0 if vmax <= 0 else round(BAR_WIDTH * value / vmax)
    return "#" * n


def show_single(path: str, csv_out: str = "bench_report.csv") -> None:
    data = json.load(open(path))
    # the driver's BENCH_r{N}.json wraps bench.py's line under "parsed"
    if "parsed" in data and isinstance(data["parsed"], dict):
        data = data["parsed"]
    queries = data.get("queries", {})
    rows = data.get("rows", {})
    marginal = data.get("marginal_sec", {})
    floor = data.get("job_floor_sec")

    print(f"== {path}  sf={data.get('sf')}  total={data.get('value')}s"
          f"  job_floor={floor}s\n")

    # latency view (reference: plot_latency)
    vmax = max(queries.values(), default=0)
    print("-- wall seconds per query (lower is better)")
    for q, sec in sorted(queries.items(), key=lambda kv: -kv[1]):
        print(f"{q:28s} {sec:8.3f}s |{_bar(sec, vmax)}")

    # rows/sec view (reference: plot_rows_per_sec)
    rps = {
        q: rows[q] / queries[q]
        for q in queries
        if rows.get(q) and queries[q] > 0
    }
    if rps:
        vmax = max(rps.values())
        print("\n-- output rows/sec (higher is better)")
        for q, v in sorted(rps.items(), key=lambda kv: -kv[1]):
            print(f"{q:28s} {v:12,.0f} |{_bar(v, vmax)}")

    with open(csv_out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["query", "wall_sec", "marginal_sec", "rows", "rows_per_sec"])
        for q, sec in queries.items():
            w.writerow(
                [
                    q,
                    sec,
                    marginal.get(q, ""),
                    rows.get(q, ""),
                    round(rows[q] / sec) if rows.get(q) and sec > 0 else "",
                ]
            )
    print(f"\nwrote {csv_out}")


def show_sweep(path: str) -> None:
    data = json.load(open(path))
    scal = data.get("scalability", {})
    print(f"== {path}: marginal-seconds scaling per query "
          "(slope ~ SF ratio = linear scan/shuffle-bound; >> = hotspot)\n")
    hdr = None
    for q, entry in sorted(scal.items()):
        pts = entry["points"]
        if hdr is None:
            hdr = "  ".join(f"sf={p['sf']:<6}" for p in pts)
            print(f"{'query':28s} {hdr}  slope")
        cells = "  ".join(
            f"{(p['marginal_sec'] if p['marginal_sec'] is not None else float('nan')):7.3f}"
            for p in pts
        )
        slope = entry.get("marginal_ratio_last_step", "")
        print(f"{q:28s} {cells}  {slope}")


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "--sweep":
        show_sweep(args[1] if len(args) > 1 else "bench_sweep.json")
        return 0
    show_single(args[0] if args else "BENCH_r02.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
