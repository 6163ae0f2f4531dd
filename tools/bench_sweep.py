"""Multi-scale benchmark sweep — the PySpark analog of the reference's
``cae/benches/run_multiple_benchmarks.py`` (which reruns benchmark.cpp at
several row counts and plots scalability).

Runs ``bench.py`` once per scale factor directory, collects the one-line
JSON each run prints, and writes ``bench_sweep.json`` with per-query
scalability ratios: wall seconds, marginal seconds (wall minus the fixed
local-mode job floor), and rows/sec where the query reports row counts.
The interesting number at 100 TB is the MARGINAL scaling slope — a query
whose marginal time grows ~linearly in SF is shuffle/scan bound and will
scale out; one that grows faster has a concentration point.

Usage: python tools/bench_sweep.py [out.json] [sf_dir ...]
Defaults: out=bench_sweep.json, sf_dirs=/root/testdata/sf{0.001,0.01,0.1}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def run_one(sf_dir: str) -> dict | None:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
        capture_output=True,
        text=True,
        env=env,
    )
    if proc.returncode != 0:
        print(f"bench failed for {sf_dir}: {proc.stderr[-500:]}", file=sys.stderr)
        return None
    # bench.py prints exactly one JSON line on stdout (last non-empty line)
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    print(f"no JSON line in bench output for {sf_dir}", file=sys.stderr)
    return None


def sweep(sf_dirs: list[str]) -> dict:
    runs: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        print(f"== bench {sf_dir}")
        r = run_one(sf_dir)
        if r is not None:
            runs[sf_dir] = r
    if not runs:
        raise SystemExit("no successful bench runs")

    # scalability: per query, [ (sf, wall, marginal, rows, rows_per_sec) ... ]
    queries = sorted({q for r in runs.values() for q in r.get("queries", {})})
    scal = {}
    for q in queries:
        pts = []
        for sf_dir, r in runs.items():
            wall = r.get("queries", {}).get(q)
            if wall is None:
                continue
            marginal = r.get("marginal_sec", {}).get(q)
            rows = r.get("rows", {}).get(q)
            pts.append(
                {
                    "sf": r.get("sf"),
                    "sf_dir": sf_dir,
                    "wall_sec": wall,
                    "marginal_sec": marginal,
                    "rows": rows,
                    "rows_per_sec": (
                        round(rows / wall) if rows and wall else None
                    ),
                }
            )
        pts.sort(key=lambda p: float(p["sf"] or 0))
        entry: dict = {"points": pts}
        # marginal scaling slope between the two largest SFs: ~1 is flat
        # (floor-bound), ~sf-ratio is linear, >> sf-ratio is super-linear
        if len(pts) >= 2 and pts[-2]["marginal_sec"] and pts[-1]["marginal_sec"]:
            entry["marginal_ratio_last_step"] = round(
                pts[-1]["marginal_sec"] / max(pts[-2]["marginal_sec"], 1e-9), 2
            )
        scal[q] = entry
    return {"runs": runs, "scalability": scal}


def main() -> int:
    args = sys.argv[1:]
    out = args[0] if args else "bench_sweep.json"
    sf_dirs = args[1:] or DEFAULT_SFS
    result = sweep([d for d in sf_dirs if os.path.isdir(d)])
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out} ({len(result['runs'])} runs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
