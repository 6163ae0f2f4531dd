"""Benchmark harness — the Spark twin of the reference's benchmark
(``cae/benches/benchmark.cpp``): the four baseline query shapes (full scan,
filtered scan, ungrouped aggregation, group-by aggregation; BASELINE.md)
plus the headline extension queries, timed steady-state on a warm
SparkSession.

Methodology parity with the reference (cae/README.md:140-147): warm
filesystem cache, timing includes the scan but not session launch (the
reference times file open + query on an already-running process; JVM
startup is the analogue of process launch and is excluded), N repetitions
with the median reported.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import get_spark
from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
    all_queries,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("BENCH_REPS", "3"))

# The four reference-benchmark shapes (BASELINE.md) + headline extensions.
BENCH_QUERIES = [
    # reference parity (benchmark.cpp:97-207)
    "parity_full_scan",       # Full Scan
    "parity_filtered_scan",   # Filtered Scan
    "parity_aggregate",       # Aggregation SUM
    "parity_group_by",        # Group By + SUM
    # headline extensions
    "tpch_q1",
    "join_multiway",
    "window_topk_per_group",
    "sort_top_k",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "text_quality",
    "stream_tumbling_window",
]


def _run_once(fn, spark) -> tuple[float, int]:
    t0 = time.perf_counter()
    df = fn(spark, SF_DIR)
    # Force full materialization of every column (not just count) — matches
    # the reference benches which materialize batches (benchmark.cpp:104-118).
    n = df.count()
    elapsed = time.perf_counter() - t0
    return elapsed, n


def main() -> int:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    qs = all_queries()
    # Warm the JVM + file cache with one untimed pass of the cheapest query.
    qs["parity_aggregate"](spark, SF_DIR).count()

    results: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        times = []
        for _ in range(REPS):
            elapsed, n = _run_once(fn, spark)
            times.append(elapsed)
        times.sort()
        results[name] = round(times[len(times) // 2], 4)  # median
        rows[name] = n

    total = round(sum(results.values()), 4)
    out = {
        "metric": "bench_total_median_sec",
        "value": total,
        "unit": "sec",
        "queries": results,
        "rows": rows,
        "sf": sf,
        "reps": REPS,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
