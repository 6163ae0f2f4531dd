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
REPS = int(os.environ.get("BENCH_REPS", "5"))
# The driver's testdata ships one row group per file, which pins every scan
# to a single task (parquet splits at row-group boundaries). The reference
# benchmark runs against its own 50k-row row-group layout
# (cae/benches/benchmark.cpp:42-95), so for parity the bench relayouts the
# inputs into multi-file tables (untimed, reported in the JSON) unless
# BENCH_RELAYOUT=0. Correctness checks always use the driver layout.
RELAYOUT = os.environ.get("BENCH_RELAYOUT", "1") != "0"

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
    # Force full materialization of every column via the noop sink — count()
    # would let Catalyst prune every column and measure a metadata scan.
    # Matches the reference benches, which materialize whole batches
    # (benchmark.cpp:104-118).
    df.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    return elapsed, -1


def _row_count(fn, spark) -> int:
    return fn(spark, SF_DIR).count()


def _relayout(spark, src_dir: str) -> str:
    """Rewrite each table as a multi-file parquet dir (~512 KB splits) so
    local cores scan in parallel — the local-mode analogue of the 128 MB
    row groups a production table would have. Untimed."""
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import (
        TABLES,
        table_path,
    )

    sf = src_dir.rstrip("/").split("sf")[-1]
    dst = f"/tmp/bench_layout_sf{sf}"
    done_marker = os.path.join(dst, "_LAYOUT_DONE")
    if not os.path.exists(done_marker):
        for t in TABLES:
            src = table_path(src_dir, t)
            # ~128 KB splits: small compute-heavy tables (documents,
            # embeddings) still fan out across cores.
            parts = max(1, min(32, os.path.getsize(src) // (128 * 1024)))
            df = spark.read.parquet(src)
            df.repartition(int(parts)).write.mode("overwrite").parquet(
                os.path.join(dst, f"{t}.parquet")
            )
        with open(done_marker, "w") as f:
            f.write("ok")
    return dst


def main() -> int:
    global SF_DIR
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    qs = all_queries()
    src_dir = SF_DIR
    if RELAYOUT:
        SF_DIR = _relayout(spark, SF_DIR)
    # Warm the JVM + file cache with one untimed pass of the cheapest query.
    qs["parity_aggregate"](spark, SF_DIR).count()

    results: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        times = []
        for _ in range(REPS):
            elapsed, _ = _run_once(fn, spark)
            times.append(elapsed)
        times.sort()
        results[name] = round(times[len(times) // 2], 4)  # median
        rows[name] = _row_count(fn, spark)

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
        "relayout": {
            "enabled": RELAYOUT,
            "source": src_dir,
            "note": "multi-file split (~128KB) for task parallelism; "
            "reference benches its own 50k-row row-group layout",
        },
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
