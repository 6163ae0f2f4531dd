"""Scale rehearsal: run the heaviest gate queries on a synthetic sf1
(10× sf0.1) to demonstrate the skew caps / AQE / partitioning actually
engage on data big enough to matter (VERDICT r4 item 5).

sf1 is built by unioning 10 KEY-SHIFTED copies of the driver's sf0.1
tables — ids/users/customers/suppliers shift per copy so key cardinality
scales with volume (10× groups, 10× graph nodes), while text is suffixed
per copy so the near-dup structure stays realistic (every doc gains 10
near-dup siblings — the boilerplate-heavy shape the LSH bucket caps are
for). Events keep their time range (10× busier service, same windows) —
the streaming state stays at its real keyspace while input volume scales.

Methodology matches bench.py: prepared plan, 2 warmup reps, median of 3
back-to-back timed reps (steady state). Streaming runs end-to-end per rep.

Usage: python tools/scale_rehearsal.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import get_spark
from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import all_queries

SRC = "/tmp/bench_layout_sf0.1"  # bench relayout of the driver sf0.1
RAW = "/root/testdata/sf0.1"
DST = "/tmp/scale_sf1"
COPIES = 10
TARGETS = [
    "dedup_minhash_lsh",
    "stream_tumbling_window",
    "window_topk_per_group",
    "text_bm25",
    "pagerank",
    # round-5 heavy additions
    "bpe_train",
    "basket_rules",
    "events_ewma",
]

# Queries whose construction itself executes jobs (streaming runs,
# eager localCheckpoints in iterative training) — rebuilt per rep.
EAGER = {"stream_tumbling_window", "bpe_train"}

# (table, [(col, shift_base)], text_col) — shift_base scales each copy's
# key space past the original's range.
REPLICATION = {
    "documents": ([("doc_id", 10**9)], "text"),
    "events": ([("event_id", 10**12), ("user_id", 10**9)], None),
    "orders": ([("o_orderkey", 10**12), ("o_custkey", 10**9)], None),
    "lineitem": (
        [("l_orderkey", 10**12), ("l_partkey", 10**9), ("l_suppkey", 10**9)],
        None,
    ),
}


def build_sf1(spark) -> None:
    marker = os.path.join(DST, "_DONE")
    if os.path.exists(marker):
        return
    src = SRC if os.path.exists(SRC) else RAW
    for table, (shifts, text_col) in REPLICATION.items():
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        parts = []
        for i in range(COPIES):
            c = df
            for col, base in shifts:
                c = c.withColumn(col, F.col(col) + F.lit(i * base))
            if text_col and i > 0:
                c = c.withColumn(
                    text_col,
                    F.concat(F.col(text_col), F.lit(f" copyv{i}")),
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(DST, f"{table}.parquet")
        )
    # tables the target queries don't read: symlink-by-copy from src so
    # loaders that touch them (schema checks) still resolve
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "embeddings",
    ):
        spark.read.parquet(os.path.join(src, f"{t}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(DST, f"{t}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")


def time_query(spark, qs, name: str, sf_dir: str, eager: bool) -> float:
    fn = qs[name]
    times = []
    if eager:
        fn(spark, sf_dir)  # warmup
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
    else:
        df = fn(spark, sf_dir)
        for _ in range(2):  # warmup incl. switch rewarm
            df.write.format("noop").mode("overwrite").save()
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
    times.sort()
    return round(times[len(times) // 2], 3)


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "scale_rehearsal.json"
    spark = get_spark("scale_rehearsal")
    build_sf1(spark)
    qs = all_queries()
    src = SRC if os.path.exists(SRC) else RAW
    report = {}
    for name in TARGETS:
        eager = name in EAGER
        t_small = time_query(spark, qs, name, src, eager)
        t_big = time_query(spark, qs, name, DST, eager)
        rows_small = qs[name](spark, src).count()
        rows_big = qs[name](spark, DST).count()
        report[name] = {
            "sf0.1_sec": t_small,
            "sf1_sec": t_big,
            "ratio": round(t_big / t_small, 2) if t_small else None,
            "rows_sf0.1": rows_small,
            "rows_sf1": rows_big,
        }
        print(
            f"{name:28s} sf0.1 {t_small:7.3f}s  sf1 {t_big:7.3f}s  "
            f"x{report[name]['ratio']}  rows {rows_small}->{rows_big}",
            flush=True,
        )
    with open(out_path, "w") as f:
        json.dump({"copies": COPIES, "queries": report}, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
