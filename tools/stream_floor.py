#!/usr/bin/env python3
"""Decompose the bounded tumbling-window replay's ~1.0 s floor (VERDICT r8
item 1): the plan-shape dials are exhausted (state-partition A/B null in r8,
sort swap in r7), so measure WHERE the time goes instead — micro-batch
planner vs state-store commit vs sink vs query start/stop — straight from
the engine's own StreamingQueryProgress, plus wall-clock segments around it.

Variants A/B'd on the same session, interleave-free, median of --reps:

  base        HDFS-backed state store, checkpoint on /tmp (the bench shape)
  shm         checkpoint + state on /dev/shm (volatile is semantically fine:
              the memory sink itself is non-durable, so a bounded replay's
              checkpoint outliving the process buys nothing)
  rocksdb     RocksDBStateStoreProvider (jar present in this Spark)
  rocksdb_shm both

Usage: python tools/stream_floor.py [--sf-dir /tmp/bench_layout_sf0.1]
                                    [--reps 7] [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

VARIANTS = {
    "base": {"ckpt_root": "/tmp", "provider": None},
    "shm": {"ckpt_root": "/dev/shm", "provider": None},
    "rocksdb": {"ckpt_root": "/tmp", "provider": ROCKSDB},
    "rocksdb_shm": {"ckpt_root": "/dev/shm", "provider": ROCKSDB},
}


def run_once(spark, sf_dir: str, ckpt_root: str, provider: str | None) -> dict:
    """One full bounded replay, instrumented. Returns wall segments +
    the engine's per-batch durationMs / stateOperators metrics."""
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import (
        streaming as S,
    )

    seg: dict[str, float] = {}
    prev_conf = {}

    def set_conf(k, v):
        prev_conf[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)

    set_conf("spark.sql.shuffle.partitions", "4")
    set_conf("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    if provider:
        set_conf("spark.sql.streaming.stateStore.providerClass", provider)

    name = f"floor_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(ckpt_root, f"ckpt_{name}")
    t0 = time.perf_counter()
    try:
        sdf = S.tumbling_window_agg(S.events_stream(spark, sf_dir))
        seg["build"] = time.perf_counter() - t0

        t1 = time.perf_counter()
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        seg["start_call"] = time.perf_counter() - t1
        t2 = time.perf_counter()
        q.awaitTermination()
        seg["await"] = time.perf_counter() - t2

        t3 = time.perf_counter()
        out = (
            spark.table(name)
            .coalesce(1)
            .sortWithinPartitions("window_start", "event_type")
        )
        n = out.count()
        seg["sink_read"] = time.perf_counter() - t3
        seg["total"] = time.perf_counter() - t0

        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        for k, v in prev_conf.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        shutil.rmtree(ckpt, ignore_errors=True)
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass

    batches = []
    for p in progress:
        d = p.get("durationMs", {})
        ops = p.get("stateOperators", [])
        batches.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": d,
                "state": [
                    {
                        k: op.get(k)
                        for k in (
                            "operatorName",
                            "numRowsTotal",
                            "numRowsUpdated",
                            "allUpdatesTimeMs",
                            "commitTimeMs",
                            "stateMemory",
                        )
                    }
                    for op in ops
                ],
            }
        )
    return {"rows": n, "segments": seg, "batches": batches}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/bench_layout_sf0.1")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--json", default=None)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import (
        get_spark,
    )

    spark = get_spark("stream_floor")
    results: dict[str, dict] = {}
    for vname in args.variants.split(","):
        v = VARIANTS[vname]
        runs = []
        for i in range(args.reps + 1):  # +1 warmup, dropped
            r = run_once(spark, args.sf_dir, v["ckpt_root"], v["provider"])
            if i > 0:
                runs.append(r)
        med_total = statistics.median(r["segments"]["total"] for r in runs)
        med_seg = {
            k: round(statistics.median(r["segments"][k] for r in runs), 4)
            for k in runs[0]["segments"]
        }
        # median per-batch engine metrics (one data batch expected)
        def med_metric(path):
            vals = []
            for r in runs:
                tot = 0.0
                for b in r["batches"]:
                    if path[0] == "state":
                        for op in b["state"]:
                            x = op.get(path[-1])
                            if isinstance(x, (int, float)):
                                tot += x
                    else:
                        val = b.get(path[0], {}).get(path[-1])
                        if isinstance(val, (int, float)):
                            tot += val
                vals.append(tot)
            return round(statistics.median(vals), 1)

        engine = {
            "triggerExecution_ms": med_metric(["durationMs", "triggerExecution"]),
            "queryPlanning_ms": med_metric(["durationMs", "queryPlanning"]),
            "latestOffset_ms": med_metric(["durationMs", "latestOffset"]),
            "getBatch_ms": med_metric(["durationMs", "getBatch"]),
            "addBatch_ms": med_metric(["durationMs", "addBatch"]),
            "walCommit_ms": med_metric(["durationMs", "walCommit"]),
            "commitOffsets_ms": med_metric(["durationMs", "commitOffsets"]),
            "state_commit_ms": med_metric(["state", "commitTimeMs"]),
            "state_updates_ms": med_metric(["state", "allUpdatesTimeMs"]),
            "n_batches": statistics.median(len(r["batches"]) for r in runs),
        }
        results[vname] = {
            "median_total_sec": round(med_total, 4),
            "segments_sec": med_seg,
            "engine_ms": engine,
            "rows": runs[0]["rows"],
        }
        print(f"== {vname}: total {med_total:.3f}s  segments {med_seg}")
        print(f"   engine {engine}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
