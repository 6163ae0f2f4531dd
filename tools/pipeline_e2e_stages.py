"""Composed-pipeline rehearsal (VERDICT r9 item 3): run the full curation
DAG — exact dedup → MinHash-capped near-dup → Gopher cut → mixture sample
→ sequence packing — as ONE job at sf0.1 and sf1, and attribute wall time
per stage by timing cumulative prefixes.

Methodology:
  * the COMPOSED number is one end-to-end execution of the final frame
    (exactly what the `pipeline_end_to_end` gate runs), timed after one
    warmup rep, median of 3;
  * per-stage shares come from cumulative-prefix runs (s1, s1+s2, …):
    marginal wall of stage k = prefix_k − prefix_{k−1}. Prefixes re-derive
    the whole lineage, which is the honest attribution for a lazy engine —
    a stage's marginal cost includes everything it forces upstream;
  * stage frames are rebuilt inside the timer (the components fixpoint
    localCheckpoints during plan BUILD — the scale_rehearsal EAGER rule);
  * shuffle write/read, spill, and input bytes for the composed run come
    from the Spark UI REST API (deltas of completed-stage totals around
    the run), so "peak shuffle" claims are measured, not asserted.

sf1 is the key-shifted 10× replica from tools/scale_rehearsal.py (each
doc gains 10 near-dup siblings — the boilerplate-heavy shape the LSH
bucket caps exist for, so stage 2's work scales super-linearly BY DESIGN
while the cap bounds it).

Usage: python tools/pipeline_e2e_stages.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import get_spark
from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads.pipeline2 import (
    e2e_funnel_flags,
    e2e_stage_frames,
)

STAGES = ["s1", "s2", "s3", "s4", "s5"]
STAGE_LABELS = {
    "s1": "exact_dedup",
    "s2": "near_dup_components",
    "s3": "gopher_cut",
    "s4": "mixture_sample",
    "s5": "pack_join",
}


def _ui_stages(spark) -> dict[int, dict]:
    """Completed stages keyed by (stageId, attemptId). Keyed — not
    summed — because the status store evicts old stages past
    spark.ui.retainedStages; a before/after TOTAL delta would subtract
    evicted stages' bytes and silently undercount (or go negative).
    Summing only the keys that appear AFTER but not BEFORE is
    eviction-proof: evictions remove old keys, never add new ones."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    data = json.load(urllib.request.urlopen(url))
    return {(s["stageId"], s["attemptId"]): s for s in data}


def _bytes_between(before: dict, after: dict) -> dict[str, int]:
    new = [s for k, s in after.items() if k not in before]
    return {
        "shuffle_write": sum(s["shuffleWriteBytes"] for s in new),
        "shuffle_read": sum(s["shuffleReadBytes"] for s in new),
        "spill_disk": sum(s["diskBytesSpilled"] for s in new),
        "spill_mem": sum(s["memoryBytesSpilled"] for s in new),
        "input_bytes": sum(s["inputBytes"] for s in new),
        "n_stages": len(new),
    }


def _run_once(spark, sf_dir: str, upto: str, cap: int | str) -> float:
    """Build the funnel fresh (ONLY up to the requested stage — the
    components fixpoint executes at plan build) and execute that prefix.
    The signature cache from minhash_lsh_pairs is cleared first so every
    rep pays the full lineage — the cost a fresh driver session pays."""
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    frames = e2e_stage_frames(spark, sf_dir, upto=upto, max_bucket_size=cap)
    frames[upto].write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _median3(spark, sf_dir: str, upto: str, cap: int | str) -> float:
    _run_once(spark, sf_dir, upto, cap)  # warmup
    times = sorted(_run_once(spark, sf_dir, upto, cap) for _ in range(3))
    return round(times[1], 3)


def measure(spark, sf_dir: str, cap: int | str = "advised") -> dict:
    # default tracks e2e_stage_frames (census-advised since r13)
    out: dict = {"cap": cap, "prefix_sec": {}, "marginal_sec": {}, "rows": {}}
    if cap == "advised":
        # record the integer the census resolves to — two runs on
        # different corpora (advised=2 vs advised=10) must be
        # distinguishable in the artifact (same fix pipeline_e2e_ab.py
        # carries as advised_cap). The census runs over the SAME s1
        # (exact-dedup survivor) banding space the composed stage uses.
        from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads.pipeline2 import (
            advised_bucket_cap,
        )

        out["advised_cap"] = advised_bucket_cap(
            e2e_stage_frames(spark, sf_dir, upto="s1")["s1"]
        )
    prev = 0.0
    for st in STAGES:
        sec = _median3(spark, sf_dir, st, cap)
        out["prefix_sec"][st] = sec
        out["marginal_sec"][STAGE_LABELS[st]] = round(sec - prev, 3)
        prev = sec
    # composed single-job metrics (= the s5 prefix, with byte deltas)
    before = _ui_stages(spark)
    wall = _run_once(spark, sf_dir, "s5", cap)
    after = _ui_stages(spark)
    bts = _bytes_between(before, after)
    out["composed_sec"] = round(wall, 3)
    out["composed_stages"] = bts.pop("n_stages")
    out["composed_bytes"] = bts
    # survivor counts from ONE membership-flags pass (the funnel-report
    # plan) instead of counting five nested frames — counting each frame
    # would re-derive the whole lineage, fixpoint included, per stage
    spark.catalog.clearCache()
    flags = e2e_funnel_flags(spark, sf_dir, max_bucket_size=cap)
    from pyspark.sql import functions as F

    row = flags.agg(
        F.count(F.lit(1)).alias("n1"),
        F.count_if(F.col("in2")).alias("n2"),
        F.count_if(F.col("in3")).alias("n3"),
        F.count_if(F.col("in4")).alias("n4"),
    ).collect()[0]
    out["rows"] = {
        "s1": row["n1"],
        "s2": row["n2"],
        "s3": row["n3"],
        "s4": row["n4"],
        "s5": row["n4"],
    }
    return out


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "pipeline_e2e_stages.json"
    spark = get_spark(
        "pipeline_e2e_stages", extra_conf={"spark.ui.enabled": "true"}
    )
    from scale_rehearsal import DST, RAW, SRC, build_sf1

    build_sf1(spark)
    src = SRC if os.path.exists(SRC) else RAW
    report = {}
    # The PRODUCTION composition (census-advised — what the
    # pipeline_end_to_end gate actually runs since the r13 default
    # flip) at both SFs, plus the pinned cap=4 arm at sf1 kept as the
    # measured recall-cliff exhibit: the 10x replica gives every doc 10
    # near-identical siblings, so a bucket cap below the genuine
    # cluster size swallows the very duplicates the stage exists to
    # find — the cap=4 rows show the survivors that cliff leaks.
    for label, d, cap in (
        ("sf0.1", src, "advised"),
        ("sf1", DST, "advised"),
        ("sf1_cap4_cliff", DST, 4),
    ):
        report[label] = measure(spark, d, cap)
        m = report[label]
        print(
            f"{label}: composed {m['composed_sec']}s  "
            f"marginals {m['marginal_sec']}  rows {m['rows']}",
            flush=True,
        )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
