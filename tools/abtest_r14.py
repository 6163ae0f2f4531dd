"""Round-14 optimization A/B experiments, run through the r13 harness
(tools/abtest_r13.py `run`: bench methodology, row-identity gate).

The r13 experiment file keeps the SHIPPED query as one variant; after the
r13 tails moved to `sorts.order_by_bounded`, its tpch_q1/join_multiway/
sim_topk experiments compare the shipped form against itself. This file
restores the retired orderBy tails as explicit variants so the bounded
coalesce(1) tail can be re-measured at ANY SF (VERDICT r13 item 3: 10x
rehearsal evidence under the order_by_bounded tails — point
SPARK_GRAFT_SF_DIR at tools/scale_rehearsal.py's /tmp/scale_sf1).

Usage: python tools/abtest_r14.py <experiment> [reps]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from abtest_r13 import run


def exp_tpch_q1_tail():
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
        all_queries,
    )

    shipped = all_queries()["tpch_q1"]

    def orderby_tail(spark, sf_dir):
        # the pre-r13 presentation tail: range exchange + sampling job
        df = shipped(spark, sf_dir)
        # shipped plan ends coalesce(1).sortWithinPartitions — re-sorting
        # the 6-row output through a full orderBy reproduces the old tail
        # ON TOP of the shipped body; instead rebuild the tail from the
        # aggregate by dropping into a fresh orderBy over the same frame.
        return df.orderBy("l_returnflag", "l_linestatus")

    return {"shipped_bounded": shipped, "orderby_tail": orderby_tail}


def exp_join_multiway_tail():
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
        all_queries,
    )

    shipped = all_queries()["join_multiway"]

    def orderby_tail(spark, sf_dir):
        return shipped(spark, sf_dir).orderBy("n_name")

    return {"shipped_bounded": shipped, "orderby_tail": orderby_tail}


def exp_sim_topk_tail():
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
        all_queries,
    )

    shipped = all_queries()["sim_topk_bruteforce"]

    def orderby_tail(spark, sf_dir):
        return shipped(spark, sf_dir).orderBy("query_id", "rnk")

    return {"shipped_bounded": shipped, "orderby_tail": orderby_tail}


EXPERIMENTS = {
    "tpch_q1_tail": exp_tpch_q1_tail,
    "join_multiway_tail": exp_join_multiway_tail,
    "sim_topk_tail": exp_sim_topk_tail,
}


if __name__ == "__main__":
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    run(EXPERIMENTS[name](), reps=reps)
