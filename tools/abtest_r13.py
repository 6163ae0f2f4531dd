"""Round-13 optimization A/B harness.

Compares query variants under the EXACT bench methodology (prepared
physical plan, shuffle map outputs invalidated per rep, block reps with
switch-warmup drops, median reported) so a variant's number is directly
comparable to the bench series. Also verifies the variants are
ROW-IDENTICAL (collected, order-sensitive) before timing — an
optimization that changes output is a regression, not a win.

Usage: python tools/abtest_r13.py <experiment> [reps]
Experiments live in EXPERIMENTS below; each returns {name: builder}
where builder(spark, sf_dir) -> DataFrame. The first variant is the
shipped query (control).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import get_spark

import bench

from common import sf_dir as _default_sf_dir

SF_DIR = _default_sf_dir()


def _median_block(prep, reps: int) -> list[float]:
    ts = []
    for i in range(reps + 2):
        t0 = time.perf_counter()
        bench._run_prepared(prep)
        if i > 1:
            ts.append(time.perf_counter() - t0)
    return ts


def run(variants: dict, reps: int = 7, passes: int = 3, check_rows: bool = True):
    spark = get_spark("abtest_r13")
    qs = {}
    # Row-identity check (order-sensitive collect).
    rows0 = None
    for name, fn in variants.items():
        df = fn(spark, SF_DIR)
        if check_rows:
            rows = [tuple(r) for r in df.collect()]
            if rows0 is None:
                rows0 = rows
                print(f"{name}: {len(rows)} rows (control)")
            else:
                same_set = sorted(map(repr, rows)) == sorted(map(repr, rows0))
                same_order = rows == rows0
                print(
                    f"{name}: {len(rows)} rows, set-identical={same_set}, "
                    f"order-identical={same_order}"
                )
                if not same_set:
                    raise SystemExit(f"VARIANT {name} CHANGES RESULTS — abort")
        qs[name] = bench._prepare(df)
        bench._run_prepared(qs[name])  # warmup

    timings = {n: [] for n in variants}
    for _ in range(passes):
        for name in variants:
            timings[name].extend(_median_block(qs[name], reps))
    print()
    for name, ts in timings.items():
        ts.sort()
        med = ts[len(ts) // 2]
        print(
            f"{name:40s} median {med*1000:8.1f} ms   "
            f"min {ts[0]*1000:7.1f}  p75 {ts[int(len(ts)*0.75)]*1000:7.1f}  n={len(ts)}"
        )
    spark.stop()


# --- experiments ---


def exp_window_topk():
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
        all_queries,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import (
        load_table,
    )

    def control(spark, sf_dir):
        # The pre-r13 formulation: hash-exchange window + presentation
        # orderBy (kept here as the A/B control after the gate moved to
        # the ordered single-exchange form).
        from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
            windows,
        )

        orders = load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderkey", "o_totalprice"
        )
        return windows.top_k_per_group(
            orders,
            ["o_custkey"],
            [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
            k=3,
        ).orderBy("o_custkey", "rnk")

    def range_once(spark, sf_dir):
        # The shipped r13 form (windows.top_k_per_group_ordered): one range
        # exchange establishes BOTH the window clustering and the
        # presentation order.
        from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
            all_queries,
        )

        return all_queries()["window_topk_per_group"](spark, sf_dir)

    return {"control": control, "range_once": range_once}


def exp_text_quality():
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
        all_queries,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import (
        load_table,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.functions import (
        normalize_text,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators.text import (
        LANG_PROFILES,
        _count_in,
    )

    control = all_queries()["text_quality"]

    _KEEP = "abcdefghijklmnopqrstuvwxyz0123456789 "

    def translate_counts(spark, sf_dir):
        # punct/digit counts via single-pass translate() instead of two
        # regexp_replace passes: translate removes exactly the same ASCII
        # char sets the regexes match, so counts are value-identical.
        df = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        norm_stage = df.select("*", normalize_text("text").alias("__norm"))
        ws_stage = norm_stage.select(
            "*", F.split(F.col("__norm"), " ").alias("__ws")
        )
        base = ws_stage.select(
            "*",
            F.length(F.col("__norm")).alias("__nc"),
            F.size(F.col("__ws")).alias("__nw"),
            F.length(F.translate(F.col("__norm"), _KEEP, "")).alias("__punct"),
            (
                F.length(F.col("__norm"))
                - F.length(F.translate(F.col("__norm"), "0123456789", ""))
            ).alias("__digits"),
            _count_in(F.col("__ws"), LANG_PROFILES["en"]).alias("__stop"),
        )
        n_chars, n_words = F.col("__nc"), F.col("__nw")
        punct_ratio = F.col("__punct") / n_chars
        digit_ratio = F.col("__digits") / n_chars
        stop_ratio = F.col("__stop") / n_words
        len_norm = F.least(n_words.cast("double"), F.lit(100.0)) / F.lit(100.0)
        score = (
            F.lit(0.4) * stop_ratio
            + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
            + F.lit(0.2) * len_norm
            + F.lit(0.1) * (F.lit(1.0) - digit_ratio)
        )
        return base.select(
            "doc_id",
            n_chars.cast("bigint").alias("q_chars"),
            n_words.cast("bigint").alias("q_words"),
            (n_chars / n_words).alias("q_mean_word_len"),
            punct_ratio.alias("q_punct_ratio"),
            digit_ratio.alias("q_digit_ratio"),
            stop_ratio.alias("q_stop_ratio"),
            score.alias("q_score"),
        ).orderBy("doc_id")

    return {"control": control, "translate_counts": translate_counts}


def exp_tpch_q1():
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
        all_queries,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads.relational import (
        q_tpch_q1,
    )

    control = all_queries()["tpch_q1"]

    def coalesce_sort(spark, sf_dir):
        # group count bounded by |returnflag| x |linestatus| (6): the final
        # presentation sort can be coalesce(1) + local sort instead of a
        # range exchange — same rule as query.py execute_group_by
        # low_cardinality.
        df = control(spark, sf_dir)
        # Rebuild without the trailing orderBy: easiest is to re-derive
        # from the plan's child — instead just re-implement the tail here.
        from pyspark.sql import functions as F
        from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads.relational import (
            _t,
        )
        from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
            aggregates,
        )

        li = _t(spark, sf_dir, "lineitem").where(
            F.col("l_shipdate") <= F.lit("1998-09-02")
        )
        disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        charge = disc_price * (1 + F.col("l_tax"))
        return (
            li.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").cast("double").alias("sum_qty"),
                aggregates.exact_money_sum("l_extendedprice").alias("sum_base_price"),
                F.sum(disc_price.cast("decimal(18,4)")).cast("double").alias("sum_disc_price"),
                F.sum(charge.cast("decimal(18,6)")).cast("double").alias("sum_charge"),
                (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
                (
                    F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                    .cast("double")
                    / F.count(F.lit(1))
                ).alias("avg_price"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .coalesce(1)
            .sortWithinPartitions("l_returnflag", "l_linestatus")
        )

    return {"control": control, "coalesce_sort": coalesce_sort}


def exp_join_multiway():
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
        all_queries,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import (
        load_table,
    )

    control = all_queries()["join_multiway"]

    def coalesce_sort(spark, sf_dir):
        lineitem = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        customer = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey"
        )
        nation = load_table(spark, sf_dir, "nation")
        region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
        revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
            .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            .groupBy("n_name")
            .agg(
                F.sum(revenue.cast("decimal(18,4)")).cast("double").alias("revenue"),
                F.count(F.lit(1)).alias("n_items"),
            )
            .coalesce(1)
            .sortWithinPartitions("n_name")
        )

    return {"control": control, "coalesce_sort": coalesce_sort}


def exp_sim_topk():
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
        all_queries,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import (
        load_table,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
        similarity,
    )

    control = all_queries()["sim_topk_bruteforce"]

    def coalesce_sort(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.where(F.col("vec_id") < 10)
        return (
            similarity.cosine_topk_exact_baseline(
                emb, queries, "vec_id", "embedding", k=5
            )
            .coalesce(1)
            .sortWithinPartitions("query_id", "rnk")
        )

    return {"control": control, "coalesce_sort": coalesce_sort}


def exp_dedup_minhash():
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
        all_queries,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import (
        load_table,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
        dedup,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators.dedup import (
        _band_entries,
        cap_bucket_size,
        minhash_signatures,
    )

    control = all_queries()["dedup_minhash_lsh"]

    def range_distinct(spark, sf_dir):
        # One range exchange serves BOTH the candidate-pair dedup
        # (RangePartitioning(id_a,id_b) satisfies the distinct's
        # ClusteredDistribution) and the presentation order (broadcast
        # joins + filter preserve the partitioning; a final in-partition
        # sort yields the global (id_a,id_b) order) — drops the separate
        # range exchange the gate's orderBy planned.
        df = load_table(spark, sf_dir, "documents")
        num_hashes, bands, shingle_k, threshold = 16, 4, 3, 0.5
        sig = minhash_signatures(df, "doc_id", "text", num_hashes, shingle_k).cache()
        band_entries = _band_entries(sig, "doc_id", num_hashes, bands)
        a = band_entries.alias("a")
        b = band_entries.alias("b")
        candidates = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.__id") < F.col("b.__id")),
            )
            .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
            .repartitionByRange("id_a", "id_b")
            .distinct()
        )
        sa = sig.select(F.col("doc_id").alias("id_a"), F.col("signature").alias("sig_a"))
        sb = sig.select(F.col("doc_id").alias("id_b"), F.col("signature").alias("sig_b"))
        est = F.aggregate(
            F.zip_with(
                F.col("sig_a"),
                F.col("sig_b"),
                lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ) / F.lit(float(num_hashes))
        return (
            candidates.join(F.broadcast(sa), "id_a")
            .join(F.broadcast(sb), "id_b")
            .select("id_a", "id_b", est.alias("est_jaccard"))
            .where(F.col("est_jaccard") >= threshold)
            .sortWithinPartitions("id_a", "id_b")
        )

    return {"control": control, "range_distinct": range_distinct}


EXPERIMENTS = {
    "window_topk": exp_window_topk,
    "text_quality": exp_text_quality,
    "tpch_q1": exp_tpch_q1,
    "join_multiway": exp_join_multiway,
    "sim_topk": exp_sim_topk,
    "dedup_minhash": exp_dedup_minhash,
}


if __name__ == "__main__":
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    run(EXPERIMENTS[name](), reps=reps)
