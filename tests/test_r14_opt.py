"""Round-14 OPTIMIZATION-round pins: every rewrite here must be
value-identical to the formulation it replaced — these tests hold the old
formulation next to the new one so a regression in either direction is a
red test, not a silent result change."""

from __future__ import annotations

from pyspark.sql import functions as F

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
    dedup,
)


def _propagation_reference(pairs, id_a="id_a", id_b="id_b", max_iterations=50):
    """The pre-r14 duplicate_clusters: iterative min-label propagation —
    kept verbatim as the identity reference for the star-contraction
    rewrite (VERDICT r13 item 6)."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("node"), F.col("src").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_labels = edges.join(
            labels, edges.dst == labels.node
        ).select(F.col("src").alias("node"), "label")
        new_labels = (
            labels.union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


_GRAPHS = {
    # long chain: propagation needs diameter rounds, star O(log^2 n)
    "chain": [(i, i + 1) for i in range(1, 12)],
    # two cliques + an isolated pair + reversed/duplicate edges
    "cliques": [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    + [(20, 21), (21, 20), (20, 21)]
    + [(10 + a, 10 + b) for a in range(1, 4) for b in range(a + 1, 4)],
    # self-pairs only + a normal pair: the self-pair-only node must keep
    # its (node, node) row under the old contract
    "self_pairs": [(7, 7), (1, 2), (2, 2)],
    # star already: hub-and-spoke
    "hub": [(1, k) for k in range(2, 9)],
    # multi-component with shared magnitudes and out-of-order ids
    "mixed": [(5, 3), (3, 9), (100, 42), (42, 77), (8, 8), (6, 5)],
}


def test_agg_approx_sketches_split_distinct_identity(spark, sf_dir):
    """The r14 split form (sketch aggregate keyed by flag alone + an
    expand-free distinct count broadcast-joined back) must emit the same
    rows as the pre-r14 single-aggregate form: exact columns bit-identical
    (order-independent merges), booleans identical (approx values move
    within a fraction of their bound)."""
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import (
        load_table,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads.relational2 import (
        q_approx_sketches,
    )

    li = load_table(spark, sf_dir, "lineitem")
    tol = lambda exact: F.greatest(F.abs(exact) * 0.05, F.lit(1.0))  # noqa: E731
    old = (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", 0.02).alias("_hll"),
            F.expr("percentile(l_quantity, 0.5)").alias("exact_p50"),
            F.percentile_approx("l_quantity", 0.5, 1000).alias("_p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("exact_p90_price"),
            F.percentile_approx("l_extendedprice", 0.9, 1000).alias("_p90"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("_hll") - F.col("exact_parts"))
                <= F.col("exact_parts") * 0.10
            ).alias("hll_within_bound"),
            "exact_p50",
            (
                F.abs(F.col("_p50") - F.col("exact_p50")) <= tol(F.col("exact_p50"))
            ).alias("p50_within_bound"),
            "exact_p90_price",
            (
                F.abs(F.col("_p90") - F.col("exact_p90_price"))
                <= tol(F.col("exact_p90_price"))
            ).alias("p90_within_bound"),
        )
        .orderBy("l_returnflag")
    )
    new = q_approx_sketches(spark, sf_dir)
    assert [tuple(r) for r in new.collect()] == [tuple(r) for r in old.collect()]


def test_duplicate_clusters_star_contraction_identity(spark):
    """The star-contraction duplicate_clusters must reproduce the
    propagation reference's (node, label) rows EXACTLY on adversarial
    graph shapes — chains, cliques, self-pairs, hubs, multi-component."""
    for name, edges in _GRAPHS.items():
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        ref = sorted(
            tuple(r) for r in _propagation_reference(pairs).collect()
        )
        new = sorted(
            tuple(r) for r in dedup.duplicate_clusters(pairs).collect()
        )
        assert new == ref, f"graph {name}: {new} != {ref}"
        # the star entry point shares the fixpoint on self-loop-free graphs
        if all(a != b for a, b in edges):
            star = sorted(
                tuple(r)
                for r in dedup.duplicate_clusters_star(pairs).collect()
            )
            assert star == ref, f"graph {name} (star): {star} != {ref}"
