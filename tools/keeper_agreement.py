"""Keeper-agreement audit: exact n-gram tier vs the LSH-fed twin
(VERDICT r10 item 1's "measured keeper-agreement rate").

Both `dedup_keep_best` (exact n-gram Jaccard >= 0.8 pairs) and
`dedup_keep_best_lsh` (since r12: MinHash 64/16 banding, est_jaccard
>= 0.8 threshold-matched to the exact tier, bucket cap 64 — VERDICT
r11 item 2) resolve near-dup clusters to their highest-quality member
through the SAME generator-agnostic `keep_best_per_cluster`.
This tool quantifies how much keeper choice changes when the pair
generator is swapped — the number that says what the 11.77x-cheaper
LSH feed costs in curation terms, not just recall terms.

Per doc clustered by BOTH tiers, compare the keeper it resolves to:

  agree_rate  = |docs with identical keeper| / |docs clustered by both|
  exact_only  = docs the exact tier clusters that LSH misses
                (LSH false negatives: banding/threshold recall)
  lsh_only    = docs LSH clusters that the exact tier does not
                (a too-low est threshold admits pairs below true J=0.8
                — a threshold-semantics difference, not an error; the
                r11 gate point est >= 0.5 measured 2,013 such docs at
                sf0.1, the shipped matched point 1,295)
  kept_flip   = docs the exact tier REMOVES (non-keeper members) that
                the LSH tier KEEPS, and vice versa — the corpus-level
                consequence of the disagreement

Usage: python tools/keeper_agreement.py [sf_dir] [out.json]
           [num_hashes bands est_threshold [max_bucket]]

Defaults to the SHIPPED gate operating point (r12 — VERDICT r11 item 2:
64 hashes / 16 bands / est >= 0.8 threshold-matched to the exact tier's
J >= 0.8 / cap 64); pass explicit params to reproduce the r11 table's
other rows (e.g. ``16 4 0.5 64`` for the retired r11 gate point).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import get_spark
from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
    dedup,
    text,
)
from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import (
    load_table,
)


def assignments(spark, docs, scored, pairs):
    """doc -> (label, keeper_id) for every doc in a cluster."""
    clusters = dedup.duplicate_clusters(pairs)
    best = dedup.keep_best_per_cluster(clusters, scored, "doc_id", "q_score")
    return clusters.join(best.select("label", "keeper_id"), "label").select(
        F.col("node").alias("doc_id"), "label", "keeper_id"
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "keeper_agreement.json"
    num_hashes = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    bands = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    est_threshold = float(sys.argv[5]) if len(sys.argv) > 5 else 0.8
    max_bucket = int(sys.argv[6]) if len(sys.argv) > 6 else 64
    spark = get_spark("keeper_agreement")
    docs = load_table(spark, sf_dir, "documents")
    scored = text.quality_features(
        docs.select("doc_id", "text"), "text"
    ).select("doc_id", "q_score")

    exact = assignments(
        spark,
        docs,
        scored,
        dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", shingle_k=3, threshold=0.8
        ),
    ).cache()
    lsh = assignments(
        spark,
        docs,
        scored,
        dedup.minhash_lsh_pairs(
            docs,
            "doc_id",
            "text",
            num_hashes=num_hashes,
            bands=bands,
            shingle_k=3,
            threshold=est_threshold,
            max_bucket_size=max_bucket,
        ),
    ).cache()

    e = exact.select(
        "doc_id", F.col("keeper_id").alias("keeper_exact")
    )
    l = lsh.select("doc_id", F.col("keeper_id").alias("keeper_lsh"))
    joined = e.join(l, "doc_id", "full_outer").cache()

    both = joined.where(
        F.col("keeper_exact").isNotNull() & F.col("keeper_lsh").isNotNull()
    )
    n_both = both.count()
    n_agree = both.where(
        F.col("keeper_exact") == F.col("keeper_lsh")
    ).count()
    n_exact_only = joined.where(F.col("keeper_lsh").isNull()).count()
    n_lsh_only = joined.where(F.col("keeper_exact").isNull()).count()

    # corpus-level keep/remove flips among docs both tiers cluster:
    # removed by exact (doc != its exact keeper) but kept by LSH
    # (doc == its LSH keeper), and the reverse.
    flip_kept_by_lsh = both.where(
        (F.col("doc_id") != F.col("keeper_exact"))
        & (F.col("doc_id") == F.col("keeper_lsh"))
    ).count()
    flip_removed_by_lsh = both.where(
        (F.col("doc_id") == F.col("keeper_exact"))
        & (F.col("doc_id") != F.col("keeper_lsh"))
    ).count()

    report = {
        "sf_dir": sf_dir,
        "docs_clustered_exact": n_both + n_exact_only,
        "docs_clustered_lsh": n_both + n_lsh_only,
        "docs_clustered_both": n_both,
        "keeper_agree": n_agree,
        "keeper_agree_rate": round(n_agree / n_both, 4) if n_both else None,
        "exact_only_docs": n_exact_only,
        "lsh_only_docs": n_lsh_only,
        "flip_kept_by_lsh": flip_kept_by_lsh,
        "flip_removed_by_lsh": flip_removed_by_lsh,
        "params": {
            "exact": {"shingle_k": 3, "jaccard": 0.8},
            "lsh": {
                "num_hashes": num_hashes,
                "bands": bands,
                "shingle_k": 3,
                "est_jaccard": est_threshold,
                "max_bucket_size": max_bucket,
            },
        },
    }
    print(json.dumps(report, indent=1))
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
