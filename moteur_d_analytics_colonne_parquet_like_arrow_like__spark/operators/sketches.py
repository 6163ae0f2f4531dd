"""Frequency sketches: count-min heavy hitters as pure DataFrame algebra.

The classic streaming sketch (Cormode & Muthukrishnan, "An Improved Data
Stream Summary: The Count-Min Sketch and its Applications", J. Algorithms
2005) re-expressed Spark-first: the d×w counter matrix IS a grouped
aggregation over (row, bucket) pairs, built in one shuffle whose
cardinality is at most d·w regardless of input size — the map-side partial
aggregation does the sketch compression, so at 100 TB each executor ships
at most d·w counters per partition, never the token stream.

Because every hash is the repo's md5-based stable family (functions.
stable_hash60 — reproducible in DuckDB SQL), the whole sketch, the
per-item estimates, and the error-bound booleans are deterministic and
bit-for-bit oracle-checkable: this is the sketch counterpart of the
``agg_approx_sketches`` pattern (exact values + bounded-error booleans).

Reference parity: the reference engine has no sketch surface; this extends
SURVEY.md §2.5 the way its aggregate block would grow next.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import stable_hash60


def cms_bucket(item: Column, row: int, width: int) -> Column:
    """Bucket index of ``item`` in CMS row ``row``: the stable 60-bit hash
    of ``"<row>:<item>"`` reduced mod the row width. Seeding by prefix
    keeps the d rows pairwise-independent enough in practice while staying
    a one-expression DuckDB equivalent."""
    return F.pmod(
        stable_hash60(F.concat(F.lit(f"{row}:"), item)), F.lit(width)
    ).cast("int")


def cms_build(
    items: DataFrame,
    item_col: str = "item",
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Build the d×w count-min counter matrix over ``items`` (one input row
    per occurrence). Output: (row, bucket, cnt) with at most depth·width
    rows. One explode (×depth) + one groupBy whose key space is the sketch
    itself — map-side combine collapses each partition to ≤ d·w partials
    before the shuffle."""
    entries = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cms_bucket(F.col(item_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("e")
    )
    return entries.groupBy("e.row", "e.bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    queries: DataFrame,
    sketch: DataFrame,
    item_col: str = "item",
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for each row of ``queries``: the estimate is
    the MIN over the d rows of the item's bucket counter (never an
    underestimate; overestimate ≤ 2n/w per row with prob ≥ 1/2, so the min
    over d rows fails with prob ≤ 2^-d). The sketch is ≤ d·w rows —
    broadcast it; the probe is a narrow broadcast join, no shuffle of the
    query side."""
    probes = queries.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cms_bucket(F.col(item_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    )
    joined = probes.join(
        F.broadcast(sketch),
        (F.col("p.row") == sketch.row) & (F.col("p.bucket") == sketch.bucket),
    )
    others = [c for c in queries.columns]
    return joined.groupBy(*others).agg(F.min("cnt").alias("cms_est"))


def heavy_hitters_exact(
    items: DataFrame,
    item_col: str = "item",
    support_denom: int = 50,
) -> DataFrame:
    """Items occurring more than n/support_denom times (support > 1/denom),
    with exact counts: the two-phase groupBy count plus a one-row broadcast
    of the total — the exact baseline the sketch path is judged against.
    The threshold compare is integer-exact (cnt·denom > n)."""
    total = items.agg(F.count(F.lit(1)).alias("_n"))
    counts = items.groupBy(item_col).agg(F.count(F.lit(1)).alias("exact_cnt"))
    return (
        counts.join(F.broadcast(total))
        .where(F.col("exact_cnt") * support_denom > F.col("_n"))
        .select(item_col, "exact_cnt", F.col("_n").alias("n_total"))
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int = 64,
    salt: str = "kmv:",
) -> DataFrame:
    """Per-group KMV (k-minimum-values / bottom-k theta) sketch: the ``k``
    smallest stable 60-bit hashes of the group's distinct keys (Beyer et
    al., "On Synopses for Distinct-Value Estimation Under Multiset
    Operations", SIGMOD 2007 — the theta-sketch family's constructive
    core). Unlike HLL, KMV sketches support INTERSECTION estimates, and
    min-k is distributive: bottom-k(bottom-k(A) ∪ bottom-k(B)) ==
    bottom-k(A ∪ B), so persisted sketches merge exactly.

    Scale shape: one distinct on (group, hash) — combiner-friendly —
    then the bottom-k rank filter plans as WindowGroupLimit (Spark 3.5+
    pushes the per-group limit MAP-SIDE, so each task ships at most k
    rows per group, never the key stream; asserted in tests). Every
    hash is the repo's md5 family, so sketches, estimates, and merges
    are bit-identical in DuckDB SQL.

    Returns (group..., h, rn) with rn = 1..k ascending by hash.
    """
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"kmv_sketch requires k >= 2, got {k}")
    h = stable_hash60(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    distinct = df.select(*group_cols, h.alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc())
    return distinct.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )


# 2^60: the hash-space size that normalizes a KMV threshold to (0, 1].
KMV_SPACE = float(1 << 60)


def kmv_estimate(n_sk: Column, u_k: Column, k: int) -> Column:
    """Distinct-count estimate from a KMV sketch summary: exact when the
    group had fewer than ``k`` distinct keys (the sketch IS the set),
    else the classic (k-1) / normalized-k-th-minimum estimator."""
    return F.when(n_sk < k, n_sk.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_SPACE) / u_k.cast("double")
    )
