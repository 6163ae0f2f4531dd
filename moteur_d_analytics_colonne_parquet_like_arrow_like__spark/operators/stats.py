"""Analytical statistics operators: Pareto/skyline frontier and an
all-pairs correlation matrix (reference: ABSENT — SURVEY.md §2 extension
surface; the reference's aggregate verbs stop at count/sum/min/max,
``cae/src/execution.cpp:214-260``).

Scale notes (the part that matters at 100 TB):

- ``pareto_frontier`` is the O(n log n) windowed formulation of the
  skyline query, not the O(n²) dominance anti-join: reduce the fact table
  to one row per x-value (map-side combinable groupBy), run a tiny running
  -max window over that reduced table, and broadcast the surviving frontier
  x-values back to the facts. The raw rows are touched exactly twice
  (reduce + final semi-join) and never pair-joined.
- ``correlation_matrix`` computes every pairwise Pearson correlation in
  ONE aggregation pass: ``corr`` is algebraic (sums / sums-of-squares /
  cross-products), so Spark map-side-combines all k·(k-1)/2 pairs
  simultaneously — a single scan of a 100 TB table yields the full matrix,
  vs k² separate scans for the naive loop.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, Window, functions as F


def pareto_frontier(
    df: DataFrame,
    x_col: str,
    y_col: str,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Rows not dominated on (maximize ``x_col``, maximize ``y_col``),
    standard skyline dominance: a row is dominated iff some other row is
    >= in both dimensions and strictly > in at least one. Classic skyline
    / Pareto-efficiency query (e.g. "orders that are the best price for
    their recency"); rows tied in both dimensions all survive.

    Plan shape: groupBy(x) → max(y) (combiner-friendly; output is at most
    |distinct x| rows), then a single unpartitioned running-max window over
    that *reduced* table ordered by x descending — ``best_above`` is the
    best y among strictly larger x (ROWS ... 1 PRECEDING skips the current
    x). A reduced row is on the frontier iff its y beats every y at larger
    x. Facts re-join the surviving (x, y-max) pairs by broadcast: no
    shuffle of the fact side, no pairwise dominance join anywhere.

    The unpartitioned window is over per-x maxima only — bounded by the
    x-value cardinality (dates, price bands...), not the row count; for a
    high-cardinality continuous x, bucket x first.
    """
    keep = keep_cols or df.columns
    dmax = df.groupBy(F.col(x_col).alias("__x")).agg(
        F.max(F.col(y_col)).alias("__ymax")
    )
    w = (
        Window.orderBy(F.col("__x").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        dmax.withColumn("__best_above", F.max("__ymax").over(w))
        .where(
            F.col("__best_above").isNull()
            | (F.col("__ymax") > F.col("__best_above"))
        )
        .select("__x", "__ymax")
    )
    out = df.join(
        F.broadcast(frontier),
        (df[x_col] == F.col("__x")) & (df[y_col] == F.col("__ymax")),
    )
    return out.select(*keep)


def correlation_matrix(
    df: DataFrame, cols: list[str], round_digits: int = 6
) -> DataFrame:
    """Pearson correlation of every unordered column pair, as rows
    ``(col_a, col_b, n, corr_r)`` with col_a < col_b lexicographically.

    One ``agg`` computes all pairs: each ``corr`` is an algebraic
    aggregate, so the whole matrix is a single map-side-combined pass over
    the table — the profiling primitive for feature selection over a
    100 TB training set. The one-row result is exploded to tidy pairs
    driver-free via an inline array → no collect.
    """
    pairs = [
        (a, b) for a, b in itertools.combinations(sorted(cols), 2)
    ]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for a, b in pairs:
        aggs.append(F.corr(F.col(a), F.col(b)).alias(f"__c_{a}_{b}"))
    one = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"__c_{a}_{b}").alias("c"),
            )
            for a, b in pairs
        ]
    )
    return (
        one.select(F.col("__n").alias("n"), F.explode(structs).alias("p"))
        .select(
            F.col("p.col_a").alias("col_a"),
            F.col("p.col_b").alias("col_b"),
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("p.c"), round_digits).alias("corr_r"),
        )
        .orderBy("col_a", "col_b")
    )


def equidepth_histogram(
    df: DataFrame, col: str, n_buckets: int = 10
) -> DataFrame:
    """Equi-depth (quantile) discretization with ties-keep-together
    semantics: every distinct value v gets ``bucket(v) = 1 +
    (rows_before_v * n_buckets) div n`` — pure integer arithmetic over
    EXCLUSIVE cumulative counts, so the assignment is deterministic and
    bit-identical on any engine (no percentile interpolation, no float
    division), and equal values never straddle a bucket boundary (unlike
    ``ntile``, whose tie placement depends on row order).

    Returns per-bucket rows (bucket, n_rows, n_values, min_v, max_v).

    Plan shape: groupBy(value) → count (ONE combiner-friendly shuffle of
    the raw rows), then the cumulative window runs over the *distinct
    values only* — bounded by value cardinality, not row count. For a
    continuous column, pre-round to the precision that matters (the gate
    query buckets prices rounded to 100s) exactly as a production
    discretizer would; the raw-cardinality alternative is a global sort.
    At 100 TB the heavy table is touched once, map-side combined.
    """
    counts = df.groupBy(F.col(col).alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = counts.withColumn(
        "cb", F.coalesce(F.sum("c").over(w), F.lit(0)).cast("bigint")
    )
    tot = counts.agg(F.sum("c").cast("bigint").alias("n"))
    bucketed = cum.crossJoin(F.broadcast(tot)).withColumn(
        "bucket", F.expr(f"(cb * {int(n_buckets)}) div n") + F.lit(1)
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .orderBy("bucket")
    )


def basket_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support_count: int = 2,
    max_basket_size: int = 100,
    top_n: int = 20,
) -> DataFrame:
    """Market-basket association rules over item pairs: for every ordered
    pair (a → b) co-occurring in >= ``min_support_count`` baskets, the
    classic measures — support (co-count / baskets), confidence
    (co-count / count(a)), and lift (confidence / P(b)) — ranked by
    (lift desc, pair asc), top ``top_n``.

    Scale shape: distinct (basket, item) first (combiner-friendly — the
    raw fact table is touched once), then the pair space comes from a
    self-join ON THE BASKET KEY, bounded per basket by basket size; the
    ``max_basket_size`` cap drops degenerate mega-baskets before pairing
    (the same hot-bucket guard as MinHash LSH). Item frequencies and the
    basket total are small aggregates broadcast back into the measures.
    All counts are exact integers; the three ratios are single divisions
    rounded at the end — cross-engine stable.
    """
    bi = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    sizes = bi.groupBy("b").agg(F.count(F.lit(1)).alias("__bn"))
    bi = bi.join(
        F.broadcast(sizes.where(F.col("__bn") <= max_basket_size)), "b"
    ).select("b", "i")
    n_baskets = bi.select("b").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_baskets")
    )
    freq = bi.groupBy("i").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    l, r = bi.alias("l"), bi.alias("r")
    pairs = (
        l.join(r, (F.col("l.b") == F.col("r.b")) & (F.col("l.i") != F.col("r.i")))
        .groupBy(
            F.col("l.i").alias("item_a"), F.col("r.i").alias("item_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
        .where(F.col("co") >= min_support_count)
    )
    fa = freq.select(F.col("i").alias("item_a"), F.col("cnt").alias("cnt_a"))
    fb = freq.select(F.col("i").alias("item_b"), F.col("cnt").alias("cnt_b"))
    out = (
        pairs.join(F.broadcast(fa), "item_a")
        .join(F.broadcast(fb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "co",
            F.round(F.col("co") / F.col("n_baskets"), 6).alias("support_r"),
            F.round(F.col("co") / F.col("cnt_a"), 6).alias("confidence_r"),
            F.round(
                (F.col("co") * F.col("n_baskets"))
                / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift_r"),
        )
    )
    return out.orderBy(
        F.col("lift_r").desc(),
        F.col("item_a").asc(),
        F.col("item_b").asc(),
    ).limit(top_n)


def quantile_chunks(
    df: DataFrame,
    order_col: str,
    n_chunks: int = 32,
    rel_err: float = 0.01,
    descending: bool = False,
):
    """A chunk-key Column for ``two_phase_rank_cumsum``: approximate
    equi-depth boundary cuts of ``order_col`` (one Greenwald-Khanna pass,
    driver gets only the ~``n_chunks`` cut literals) folded into an
    indicator-sum CASE ladder. Properties the two-phase scan needs:

    - pure function of the value (equal values always share a chunk),
    - monotone along the sort direction (``descending=True`` negates it),
    - BALANCED: each chunk holds ~rows/``n_chunks`` rows at ANY data
      distribution or scale — unlike fixed-granularity value bucketing,
      occupancy does not grow where the distribution concentrates.

    Where the boundaries land does not affect results (any split of a
    total order yields the same global prefix sums), so the quantile
    approximation error only perturbs balance, never values.
    """
    if n_chunks < 2:
        return F.lit(0)
    probs = [i / n_chunks for i in range(1, n_chunks)]
    cuts = df.select(F.col(order_col).cast("double").alias("__v")).stat.approxQuantile(
        "__v", probs, rel_err
    )
    c = F.lit(0)
    for cut in sorted(set(float(x) for x in cuts)):
        c = c + F.when(
            F.col(order_col).cast("double") > F.lit(cut), 1
        ).otherwise(0)
    return (F.lit(0) - c) if descending else c


def two_phase_rank_cumsum(
    df: DataFrame,
    order_col: str,
    chunk_col,
    *,
    partition_cols: list[str] | tuple = (),
    tiebreak_cols: list[str] | tuple = (),
    value_col: str | None = None,
    descending: bool = False,
    rn_col: str = "__rn",
    cum_col: str = "__cum",
) -> DataFrame:
    """Distributed global (or per-``partition_cols``) rank + inclusive
    cumulative sum WITHOUT an unbounded-partition window over the data —
    the generalized form of ``pack_sequences``' two-phase scan
    (operators/text.py): a ``Window.orderBy`` with no partition key
    collapses everything into ONE task; this computes the identical
    result in parallel.

    Phase 1: rows carry ``chunk_col`` (monotone along the sort order and
    a pure function of ``order_col`` — see ``quantile_chunks``); local
    row_number / running sum run per (partition, chunk), every task
    bounded by chunk occupancy. Phase 2: per-chunk counts/sums — ONE row
    per chunk — take an exclusive prefix over the chunk axis (a window
    over the chunk-level AGGREGATE, the documented-safe shape) and
    broadcast back; global rank = chunk base + local, cum = chunk base
    sum + local running sum. Bit-identical to the single-task window at
    any chunking because integer counts and decimal sums reassociate
    exactly.

    Requires the full sort key (``order_col`` + ``tiebreak_cols``) to be
    unique per partition group for a deterministic rank, same as any
    row_number use. Adds ``rn_col`` (bigint) and, when ``value_col`` is
    given, ``cum_col``.
    """
    sort_cols = [
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    ]
    sort_cols += [F.col(c).asc() for c in tiebreak_cols]
    pc = list(partition_cols)
    d = df.withColumn("__chunk", chunk_col)
    w_local = Window.partitionBy(*pc, "__chunk").orderBy(*sort_cols)
    proj = [F.row_number().over(w_local).alias("__lrn")]
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__cn")]
    if value_col is not None:
        w_frame = w_local.rowsBetween(Window.unboundedPreceding, 0)
        proj.append(F.sum(value_col).over(w_frame).alias("__lcum"))
        aggs.append(F.sum(value_col).alias("__cs"))
    local = d.select("*", *proj)
    tot = d.groupBy(*pc, "__chunk").agg(*aggs)
    w_ch = (
        Window.partitionBy(*pc)
        .orderBy(F.col("__chunk").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base_cols = [
        F.coalesce(F.sum("__cn").over(w_ch), F.lit(0))
        .cast("bigint")
        .alias("__bn")
    ]
    drop = ["__chunk", "__lrn", "__bn"]
    if value_col is not None:
        base_cols.append(F.sum("__cs").over(w_ch).alias("__bs"))
        drop += ["__lcum", "__bs"]
    bases = tot.select(*pc, "__chunk", *base_cols)
    out = local.join(F.broadcast(bases), [*pc, "__chunk"]).withColumn(
        rn_col, (F.col("__bn") + F.col("__lrn")).cast("bigint")
    )
    if value_col is not None:
        out = out.withColumn(
            cum_col,
            F.col("__lcum") + F.coalesce(F.col("__bs"), F.lit(0)),
        )
    return out.drop(*drop)


def normalize_scores_per_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    n_chunks: int = 64,
) -> DataFrame:
    """Per-group percentile-rank normalization: each row's score becomes
    its exact within-group percentile ``(rank - 1) / (n - 1)`` (0 for a
    1-row group), with ``id_col`` as the deterministic tie-breaker. The
    curation use: quality scores from different sources live on different
    scales; rank-normalizing per source makes one global threshold
    meaningful across the mixture.

    Scale shape: the obvious ``Window.partitionBy(source)`` is a trap —
    a handful of sources × billions of docs each means one multi-TB sort
    task per source. The rank instead rides ``two_phase_rank_cumsum``
    over score-quantile chunks: every task is bounded by ~rows/
    ``n_chunks``, the per-source chunk prefix runs over the chunk-level
    aggregate, and per-group counts broadcast back from their own tiny
    reduction. Integer rank over integer count — cross-engine exact
    except the final rounded division, bit-identical to the single-task
    window at any chunking.
    """
    chunk = quantile_chunks(df, score_col, n_chunks=n_chunks)
    tp = two_phase_rank_cumsum(
        df,
        score_col,
        chunk,
        partition_cols=[group_col],
        tiebreak_cols=[id_col],
        rn_col="__rk",
    )
    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__gn")
    )
    return tp.join(F.broadcast(counts), group_col).select(
        F.col(id_col),
        F.col(group_col),
        F.col(score_col),
        F.round(
            F.when(
                F.col("__gn") > 1,
                (F.col("__rk") - F.lit(1)) / (F.col("__gn") - F.lit(1)),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("pct_r"),
    )


def quantile_match_across_groups(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    n_chunks: int = 64,
) -> DataFrame:
    """Quantile normalization across groups: map each row's score onto
    the POOLED score distribution at the row's within-group percentile —
    the batch-effect correction a curation pipeline applies when
    sources' quality scores live on different scales and percentile
    RANKS (``normalize_scores_per_group``) aren't enough because
    downstream wants values on a common, data-shaped scale (the
    bioinformatics quantile-normalization / sklearn
    QuantileTransformer(output='empirical') shape).

    Semantics, all exact integers: within group g the row at rank r of
    n_g maps to pooled order statistic
    ``idx = ((r-1)·(N-1)) div (n_g-1) + 1`` (floor interpolation; a
    1-row group maps to idx 1), and ``matched`` is the pooled score at
    position idx under the same (score, id) total order. Cross-engine
    bit-exact — no doubles anywhere in the mapping; the product routes
    through DECIMAL(38,0) so a 10^12-row corpus cannot overflow the
    BIGINT product.

    Scale shape: BOTH ranks (per-group and pooled-global) ride
    ``two_phase_rank_cumsum`` over score-quantile chunks — the pooled
    global rank is exactly the unbounded-window trap
    ``plans.unsafe_global_windows`` rejects, computed safely. The
    final lookup is an equi-join on idx (data-proportional, shuffles
    once); group counts and the corpus count broadcast from their own
    reductions.

    Returns (id_col, group_col, score_col, matched) rows.
    """
    chunk = quantile_chunks(df, score_col, n_chunks=n_chunks)
    per_group = two_phase_rank_cumsum(
        df,
        score_col,
        chunk,
        partition_cols=[group_col],
        tiebreak_cols=[id_col],
        rn_col="__rg",
    )
    pooled = two_phase_rank_cumsum(
        df,
        score_col,
        chunk,
        tiebreak_cols=[id_col],
        rn_col="__pos",
    )
    ng = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__ng")
    )
    n = df.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    target = (
        per_group.join(F.broadcast(ng), group_col)
        .crossJoin(F.broadcast(n))
        .withColumn(
            "__tpos",
            F.expr(
                "CASE WHEN __ng > 1 THEN CAST("
                "(CAST(__rg - 1 AS DECIMAL(38,0)) * (__n - 1))"
                " div (__ng - 1) AS BIGINT) + 1 ELSE 1 END"
            ),
        )
    )
    lookup = pooled.select(
        F.col("__pos").alias("__tpos"),
        F.col(score_col).alias("matched"),
    )
    return target.join(lookup, "__tpos").select(
        id_col, group_col, score_col, "matched"
    )


def auc_rank(
    df: DataFrame,
    score_col: str,
    label_col: str,
    chunk: int = 1000,
) -> DataFrame:
    """Tie-aware Mann-Whitney AUC of an integer ``score_col`` against a
    0/1 ``label_col`` — the rank-sum identity AUC = (R⁺ − n⁺(n⁺+1)/2) /
    (n⁺·n⁻), with tied scores taking mid-ranks. The model-evaluation
    primitive of a curation pipeline: "does this quality score actually
    separate the keep class from the drop class?".

    Scale shape: the textbook formulation ranks every row through ONE
    unpartitioned ``Window.orderBy`` — the single-task trap. Instead the
    facts reduce once to distinct-score cells (map-side combinable; at
    most one row per score value), and the exclusive count of
    strictly-smaller scores rides ``two_phase_rank_cumsum`` over
    score-range chunks. All mid-rank arithmetic stays doubled-integer
    (2·R⁺ = Σ pos·(2·below + cnt + 1)), so the output is BIGINT-exact;
    the AUC ships as integer micro-units (``div``, not float division).
    BIGINT holds to ~3·10⁹ rows per class (n⁺·n⁻ < 2⁶³/2·10⁶); past
    that, route ``u2`` through DECIMAL(38,0).

    reference: ABSENT — SURVEY.md §2 extension surface.
    """
    g = df.groupBy(score_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt"),
        F.sum(F.col(label_col).cast("bigint")).alias("__pos"),
    )
    ranked = two_phase_rank_cumsum(
        g,
        score_col,
        F.expr(f"{score_col} div {chunk}"),
        value_col="__cnt",
        cum_col="__cum",
    )
    terms = ranked.select(
        (
            F.col("__pos")
            * (
                F.lit(2) * (F.col("__cum") - F.col("__cnt"))
                + F.col("__cnt")
                + F.lit(1)
            )
        ).alias("__r2"),
        F.col("__pos"),
        (F.col("__cnt") - F.col("__pos")).alias("__neg"),
    )
    tot = terms.agg(
        F.sum("__r2").cast("bigint").alias("__r2s"),
        F.sum("__pos").cast("bigint").alias("n_pos"),
        F.sum("__neg").cast("bigint").alias("n_neg"),
    )
    return tot.select(
        "n_pos",
        "n_neg",
        F.expr(
            "((__r2s - n_pos * (n_pos + 1)) * 1000000)"
            " div (2 * n_pos * n_neg)"
        )
        .cast("bigint")
        .alias("auc_micro"),
    )


def perceptron_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    epochs: int = 3,
) -> DataFrame:
    """Batch (Rosenblatt) perceptron trained with exact integer
    arithmetic: weights start at 0 and each epoch adds the SUM of
    ``y·x`` over currently-misclassified rows (``y·(w·x) <= 0``,
    unit learning rate) — the classic quality-filter trainer shape (a
    fastText-style linear classifier over integer features), kept
    bit-exact so two engines agree on every weight.

    Scale shape: one map-side-combinable aggregation pass per epoch
    (k partial sums), weights come back as ONE k-int row and re-enter
    the next pass as literals — the same broadcast-the-model loop as
    ``kmeans_iterate``, with no shuffle of the facts, ever. Batch (not
    sequential) updates are what make the result partitioning-invariant:
    the classic per-row perceptron depends on visit order, which no
    distributed engine should promise.

    ``label_col`` must be ±1 and features integer (quantize upstream).
    Returns one row: ``w_<feat>`` final weights, ``n_correct`` rows with
    a strictly positive final margin, ``n_total``.

    reference: ABSENT — SURVEY.md §2 extension surface.
    """
    y = F.col(label_col)
    w = [0] * len(feature_cols)

    def margin(weights: list[int]):
        m = F.lit(0).cast("bigint")
        for wi, c in zip(weights, feature_cols):
            m = m + F.lit(wi) * F.col(c)
        return m

    for _ in range(epochs):
        mis = (y * margin(w)) <= 0
        row = df.agg(
            *[
                F.sum(F.when(mis, y * F.col(c)).otherwise(F.lit(0)))
                .cast("bigint")
                .alias(f"__d{i}")
                for i, c in enumerate(feature_cols)
            ]
        ).collect()[0]
        w = [wi + (row[f"__d{i}"] or 0) for i, wi in enumerate(w)]
    out = df.agg(
        F.sum(((y * margin(w)) > 0).cast("bigint")).alias("n_correct"),
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
    )
    for i, c in enumerate(feature_cols):
        out = out.withColumn(f"w_{c}", F.lit(int(w[i])).cast("bigint"))
    return out.select(
        *[f"w_{c}" for c in feature_cols], "n_correct", "n_total"
    )


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    m: int = 20,
    scale: int = 1_000_000,
) -> DataFrame:
    """Leave-one-out smoothed target encoding — the standard leakage-free
    categorical feature for tree/linear models: row i in category c gets
    ``te = (s_c − y_i + m·p) / (n_c − 1 + m)`` where ``s_c``/``n_c`` are
    the category's label sum/count, ``p`` the global prior, ``m`` the
    smoothing pseudo-count. Excluding the row's own label kills the
    single-row target leak; ``m`` shrinks rare categories toward the
    prior.

    Exactness: with integer labels the prior is the rational
    ``P_num/P_den``, so ``te`` ships as the integer micro-units
    ``((s_c − y)·P_den + m·P_num)·scale div ((n_c − 1 + m)·P_den)`` —
    BIGINT end to end, no float path. (Keeps 63 bits up to ~10⁹ rows
    with small label sums; route through DECIMAL(38,0) past that.)

    Scale shape: one map-side-combinable per-category aggregate + one
    global 1-row aggregate, both broadcast back — the fact table never
    shuffles and there is no window anywhere.

    reference: ABSENT — SURVEY.md §2 extension surface.
    """
    y = F.col(label_col).cast("bigint")
    per_cat = df.groupBy(cat_col).agg(
        F.sum(y).alias("__s_c"),
        F.count(F.lit(1)).cast("bigint").alias("__n_c"),
    )
    prior = df.agg(
        F.sum(y).alias("__p_num"),
        F.count(F.lit(1)).cast("bigint").alias("__p_den"),
    )
    return (
        df.join(F.broadcast(per_cat), cat_col)
        .crossJoin(F.broadcast(prior))
        .withColumn(
            "te_micro",
            F.expr(
                f"((__s_c - {label_col}) * __p_den + {int(m)} * __p_num)"
                f" * {int(scale)}"
                f" div ((__n_c - 1 + {int(m)}) * __p_den)"
            ).cast("bigint"),
        )
        .drop("__s_c", "__n_c", "__p_num", "__p_den")
    )


def calibration_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_buckets: int = 10,
    chunk: int = 1000,
) -> DataFrame:
    """Reliability diagram: equi-depth score buckets (ties keep
    together — same integer-cumulative rule as ``equidepth_histogram``)
    with the observed positive rate per bucket, in exact integer
    micro-units. The companion readout to :func:`auc_rank`: AUC says the
    score RANKS well, calibration says what the score VALUES mean.

    Scale shape: facts reduce once to distinct-score cells; the
    exclusive cumulative count rides ``two_phase_rank_cumsum`` over
    score-range chunks (never a single-task window); the total is one
    broadcast row. ``score_col`` must be integer (quantize upstream).

    reference: ABSENT — SURVEY.md §2 extension surface.
    """
    g = df.groupBy(score_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt"),
        F.sum(F.col(label_col).cast("bigint")).alias("__pos"),
    )
    ranked = two_phase_rank_cumsum(
        g,
        score_col,
        F.expr(f"{score_col} div {chunk}"),
        value_col="__cnt",
        cum_col="__cum",
    )
    tot = g.agg(F.sum("__cnt").cast("bigint").alias("__n"))
    return (
        ranked.join(F.broadcast(tot))
        .withColumn(
            "bucket",
            F.expr(f"((__cum - __cnt) * {int(n_buckets)}) div __n")
            + F.lit(1),
        )
        .groupBy("bucket")
        .agg(
            F.sum("__cnt").cast("bigint").alias("n_rows"),
            F.sum("__pos").cast("bigint").alias("n_pos"),
            F.min(score_col).alias("min_score"),
            F.max(score_col).alias("max_score"),
        )
        .withColumn(
            "pos_rate_micro",
            F.expr("(n_pos * 1000000) div n_rows").cast("bigint"),
        )
        .orderBy("bucket")
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    score_col: str,
    n_buckets: int = 10,
    chunk: int = 1000,
) -> DataFrame:
    """Population Stability Index between a reference period A and a
    comparison period B: bin by A's equi-depth decile edges, then
    ``PSI = Σ (pA_j − pB_j)·ln(pA_j / pB_j)`` with Laplace-smoothed
    shares ``p = (n_j + 1)/(N + n_buckets)`` so empty bins stay finite.
    The drift meter a feature store runs between training and serving
    windows; > 0.2 is the conventional "investigate" bar.

    Emitted per-bin (the ln appears once per ROW and is rounded before
    output — never summed across rows raw, the mix-KL float rule), so
    the caller sums ``psi_term_r`` for the headline number.

    Scale shape: both periods reduce to distinct-score cells first; A's
    edge computation rides ``two_phase_rank_cumsum``; the 9 edges
    broadcast into a bounded cell join. No raw-fact shuffle, no global
    window, integer counts everywhere.

    reference: ABSENT — SURVEY.md §2 extension surface.
    """
    ga = df_a.groupBy(F.col(score_col).alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt")
    )
    ranked = two_phase_rank_cumsum(
        ga,
        "v",
        F.expr(f"v div {chunk}"),
        value_col="__cnt",
        cum_col="__cum",
    )
    tot_a = ga.agg(F.sum("__cnt").cast("bigint").alias("__n"))
    edges = (
        ranked.join(F.broadcast(tot_a))
        .withColumn(
            "__bucket",
            F.expr(f"((__cum - __cnt) * {int(n_buckets)}) div __n")
            + F.lit(1),
        )
        .groupBy("__bucket")
        .agg(F.max("v").alias("edge"))
        .where(F.col("__bucket") < n_buckets)
        .select("edge")
    )

    def binned(df: DataFrame, out: str) -> DataFrame:
        cells = df.groupBy(F.col(score_col).alias("v")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        with_bin = (
            cells.join(F.broadcast(edges), F.col("edge") < F.col("v"), "left")
            .groupBy("v", "c")
            .agg(
                (F.count("edge") + F.lit(1)).cast("int").alias("bin")
            )
        )
        return with_bin.groupBy("bin").agg(F.sum("c").alias(out))

    spine = (
        df_a.sparkSession.range(1, n_buckets + 1)
        .select(F.col("id").cast("int").alias("bin"))
    )
    counts = (
        spine.join(binned(df_a, "__na"), "bin", "left")
        .join(binned(df_b, "__nb"), "bin", "left")
        .select(
            "bin",
            F.coalesce(F.col("__na"), F.lit(0)).cast("bigint").alias("n_a"),
            F.coalesce(F.col("__nb"), F.lit(0)).cast("bigint").alias("n_b"),
        )
    )
    totals = counts.agg(
        F.sum("n_a").cast("bigint").alias("__ta"),
        F.sum("n_b").cast("bigint").alias("__tb"),
    )
    pa = (F.col("n_a") + 1).cast("double") / (
        F.col("__ta") + F.lit(n_buckets)
    )
    pb = (F.col("n_b") + 1).cast("double") / (
        F.col("__tb") + F.lit(n_buckets)
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            "n_a",
            "n_b",
            F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term_r"),
        )
        .orderBy("bin")
    )


def exact_percentiles(
    df: DataFrame,
    col: str,
    permille: list[int] | tuple = (500, 900, 990, 999),
    chunk: int = 1000,
    weight_col: str | None = None,
) -> DataFrame:
    """EXACT distributed percentiles of an integer column — the
    lower-value (type-1) quantile: the q-th per-mille is the smallest
    value whose inclusive cumulative count reaches ``rank_q =
    ceil(q·n/1000)`` (integral ceiling, no float ``ceil`` — the
    documented cross-engine trap). The exact twin of the repo's
    sketch-based quantiles: sketches for always-on dashboards, this for
    the sign-off number.

    Scale shape: facts reduce once to distinct-value cells; the
    cumulative rides ``two_phase_rank_cumsum`` over value-range chunks;
    each requested percentile selects exactly the straddling cell
    (``cum − cnt < rank_q <= cum``), so the output is |permille| rows —
    no global sort, no single-task window, no sketch error.

    With ``weight_col`` (non-negative integer) this is the WEIGHTED
    type-1 quantile: ranks run over cumulative weight instead of row
    count ("the median price per unit sold", not per order line).

    reference: ABSENT — SURVEY.md §2 extension surface.
    """
    w = (
        F.count(F.lit(1))
        if weight_col is None
        else F.sum(F.col(weight_col).cast("bigint"))
    )
    g = df.groupBy(F.col(col).alias("v")).agg(
        w.cast("bigint").alias("__cnt")
    )
    ranked = two_phase_rank_cumsum(
        g,
        "v",
        F.expr(f"v div {chunk}"),
        value_col="__cnt",
        cum_col="__cum",
    )
    tot = g.agg(F.sum("__cnt").cast("bigint").alias("__n"))
    spine = df.sparkSession.createDataFrame(
        [(int(q),) for q in permille], "permille int"
    )
    return (
        ranked.join(F.broadcast(tot))
        .join(
            F.broadcast(spine),
            F.expr("(permille * __n + 999) div 1000").between(
                F.col("__cum") - F.col("__cnt") + 1, F.col("__cum")
            ),
        )
        .select(
            "permille",
            F.expr("(permille * __n + 999) div 1000")
            .cast("bigint")
            .alias("rank_q"),
            F.col("v").alias("value"),
        )
        .orderBy("permille")
    )


def theil_sen_slope(
    df: DataFrame,
    x_col: str,
    y_col: str,
    scale: int = 1000,
) -> DataFrame:
    """Theil–Sen robust trend: the median over all point pairs of the
    slope ``(y_j − y_i)/(x_j − x_i)`` — up to ~29% of wild outlier
    points cannot move it, unlike OLS. Slopes are kept as exact scaled
    integers (``·scale`` then truncating division — identical on both
    engines), and the median is the lower (type-1) median via
    :func:`exact_percentiles`, so the whole statistic is
    integer-deterministic.

    PRECONDITION (the documented all-pairs rule): ``df`` must already be
    the per-``x`` reduction of the facts with BOUNDED x-cardinality
    (calendar days/months...) — the pair join is quadratic in |x|, never
    in the row count. One row per x is also what the estimator wants
    (pairs of aggregates, not of raw points).

    Returns one row: n_points, n_pairs, slope_median (scaled).

    reference: ABSENT — SURVEY.md §2 extension surface.
    """
    a = df.select(
        F.col(x_col).cast("bigint").alias("__xa"),
        F.col(y_col).cast("bigint").alias("__ya"),
    )
    b = df.select(
        F.col(x_col).cast("bigint").alias("__xb"),
        F.col(y_col).cast("bigint").alias("__yb"),
    )
    # The div is guarded even though the join condition already implies
    # __xb > __xa: codegen can evaluate the projection while probing
    # rows the condition will reject, and ANSI mode turns that phantom
    # division into a real error.
    slopes = a.join(F.broadcast(b), F.col("__xa") < F.col("__xb")).select(
        F.when(
            F.col("__xb") > F.col("__xa"),
            F.expr(f"((__yb - __ya) * {int(scale)}) div (__xb - __xa)"),
        ).alias("slope")
    )
    med = exact_percentiles(slopes, "slope", permille=(500,), chunk=1000)
    n_points = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
    n_pairs = slopes.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    return (
        n_points.crossJoin(n_pairs)
        .crossJoin(med.select(F.col("value").alias("slope_median")))
    )


def isotonic_fit(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_buckets: int = 20,
    chunk: int = 1000,
) -> DataFrame:
    """Distributed isotonic regression (pool-adjacent-violators) of the
    observed positive rate against an integer score, via the minimax
    identity ``fit_i = max_{h<=i} min_{j>=i} Avg(h..j)`` (Robertson,
    Wright & Dykstra, "Order Restricted Statistical Inference", 1988) —
    the monotone calibration map a scoring model ships with. Where
    :func:`calibration_curve` reports what the score means,
    ``isotonic_fit`` repairs it into the best monotone recalibration
    (L2, bucket-weighted).

    Scale shape: facts reduce ONCE to distinct-score cells and the
    equi-depth bucketing rides ``two_phase_rank_cumsum`` (same as
    ``calibration_curve``); everything after operates on the bounded
    ``n_buckets``-row table — the O(B^3) minimax enumeration is ~B^2
    pair rows joined to a B-row spine, trivial for any dashboard-sized
    B, and never touches the fact table again. Each weighted average is
    ONE IEEE division of two exact BIGINTs, so min/max comparisons are
    bit-identical cross-engine.

    Returns one row per non-empty bucket: ``(bucket, n_rows, n_pos,
    pos_rate_micro, iso_rate_r)`` with ``iso_rate_r`` non-decreasing in
    ``bucket``.

    reference: ABSENT — SURVEY.md §2 extension surface.
    """
    bins = calibration_curve(
        df, score_col, label_col, n_buckets=n_buckets, chunk=chunk
    ).select("bucket", "n_rows", "n_pos", "pos_rate_micro")
    # exclusive prefix sums over the bounded bucket table (fixed
    # cardinality <= n_buckets: the window is plan-safe)
    from pyspark.sql import Window

    w = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = bins.select(
        "bucket",
        "n_rows",
        "n_pos",
        "pos_rate_micro",
        (F.sum("n_rows").over(w)).cast("bigint").alias("cum_n"),
        (F.sum("n_pos").over(w)).cast("bigint").alias("cum_p"),
    )
    lo = pre.select(
        F.col("bucket").alias("h"),
        (F.col("cum_n") - F.col("n_rows")).alias("n_before_h"),
        (F.col("cum_p") - F.col("n_pos")).alias("p_before_h"),
    )
    hi = pre.select(
        F.col("bucket").alias("j"),
        F.col("cum_n").alias("n_to_j"),
        F.col("cum_p").alias("p_to_j"),
    )
    pairs = lo.join(F.broadcast(hi), F.col("h") <= F.col("j")).select(
        "h",
        "j",
        (
            (F.col("p_to_j") - F.col("p_before_h")).cast("double")
            / (F.col("n_to_j") - F.col("n_before_h")).cast("double")
        ).alias("avg_hj"),
    )
    spine = bins.select(F.col("bucket").alias("i"))
    inner = (
        pairs.join(
            F.broadcast(spine),
            (F.col("h") <= F.col("i")) & (F.col("j") >= F.col("i")),
        )
        .groupBy("i", "h")
        .agg(F.min("avg_hj").alias("min_j"))
    )
    fit = inner.groupBy("i").agg(F.max("min_j").alias("fit"))
    return (
        bins.join(fit, bins["bucket"] == fit["i"])
        .select(
            "bucket",
            "n_rows",
            "n_pos",
            "pos_rate_micro",
            F.round("fit", 6).alias("iso_rate_r"),
        )
        .orderBy("bucket")
    )


def exact_percentiles_by_group(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    permille: list[int] | tuple = (500, 900, 990),
    chunk: int = 1000,
) -> DataFrame:
    """Per-group EXACT type-1 percentiles of an integer column — the
    grouped twin of :func:`exact_percentiles` ("p50/p95 latency per
    endpoint", "median value per event type"). Same integral-ceiling
    rank rule; same distinct-cell reduction; the cumulative rides
    ``two_phase_rank_cumsum`` WITH the group as partition key, so even
    a group holding most of the data never sorts in one task (its cells
    still spread across value-range chunks).

    Returns one row per (group, permille): ``(*group_cols, permille,
    rank_q, value)``.

    reference: ABSENT — SURVEY.md §2 extension surface.
    """
    g = df.groupBy(*group_cols, F.col(col).alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt")
    )
    ranked = two_phase_rank_cumsum(
        g,
        "v",
        F.expr(f"v div {chunk}"),
        partition_cols=group_cols,
        value_col="__cnt",
        cum_col="__cum",
    )
    tot = g.groupBy(*group_cols).agg(
        F.sum("__cnt").cast("bigint").alias("__n")
    )
    spine = df.sparkSession.createDataFrame(
        [(int(q),) for q in permille], "permille int"
    )
    return (
        ranked.join(tot, list(group_cols))
        .join(
            F.broadcast(spine),
            F.expr("(permille * __n + 999) div 1000").between(
                F.col("__cum") - F.col("__cnt") + 1, F.col("__cum")
            ),
        )
        .select(
            *group_cols,
            "permille",
            F.expr("(permille * __n + 999) div 1000")
            .cast("bigint")
            .alias("rank_q"),
            F.col("v").alias("value"),
        )
        .orderBy(*group_cols, "permille")
    )
