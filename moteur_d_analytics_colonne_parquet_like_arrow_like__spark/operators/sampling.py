"""Weighted sampling operators for corpus curation.

The reference has no sampling surface (single-table scans only,
``cae/README.md:131-138``); the repo's deterministic hash/stratified/
per-group samplers live in the workload modules. This adds the missing
weighted variant: Efraimidis-Spirakis reservoir sampling (A-Res, "Weighted
random sampling with a reservoir", IPL 2006) with the randomness replaced
by the repo's stable md5 hash family, so the sample is a pure function of
the data — reproducible on any engine, any partitioning, any rerun.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import stable_hash60

#: Modulus for mapping a 60-bit hash onto (0, 1]; prime, so low bits mix.
_U_MOD = 999983


def weighted_sample_key(
    id_col: str | Column, weight_col: str | Column, salt: str = "ws"
) -> Column:
    """The A-Res priority key ``-ln(u) / w`` with deterministic
    ``u = (h60(salt:id) mod P + 1) / (P + 1)`` in (0, 1]. Taking the k
    SMALLEST keys yields a sample where inclusion probability scales with
    the weight (an exponential race: rate w wins early). Rounded to 9
    digits so the double is cross-engine rank-stable; ties (and the k-th
    boundary) are broken by id downstream."""
    idc = id_col if isinstance(id_col, Column) else F.col(id_col)
    w = weight_col if isinstance(weight_col, Column) else F.col(weight_col)
    h = stable_hash60(F.concat(F.lit(salt), F.lit(":"), idc.cast("string")))
    u = (F.pmod(h, F.lit(_U_MOD)) + 1) / F.lit(float(_U_MOD + 1))
    return F.round(-F.ln(u) / w.cast("double"), 9)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted reservoir sample of ``k`` rows.

    Scale shape: the key is a per-row expression (no shuffle), and the
    selection is a top-k (``TakeOrderedAndProject`` — per-partition heaps
    merged on the driver, never a full sort). At 100 TB this is one scan;
    the same key column also supports a weighted SPLIT (train/eval) by
    thresholding instead of limiting. Weights must be > 0.
    """
    return (
        df.withColumn(
            "samp_key_r", weighted_sample_key(id_col, weight_col, salt)
        )
        .orderBy(F.col("samp_key_r").asc(), F.col(id_col).asc())
        .limit(k)
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    token_count: Column,
    weights: dict[str, float],
    budget_frac: float,
    salt: str = "mix",
) -> DataFrame:
    """Training-data mixture sampling: draw a deterministic subsample whose
    per-source TOKEN share approximates ``weights`` within a total budget
    of ``budget_frac`` × corpus tokens.

    Per source s: desired tokens = weight_s × budget; keep fraction
    f_s = min(1, desired / tokens_s); a document survives iff its stable
    hash-uniform u < f_s — document-level Bernoulli, which matches the
    token share in expectation (the standard mixture recipe; exact
    token-level packing is ``text.pack_sequences``' job downstream).
    A source whose weight demands more tokens than it has saturates at
    f_s = 1 (take everything) rather than upweighting — detectable in the
    output where ``kept_frac_r`` ≈ 1.

    Scale shape: one groupBy for per-source token totals (a handful of
    rows, broadcast back), then a stateless per-row hash filter — the
    corpus is scanned once and never shuffled. Returns the kept rows with
    ``keep_frac_r`` attached; aggregate downstream for the mixture report.
    """
    idc = F.col(id_col)
    h = stable_hash60(F.concat(F.lit(salt), F.lit(":"), idc.cast("string")))
    u = (F.pmod(h, F.lit(_U_MOD)) + 1) / F.lit(float(_U_MOD + 1))
    per_source = (
        df.select(F.col(source_col).alias("__src"), token_count.alias("__tok"))
        .groupBy("__src")
        .agg(F.sum("__tok").cast("bigint").alias("__src_tokens"))
    )
    total = per_source.agg(
        F.sum("__src_tokens").cast("bigint").alias("__total_tokens")
    )
    fracs = per_source.crossJoin(F.broadcast(total))
    wmap = F.create_map(
        *[x for k, v in sorted(weights.items()) for x in (F.lit(k), F.lit(float(v)))]
    )
    # Sources absent from `weights` get weight 0 (dropped), made explicit
    # with coalesce: least() SKIPS nulls on both Spark and DuckDB, so a
    # NULL map lookup would silently become keep-everything. Same guard
    # for a zero-token source: desired/0 is NULL in Spark (double div by
    # zero), least() would skip it, and every doc of that source would be
    # kept — a source with no tokens contributes nothing, keep_frac 0.
    fracs = fracs.select(
        "__src",
        F.least(
            F.lit(1.0),
            F.when(
                F.col("__src_tokens") > 0,
                F.coalesce(wmap[F.col("__src")], F.lit(0.0))
                * F.lit(float(budget_frac))
                * F.col("__total_tokens")
                / F.col("__src_tokens"),
            ).otherwise(F.lit(0.0)),
        ).alias("__keep_frac"),
    )
    return (
        df.join(
            F.broadcast(fracs), df[source_col] == fracs["__src"], "inner"
        )
        .where(u < F.col("__keep_frac"))
        .drop("__src")
        .withColumn("keep_frac_r", F.round(F.col("__keep_frac"), 9))
        .drop("__keep_frac")
    )


def temperature_mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    token_count: Column,
    alpha: float = 0.7,
    budget_frac: float = 0.2,
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-based mixture sampling: per-source weights are
    COMPUTED from the data as ``w_s ∝ tokens_s^alpha`` (the multilingual
    /multi-source standard — alpha < 1 flattens the natural distribution
    so small sources are upsampled relative to their share, alpha = 1
    reproduces it, alpha = 0 gives uniform), then documents survive a
    deterministic hash-Bernoulli at ``min(1, w_s * budget / tokens_s)``
    exactly like ``mixture_sample``. Heavy upweighting saturates at
    keep-everything rather than duplicating.

    Scale shape: identical to ``mixture_sample`` — one per-source token
    aggregation (a handful of rows; the pow/normalize algebra runs on
    it), broadcast back, then a stateless per-row hash filter. The
    corpus is scanned once and never shuffled. Returns kept rows with
    ``weight_r`` and ``keep_frac_r`` attached.
    """
    idc = F.col(id_col)
    h = stable_hash60(F.concat(F.lit(salt), F.lit(":"), idc.cast("string")))
    u = (F.pmod(h, F.lit(_U_MOD)) + 1) / F.lit(float(_U_MOD + 1))
    per_source = (
        df.select(F.col(source_col).alias("__src"), token_count.alias("__tok"))
        .groupBy("__src")
        .agg(F.sum("__tok").cast("bigint").alias("__src_tokens"))
        .withColumn(
            "__pw", F.pow(F.col("__src_tokens").cast("double"), F.lit(float(alpha)))
        )
    )
    total = per_source.agg(
        F.sum("__src_tokens").cast("bigint").alias("__total_tokens"),
        F.sum("__pw").alias("__pw_sum"),
    )
    fracs = per_source.crossJoin(F.broadcast(total)).select(
        "__src",
        (F.col("__pw") / F.col("__pw_sum")).alias("__w"),
        F.when(
            F.col("__src_tokens") > 0,
            F.least(
                F.lit(1.0),
                (F.col("__pw") / F.col("__pw_sum"))
                * F.lit(float(budget_frac))
                * F.col("__total_tokens")
                / F.col("__src_tokens"),
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("__keep_frac"),
    )
    return (
        df.join(F.broadcast(fracs), df[source_col] == fracs["__src"], "inner")
        .where(u < F.col("__keep_frac"))
        .drop("__src")
        .withColumn("weight_r", F.round(F.col("__w"), 9))
        .withColumn("keep_frac_r", F.round(F.col("__keep_frac"), 9))
        .drop("__w", "__keep_frac")
    )


def negative_pairs(
    df: DataFrame, id_col: str, k: int = 4
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: ``k``
    pseudo-random partner ids per row, derived from the stable md5 hash
    family — ``cand(id, slot) = h60(id ':' slot) mod (max_id + 1)``,
    self-collisions remapped to ``cand + 1 mod n``. Returns
    (anchor id, slot, neg id), deterministic across runs, partitions,
    and retries (the property that makes the training set reproducible).

    Plan shape: the candidate expression is a per-row explode of k slots
    (map-side); the inner join back onto the real id set keeps only
    partners that exist — with DENSE ids (0..n-1, the usual layout after
    corpus packing) every candidate hits and each anchor gets exactly k
    negatives; with sparse ids the miss rate equals the sparsity and the
    join silently yields fewer (document your id space or densify
    first). The only shuffles are that narrow id equi-join and nothing
    else; no RNG, no driver state.

    ``k`` must be >= 1: Spark's ``sequence(1, 0)`` counts DOWN ([1, 0]),
    so k=0 would silently emit two bogus slots per anchor instead of
    none — rejected loudly instead (mirrors hierarchy_closure's
    max_depth guard).
    """
    if k < 1:
        raise ValueError(f"negative_pairs requires k >= 1, got {k}")
    bound = df.agg(
        (F.max(F.col(id_col)) + F.lit(1)).cast("bigint").alias("__n")
    )
    anchors = df.select(F.col(id_col).alias("anchor")).crossJoin(
        F.broadcast(bound)
    )
    slots = F.explode(
        F.sequence(F.lit(1), F.lit(int(k)))
    ).alias("slot")
    cand = F.pmod(
        stable_hash60(
            F.concat(F.col("anchor").cast("string"), F.lit(":"), F.col("slot").cast("string"))
        ),
        F.col("__n"),
    )
    c = (
        anchors.select("anchor", slots, F.col("__n"))
        .withColumn("__cand", cand)
        .withColumn(
            "__cand",
            F.when(F.col("__cand") == F.col("anchor"),
                   F.pmod(F.col("__cand") + 1, F.col("__n")))
            .otherwise(F.col("__cand")),
        )
    )
    real = df.select(F.col(id_col).alias("__cand")).distinct()
    return (
        c.join(real, "__cand")
        .select(
            F.col("anchor").alias(id_col),
            F.col("slot").cast("int").alias("slot"),
            F.col("__cand").alias("neg_id"),
        )
        .orderBy(id_col, "slot")
    )


def consistent_ring(n_nodes: int, vnodes: int = 8) -> list[tuple[int, int]]:
    """The (point, owner) hash ring for :func:`consistent_shard_assign`:
    ``vnodes`` virtual points per node at ``h60('node{i}#v{j}')`` (the
    repo's stable md5 hash family), sorted by point. Collisions would make
    ownership tie-break-dependent, so they fail loudly (probability
    ~(n·v)²/2⁶¹ — never observed; a salt bump fixes it if it ever trips).
    """
    import hashlib

    ring = sorted(
        (
            int(
                hashlib.md5(f"node{i}#v{j}".encode()).hexdigest()[:15], 16
            ),
            i,
        )
        for i in range(n_nodes)
        for j in range(vnodes)
    )
    points = [p for p, _ in ring]
    if len(set(points)) != len(points):
        raise ValueError("consistent_ring: hash-point collision; change salt")
    return ring


def consistent_shard_assign(
    df: DataFrame,
    key_col: str,
    n_nodes: int,
    vnodes: int = 8,
    out_col: str = "node",
) -> DataFrame:
    """Consistent-hash shard assignment (Karger rings, the memcache /
    Dynamo placement scheme): each key goes to the owner of the first
    ring point at or after ``h60(key)``, wrapping past the top. Adding a
    node moves ONLY the keys that land on the new node's arcs (~1/(n+1)
    of them) — vs modulo sharding, which reshuffles nearly everything.
    That movement bound is what makes resharding a 100 TB corpus an
    incremental copy instead of a full rewrite.

    Scale shape: the ring is tiny and compiles to literal arrays inside
    ONE projection — successor lookup is ``size(filter(points, p < h))``
    plus an ``element_at``, pure per-row expression work: no join, no
    shuffle, no UDF. Deterministic md5 math end to end.

    reference: ABSENT — SURVEY.md §2 extension surface.
    """
    ring = consistent_ring(n_nodes, vnodes)
    points = F.array(*[F.lit(p) for p, _ in ring])
    owners = F.array(*[F.lit(o) for _, o in ring])
    d = df.withColumn(
        "__h", stable_hash60(F.col(key_col).cast("string"))
    )
    idx = F.size(F.filter(points, lambda p: p < F.col("__h")))
    wrapped = F.when(idx >= F.lit(len(ring)), F.lit(0)).otherwise(idx)
    return (
        d.withColumn(out_col, F.element_at(owners, wrapped + F.lit(1)))
        .withColumn(out_col, F.col(out_col).cast("int"))
        .drop("__h")
    )
