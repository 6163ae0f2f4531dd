"""Graph analytics operators over data-derived networks.

The reference engine has no graph surface (single-table queries only,
cae/README.md:137); this extends the repo's graph family (triangle counting
in workloads/relational5.py) with iterative algorithms expressed as
DataFrame join/agg loops — the Pregel-on-DataFrames pattern: each
iteration is one shuffle join (ranks ⨝ edges on src) + one aggregation
(group by dst). At 100 TB the edge table is hash-partitioned by src once
and every iteration reuses that partitioning; ranks (one row per node) is
the small side and is broadcast when it fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Nodes are the distinct endpoints of `edges`; every node therefore has
    out-degree >= 1 when the edge list is symmetric (undirected graphs),
    which is the supported contract here — no dangling-mass redistribution
    term. Initial rank 1/N; update
    r'(v) = (1-d)/N + d * sum_{u->v} r(u)/outdeg(u).

    The iteration count is a compile-time constant, so the whole
    computation unrolls into one Catalyst plan (no driver-side collect per
    step). Each step shuffles on the join key only; `outdeg` is computed
    once and carried with the edges.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # Edge table annotated with the source's out-degree. Materialize it and
    # the node set eagerly (localCheckpoint truncates lineage AND persists):
    # every iteration reuses both, and without the cut the unrolled plan
    # re-derives the full upstream lineage (e.g. an expensive co-occurrence
    # self-join) once per iteration — the standard iterative-on-DataFrames
    # checkpoint pattern (GraphFrames does the same). At cluster scale this
    # is executor-local storage; swap for checkpoint() if fault tolerance
    # across iteration boundaries matters.
    ed = e.join(outdeg, "src").localCheckpoint(eager=True)
    nodes = nodes.localCheckpoint(eager=True)
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n")).select("n")
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                # Per-edge contribution routed through DECIMAL(28,15) so the
                # shuffle-order of the partial sums cannot change the result
                # (the repo-wide oracle-stability rule for double sums).
                (F.col("rank") / F.col("outdeg")).cast("decimal(28,15)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("double").alias("in_mass"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


def link_prediction_jaccard(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int | None = None,
    top_n: int = 20,
) -> DataFrame:
    """Common-neighbor link prediction over an undirected edge list
    (canonical ``src < dst`` rows): for every NON-adjacent node pair
    sharing at least one neighbor, the Jaccard coefficient
    ``|N(a) ∩ N(b)| / |N(a) ∪ N(b)|`` — the classic
    "suppliers that should be connected" recommender. Returns the top
    ``top_n`` by (jaccard desc, pair asc).

    Plan shape: symmetrize, candidate pairs from the WEDGE join (two
    edge copies meeting on the shared neighbor — an equi-join on the
    node key, never a node cross join), common-neighbor counts by
    groupBy, degrees joined back, existing edges removed by anti-join.
    Wedge cost is Σ deg(n)² over shared neighbors — ``max_degree`` drops
    hub nodes from the wedge middle first (the LSH-cap pattern again:
    a celebrity node contributes deg² candidate pairs and ~zero signal).
    Exact integer counts; the Jaccard division is the only float.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy(F.col("a").alias("n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    mid = sym.select(F.col("a").alias("n"), F.col("b").alias("leaf"))
    if max_degree is not None:
        mid = mid.join(
            F.broadcast(deg.where(F.col("deg") <= max_degree).select("n")),
            "n",
        )
    l = mid.select(F.col("n"), F.col("leaf").alias("u"))
    r = mid.select(F.col("n"), F.col("leaf").alias("v"))
    wedges = (
        l.join(r, "n")
        .where(F.col("u") < F.col("v"))
        .groupBy(F.col("u").alias("a"), F.col("v").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    cand = wedges.join(e, ["a", "b"], "left_anti")
    da = deg.select(F.col("n").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("n").alias("b"), F.col("deg").alias("deg_b"))
    out = (
        cand.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common",
            "deg_a",
            "deg_b",
            F.round(
                F.col("common")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common")),
                6,
            ).alias("jaccard_r"),
        )
    )
    return out.orderBy(
        F.col("jaccard_r").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(top_n)


def hierarchy_closure(
    edges: DataFrame,
    child: str = "child",
    parent: str = "parent",
    max_depth: int = 6,
) -> DataFrame:
    """Transitive ancestor closure of a forest/DAG edge list — the
    recursive-CTE workload (org charts, bills of materials, category
    trees) expressed WITHOUT recursion: ``max_depth`` unrolled
    level-joins, each joining the previous level's frontier to the edge
    table on the ancestor key. Returns (node, ancestor, dist) for
    1 <= dist <= max_depth.

    ``max_depth`` must be >= the hierarchy's actual height (levels past
    it are empty joins that cost nothing at plan time but truncate
    SILENTLY if the data is deeper — size it from the domain, e.g.
    ceil(log_fanout(max_id))). Scale shape: every join keys on the
    ancestor column (co-partitioned family); level cardinality shrinks
    geometrically in a balanced hierarchy, so the chain's cost is
    dominated by level 1 — one pass over the edge table per level at
    worst, no driver iteration, one Catalyst plan.
    """
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    e = edges.select(F.col(child).alias("node"), F.col(parent).alias("anc"))
    level = e.withColumn("dist", F.lit(1))
    levels = [level]
    step = e.select(F.col("node").alias("__c"), F.col("anc").alias("__p"))
    for _ in range(max_depth - 1):
        level = (
            level.join(step, level["anc"] == step["__c"])
            .select("node", F.col("__p").alias("anc"), (F.col("dist") + 1).alias("dist"))
        )
        levels.append(level)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def co_supply_edges(
    lineitem: DataFrame,
    part_modulus: int = 50,
    min_shared: int = 3,
) -> DataFrame:
    """The repo's shared supplier co-supply similarity graph: canonical
    (sa < sb) supplier pairs that co-supply >= ``min_shared`` of a
    1/``part_modulus`` part sample. The sampling + threshold keep the
    network SPARSE at every scale factor (the raw co-supply graph
    saturates toward a complete graph as SF grows, degenerating every
    downstream algorithm). Single source of truth for graph_triangles /
    pagerank / graph_link_prediction / supplier_kcore and their DuckDB
    oracles' ps/edges CTEs — change it here and there together.

    Plan: distinct (part, supplier) once (combiner-friendly), pair via
    a self-join ON THE PART KEY (bounded per part by its supplier
    count), threshold on the pair aggregate."""
    ps = (
        lineitem.where(F.col("l_partkey") % part_modulus == 0)
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    a = ps.select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sa"))
    b = ps.select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sb"))
    return (
        a.join(b, "pk")
        .where(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("_shared"))
        .where(F.col("_shared") >= min_shared)
        .select("sa", "sb")
    )


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Multi-source breadth-first hop distances over an undirected edge
    list: every node reachable from ANY source within ``max_hops`` hops,
    with its minimum hop count (0 for the sources themselves) — the
    blast-radius / influence-sphere query (recursive-CTE territory)
    expressed as ``max_hops`` frontier expansions.

    Each round joins the CURRENT frontier (nodes first reached in the
    previous round — already-visited nodes are anti-joined away, so the
    frontier never re-expands settled territory) against the symmetrized
    edge list on the node key, then min-dedups the candidates. BFS
    frontiers are the textbook monotone fixpoint: a node's distance is
    final the round it first appears, so fixed rounds == exact distances
    for everything within ``max_hops`` (and an oracle replaying the same
    rounds matches by construction). At 100 TB each round shuffles on
    node ids only, frontier-sized not graph-sized; ``localCheckpoint``
    cuts the unrolled lineage like pagerank/kcore.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    visited = sources.select(F.col(node).alias("n")).distinct().withColumn(
        "dist", F.lit(0)
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        # checkpoint the FRONTIER (not the union): it is read twice —
        # as the next round's probe side and inside visited — and
        # without the cut each round would re-derive every prior join
        nxt = (
            frontier.join(sym, frontier["n"] == sym["u"])
            .select(F.col("v").alias("n"))
            .distinct()
            .join(visited.select("n"), "n", "left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited.select(F.col("n").alias(node), "dist")


def kcore(
    edges: DataFrame,
    k: int,
    rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop every
    node whose degree fell below ``k`` (removing a node lowers its
    neighbors' degrees, so peeling cascades) for a FIXED ``rounds``
    count. The k-core is the unique maximal subgraph of min-degree >= k
    and peeling is confluent, so once the rounds suffice to converge the
    result is exactly it — and because the round count is fixed (no
    driver-side convergence poll), an oracle replaying the same rounds
    is equal BY CONSTRUCTION even pre-convergence. Returns surviving
    nodes with their in-core degree.

    Input contract: undirected edges as canonical (src < dst) pairs,
    deduped. Each round is one degree aggregation (union of endpoints,
    combiner-friendly) + two semi-joins; ``localCheckpoint`` cuts the
    lineage per round (the pagerank pattern — without it the unrolled
    plan re-derives the edge list 3^rounds times). At 100 TB each round
    shuffles on node ids only; ``rounds`` is the dial a production run
    sizes from the degeneracy ladder (peeling removes whole "shells",
    converging in a handful of rounds on real graphs — assert
    convergence by comparing rounds vs rounds+1, as the unit test does).
    """
    if k < 1:
        raise ValueError(f"kcore requires k >= 1, got {k}")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    for _ in range(rounds):
        deg = (
            e.select(F.col("a").alias("n"))
            .union(e.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        keep = deg.where(F.col("c") >= k).select("n")
        e = (
            e.join(keep.withColumnRenamed("n", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("n", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    return (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        .orderBy("node")
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 4,
    src: str = "sa",
    dst: str = "sb",
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007, the deterministic fixed-round variant): every node starts
    as its own label; each round every node adopts the most frequent
    label among its neighbors PLUS its own current label (the
    self-vote damps 2-cycle oscillation), ties broken by the smallest
    label. A FIXED round count plus the total tie order makes the
    trajectory engine-reproducible — the same contract as
    ``kcore(rounds=8)``.

    Scale shape: each round is one edge-sized join against the (node,
    label) frame, one (node, label) count aggregate (map-side
    combinable), and one ``max(struct(cnt, -label))`` argmax per node —
    no windows, no driver collect; the label frame is
    ``localCheckpoint``-ed per round (pagerank's lineage-cut contract).
    Communities emerge as label plateaus; the caller aggregates
    membership.

    reference: ABSENT — SURVEY.md §2 extension surface (graph family:
    triangles / pagerank / k-core / link prediction / BFS).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    und = edges.select(F.col(src).alias("n"), F.col(dst).alias("m")).unionByName(
        edges.select(F.col(dst).alias("n"), F.col(src).alias("m"))
    )
    labels = (
        und.select("n")
        .distinct()
        .select("n", F.col("n").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        neigh = und.join(
            labels.select(F.col("n").alias("m"), "label"), "m"
        ).select("n", "label")
        votes = neigh.unionByName(labels.select("n", "label"))
        counts = votes.groupBy("n", "label").agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        labels = (
            counts.groupBy("n")
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("label")).alias("nl"))
                ).alias("w")
            )
            .select("n", (-F.col("w.nl")).alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels
