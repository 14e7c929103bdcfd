"""Graph operators over edge tables (the near-dup pair graph, entity
links): iterative algorithms expressed as per-round DataFrame joins.
Complements dedup.connected_components (Pregel-style min-label) with
centrality.

The reference (agentic_workflow_transformation.py:1-403) has no graph
operators; these serve the corpus-pipeline uses on top of the dedup
pair table — e.g. picking the most-central document of a duplicate
cluster as its canonical representative.

Determinism discipline: PageRank's per-node in-mass is a SUM of
neighbor contributions, and float summation is order-dependent — two
engines (or two partitionings) would drift in the last ulp and diverge
after a few iterations. So ranks are kept as SCALED INTEGERS and every
division is integer division: addition of longs is associative and
commutative, making the result bit-identical regardless of partition
order, and exactly reproducible in ANSI SQL (`//` / `DIV`). The
quantization error is bounded by 1/scale per edge per iteration —
~1e-9 of total mass at the default scale — and is itself deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank_integer(edges: DataFrame, src_col: str = "src",
                     dst_col: str = "dst", iters: int = 5,
                     damping_num: int = 85, damping_den: int = 100,
                     scale: int = 10**12) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list, in exact
    integer arithmetic. Nodes are the distinct edge endpoints (a node
    with only in-edges still receives mass; pass both directions for
    an undirected graph, which also removes dangling nodes). Returns
    (node, rank_scaled) with rank_scaled ~ rank * ``scale``.

    Update rule per iteration, all in BIGINT:
        contrib(u->v) = (r[u] * damping_num) div (damping_den * deg[u])
        r'[v] = (scale * (den-num)) div (den * N) + sum contrib(u->v)

    Scale shape: one degree aggregate up front; per iteration one
    equi-join of the edge list with the (node, rank) frame — shuffle
    keyed on node id, fixed-width rows — and one map-side-combined sum.
    The rank frame is localCheckpoint'ed per round so the plan stays
    flat across iterations (same discipline as
    dedup.connected_components); at cluster scale the edge list is the
    big side and keeps a stable partitioning across all rounds.
    """
    # materialize the (possibly expensive — e.g. a co-order self-join)
    # edge build ONCE: every iteration re-joins the edge list, and an
    # uncheckpointed lineage would recompute the build per round
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_scaled", F.lit(0).cast("long"))
    init = scale // n
    base = (scale * (damping_den - damping_num)) // (damping_den * n)
    r = nodes.withColumn("rank_scaled", F.lit(init).cast("long")).localCheckpoint()
    for _ in range(iters):
        contrib = (
            ed.join(r.withColumnRenamed("node", "src"), "src")
            .withColumn(
                "c",
                F.expr(f"(rank_scaled * {damping_num}) DIV ({damping_den} * deg)"),
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("in_mass"))
        )
        r = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("in_mass"), F.lit(0)))
                .cast("long")
                .alias("rank_scaled"),
            )
            .localCheckpoint()
        )
    return r


def triangle_counts(edges: DataFrame, src_col: str = "src",
                    dst_col: str = "dst") -> DataFrame:
    """Per-node triangle counts over an undirected edge list — the
    cohesion statistic behind clustering coefficients and community
    detection (on the near-dup pair graph: a doc in many triangles
    sits in a tight duplicate clique, not a chain of borderline
    matches).

    Algorithm: degree orientation (Cohen 2009) — orient every edge
    from the (degree, id)-smaller endpoint to the larger, turning the
    graph into a DAG where every out-neighborhood is O(sqrt(m)); then
    one wedge self-join on the source and one closing equi-join. This
    bounds the join fan-out by the ORIENTED out-degree, so the hottest
    hub in a skewed graph no longer produces deg^2 wedge rows — the
    100 TB shape, vs the naive per-node neighborhood join.

    Counting is exact and orientation-independent (each triangle has
    exactly one source under a total order), so the oracle can use the
    naive ordered 3-way join. Output: (node, n_triangles) for nodes in
    at least one triangle."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        # three consumers (degrees, oriented join, closing edges): one
        # materialization of the edge build, not three
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionByName(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = (
        e.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    o1, o2 = o.alias("o1"), o.alias("o2")
    # wedges u->v, u->w with v before w in the SAME (deg, id) order the
    # orientation used, so the closing edge, if present, is v->w
    wedges = o1.join(
        o2,
        (F.col("o1.u") == F.col("o2.u"))
        & (
            (F.col("o1.dv") < F.col("o2.dv"))
            | ((F.col("o1.dv") == F.col("o2.dv")) & (F.col("o1.v") < F.col("o2.v")))
        ),
    ).select(
        F.col("o1.u").alias("x"), F.col("o1.v").alias("y"), F.col("o2.v").alias("z")
    )
    closing = o.select(F.col("u").alias("y"), F.col("v").alias("z"))
    tri = wedges.join(closing, ["y", "z"])
    nodes = (
        tri.select(F.col("x").alias("node"))
        .unionByName(tri.select(F.col("y").alias("node")))
        .unionByName(tri.select(F.col("z").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def bfs_levels(edges: DataFrame, src_col: str = "src",
               dst_col: str = "dst", max_depth: int = 6,
               seeds: DataFrame | None = None) -> DataFrame:
    """Breadth-first levels (shortest hop distance) from a seed set
    over a directed edge list — pass both directions for undirected.
    Returns (node, level) for every node within ``max_depth`` hops;
    level is the MINIMUM hop count. Default seed: the smallest
    endpoint id (deterministic); pass ``seeds`` (a 1-column frame of
    node ids) for multi-source BFS. Corpus use on the near-dup pair
    graph: how far borderline-duplicate "chains" extend from a known
    template doc — nodes at level 3+ match the seed only transitively,
    the gray zone a threshold-only dedup never surfaces.

    No counterpart in the reference (agentic_workflow_transformation.py
    has no graph surface); complements pagerank_integer (centrality)
    and dedup.connected_components (membership) with distance.

    Algorithm: classic frontier iteration — per round, one equi-join
    of the frontier with the edge list (shuffle keyed on node id),
    a distinct, and an anti-join against the visited set; new nodes
    get level k. Exactly-``max_depth`` rounds, no driver-side data
    (not even a count — empty late frontiers cost a metadata-only
    round). Frontier and visited localCheckpoint per round so the
    plan stays flat (pagerank/connected-components discipline); at
    cluster scale the edge list is the big side with a stable
    partitioning across all rounds, and per-round traffic is bounded
    by the frontier, not the graph."""
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).localCheckpoint(eager=False)  # edge build materializes once, not per round
    if seeds is None:
        seeds = e.agg(F.min("_s").alias("node")).where(
            F.col("node").isNotNull()
        )
    else:
        seeds = seeds.toDF("node").distinct()
    visited = seeds.withColumn(
        "level", F.lit(0).cast("int")
    ).localCheckpoint()
    frontier = visited
    for k in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["_s"])
            .select(F.col("_d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("level", F.lit(k).cast("int"))
            .localCheckpoint()
        )
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited


def adamic_adar(edges: DataFrame, src_col: str = "src",
                dst_col: str = "dst", max_degree: int = 64,
                min_common: int = 2) -> DataFrame:
    """Adamic-Adar link prediction over an undirected edge list: for
    each NON-adjacent node pair sharing >= ``min_common`` neighbors,
    the score sum(1/ln(deg(w))) over the common neighbors w — rare
    shared neighbors count more than hubs. On the co-order part
    graph: which parts are never bought together but share repeat
    co-purchase partners — the substitute/recommendation candidates
    the association graph itself can't list.

    No counterpart in the reference; completes the graph family
    (distance: bfs_levels, centrality: pagerank_integer, cohesion:
    triangle_counts) with prediction.

    Scale shape: the wedge join fans out deg(w)^2 per middle node, so
    middles above ``max_degree`` are EXCLUDED (deterministic, in the
    oracle too) — the standard hub cut: a hub's 1/ln(deg) term is
    near-zero signal but owns almost all wedge volume; the cap bounds
    per-key join fan-out the way degree orientation bounds
    triangle_counts. Two keyed aggregates (degrees, wedge sums), one
    self-join on the middle, one anti-join against the edge list.

    Exactness: each 1/ln(deg) term is rounded to 12 and pinned
    DECIMAL(28,12), so the per-pair sum is partition-order exact; a
    wedge middle has deg >= 2, so ln is never zero. Emits
    (node_a, node_b, common_neighbors, aa_score), node_a < node_b."""
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sym = und.select(F.col("a").alias("w"), F.col("b").alias("nb")).unionByName(
        und.select(F.col("b").alias("w"), F.col("a").alias("nb"))
    )
    deg = sym.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("_deg"))
    mid = sym.join(
        deg.where(F.col("_deg") <= max_degree), "w"
    )
    term = F.round(
        F.lit(1.0) / F.log(F.col("_deg").cast("double")), 12
    ).cast("decimal(28,12)")
    l = mid.select(F.col("w"), F.col("nb").alias("u"), F.col("_deg"))
    r = mid.select(F.col("w"), F.col("nb").alias("v"))
    pairs = (
        l.join(r, "w")
        .where(F.col("u") < F.col("v"))
        .groupBy(F.col("u").alias("node_a"), F.col("v").alias("node_b"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.sum(term).alias("_aa"),
        )
        .where(F.col("common_neighbors") >= min_common)
    )
    return (
        pairs.join(
            und,
            (pairs["node_a"] == und["a"]) & (pairs["node_b"] == und["b"]),
            "left_anti",
        )
        .select(
            "node_a",
            "node_b",
            "common_neighbors",
            F.round(F.col("_aa").cast("double"), 6).alias("aa_score"),
        )
    )


def label_propagation(edges: DataFrame, src_col: str = "src",
                      dst_col: str = "dst", n_iter: int = 3,
                      min_size: int = 2) -> DataFrame:
    """Fixed-iteration synchronous label propagation (Raghavan et al.
    2007) over an undirected edge list — the cheap community detector
    next to pagerank_integer (centrality) and bfs_levels (distance):
    every node starts with its own id as label, and each round adopts
    the MOST FREQUENT label among its neighbors, ties broken toward
    the smallest label so the sweep is deterministic (classical LPA
    breaks ties randomly and is run to convergence; the fixed round
    count and ordered tie-break are the contract here, making the
    result bit-identical across engines and partitionings). Returns
    the communities of size >= ``min_size`` as (community, n_members).

    Caller contract: pass both edge directions (a symmetric edge
    list, e.g. the co-order graph or the near-dup pair graph), so
    every node has in-neighbors and the vote join needs no outer-join
    fallback.

    Scale shape: per round, one shuffle of the edge list keyed on the
    neighbor id (the label lookup), one (node, label) vote count
    (map-side combined), and one row_number window PARTITIONED BY node
    (never global) to pick the winner; the label frame is
    localCheckpoint'ed per round so the plan stays flat (the
    pagerank_integer discipline). Traffic per round is |E| fixed-width
    rows regardless of iteration count."""
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).localCheckpoint(eager=False)  # edge build materializes once, not per round
    labels = (
        e.select(F.col("_s").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("node").orderBy(F.col("_c").desc(), F.col("lab"))
    for _ in range(n_iter):
        votes = (
            e.join(labels.withColumnRenamed("node", "_d"), "_d")
            .groupBy(F.col("_s").alias("node"), "lab")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        labels = (
            votes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", "lab")
            .localCheckpoint(eager=False)
        )
    return (
        labels.groupBy(F.col("lab").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .where(F.col("n_members") >= min_size)
    )
