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

from pyspark.sql import DataFrame
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
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
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
