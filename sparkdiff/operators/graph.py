"""Fixed-iteration graph centrality over edge DataFrames.

Complements ``operators/cluster.py`` (connected components): where CC
answers "which near-dup rows form one group", PageRank answers "which
nodes matter" — the centrality prior web-corpus curation pipelines use
as a document-quality signal (OPIC / harmonic-centrality crawl
frontiers) and warehouse teams use to rank entities in a relationship
graph.

Exactness contract: classic PageRank sums ``d * r_u / deg_u`` doubles,
whose value depends on addition order — not reproducible under
repartitioning, not oracle-checkable.  Here every rank is a FIXED-POINT
LONG (initial mass ``2^50 // N`` per node): per-edge contributions are
integer divisions (``r div deg``), the in-neighbor sum is a long sum
(associative — any partitioning), and the damping mix is rational
arithmetic ``(3*r0) div 20 + (17*sum) div 20`` for d=0.85.  Bit-exact
on any cluster and replayable in ANSI SQL.

Scale shape per iteration: one shuffle to aggregate contributions by
destination (map-side combined) and one equi-join back to the rank
table — the standard Pregel-style plan; the edge table is never
collected and the rank state is one row per node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: total rank mass (2^50) — headroom: 17 * mass < 2^55 << 2^63.
MASS = 1 << 50


def pagerank(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-point PageRank (d = 0.85 = 17/20) for ``iters`` rounds over
    a directed edge list; returns ``(node, deg, rank_s)`` where
    ``rank_s`` is the scaled-long rank.

    Textbook-complete: nodes are the distinct ``src ∪ dst`` vertex set
    (sink nodes participate with out-degree 0), and each round the
    DANGLING mass — the summed rank of zero-out-degree nodes, one
    bounded one-row aggregate — is redistributed uniformly
    (``dangling div n`` added to every node's inbound sum before
    damping), so total mass is conserved up to integer-division
    truncation instead of leaking out through sinks.  All arithmetic
    stays in scaled longs: headroom is 17·(MASS + MASS) < 2^56 ≪ 2^63.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n"))
    # one-row broadcast (the q76 stats pattern) keeps N in-plan — no
    # driver collect, same lineage at any scale
    r = (
        nodes.join(deg, "node", "left")
        .withColumn("deg", F.coalesce(F.col("deg"), F.lit(0)).cast("long"))
        .crossJoin(F.broadcast(n_nodes))
        .select(
            "node",
            "deg",
            "n",
            F.expr(f"{MASS} div n").alias("r0"),
            F.expr(f"{MASS} div n").alias("rank_s"),
        )
    )
    for _ in range(iters):
        contrib = (
            e.join(
                r.filter(F.col("deg") > 0).select(
                    F.col("node").alias("src"),
                    F.expr("rank_s div deg").alias("_c"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("_c").alias("_s"))
        )
        dangling = r.filter(F.col("deg") == 0).agg(
            F.coalesce(F.sum("rank_s"), F.lit(0)).alias("_dm")
        )
        prev = r
        r = (
            r.join(contrib, "node", "left")
            .withColumn("_s", F.coalesce(F.col("_s"), F.lit(0)))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "deg",
                "n",
                "r0",
                F.expr(
                    "(3 * r0) div 20 + (17 * (_s + _dm div n)) div 20"
                ).alias("rank_s"),
            )
            # per-round persist: each round references the previous rank
            # table twice (contribution join + state join), so an
            # unpersisted lineage doubles per iteration; the state is
            # one row per node — the standard Pregel checkpoint.
            # Materialize the new round eagerly, then drop the
            # superseded one: live cache is bounded at 2 node-sized
            # tables instead of accumulating one per round for the
            # session lifetime (registry-wide bench runs hold many
            # queries).
            .persist()
        )
        r.count()
        if prev.is_cached:
            prev.unpersist()
    return r.select("node", "deg", "rank_s")
