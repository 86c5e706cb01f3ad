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


def hierarchy_closure(
    parents: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    max_rounds: int = 40,
) -> DataFrame:
    """Flatten a forest (each node has at most one parent; roots have
    NULL parent) into its transitive closure ``(node, root, depth)`` —
    the org-chart / BOM / category-tree staple SQL expresses as
    ``WITH RECURSIVE``.

    Scale shape: POINTER DOUBLING, not per-level recursion — each round
    self-joins the current ancestor map ``m`` to compose ``m ∘ m``
    (ancestor jumps double: 1, 2, 4, ...), so a depth-D hierarchy
    settles in ``⌈log2 D⌉`` shuffle rounds instead of D.  This is the
    same halving trick as the large-star/small-star connected
    components in :func:`connected_components`, specialized to the
    single-parent case where composition needs no min-aggregation.
    ``max_rounds`` = 40 bounds doubling at depth 2^40 — termination is
    detected by an empty frontier (some node's ancestor pointer can
    still advance), one existence probe per round on the ancestor map.
    DANGLING parents (ids that are not nodes — dirty data) are
    terminal: the walk stops there and reports the dangling id as the
    root with the depth reached, exactly what a recursive CTE does
    when its parent join finds no row.  Cycles (worse data) never
    drain the frontier; the loop raises after ``max_rounds`` instead
    of silently looping — run the q110-style FK integrity check first.
    """
    # localCheckpoint (eager), NOT persist: each round's self-join
    # references the previous map TWICE, so the LOGICAL plan doubles
    # per round even when the data is cached — by round ~10 the
    # analyzer walks a million-node tree and the driver OOMs (measured:
    # a 1024-deep chain killed a 16g driver).  Checkpointing truncates
    # the lineage so every round starts from a leaf plan; on a real
    # cluster prefer spark.sparkContext.setCheckpointDir + .checkpoint()
    # if executor loss during the (short) loop matters.
    m = parents.select(
        F.col(node_col).cast("long").alias("n"),
        F.col(parent_col).cast("long").alias("a"),
        F.when(F.col(parent_col).isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("d"),
    ).localCheckpoint()
    for _ in range(max_rounds):
        hop_probe = m.select(
            F.col("n").alias("_hn"), F.col("a").alias("_ha")
        )
        # frontier: a node can still ADVANCE — its ancestor is itself a
        # node that has an ancestor.  Roots (_ha NULL) and dangling
        # parents (no _hn row) are both terminal, so the check drains
        # on dirty data instead of spinning to max_rounds.
        if (
            m.filter(F.col("a").isNotNull())
            .join(hop_probe, F.col("a") == F.col("_hn"))
            .filter(F.col("_ha").isNotNull())
            .isEmpty()
        ):
            return m.select(
                F.col("n").alias(node_col),
                F.coalesce("a", "n").alias("root"),
                F.col("d").alias("depth"),
            )
        hop = m.select(
            F.col("n").alias("_hn"),
            F.col("a").alias("_ha"),
            F.col("d").alias("_hd"),
        )
        nxt = (
            m.join(hop, m["a"] == hop["_hn"], "left")
            .select(
                "n",
                # ancestor's ancestor if it has one, else stay put
                F.when(
                    F.col("_ha").isNotNull(), F.col("_ha")
                ).otherwise(F.col("a")).alias("a"),
                (
                    F.col("d")
                    + F.when(
                        F.col("_ha").isNotNull(), F.col("_hd")
                    ).otherwise(F.lit(0))
                ).cast("long").alias("d"),
            )
            # eager: materializes now AND truncates lineage (see above)
            .localCheckpoint()
        )
        m = nxt
    raise ValueError(
        f"hierarchy did not settle in {max_rounds} doubling rounds — "
        "cycle in the parent relation?"
    )
