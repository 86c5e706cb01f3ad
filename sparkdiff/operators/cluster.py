"""Connected components over candidate-pair graphs — duplicate clusters.

The dedup family (``operators/dedup.py``) emits *pairs*; production
dedup needs *clusters* with one canonical representative per group
(near-duplication is transitive in practice: A~B and B~C usually means
the whole chain is one template family, and you keep exactly one).

``connected_components`` implements the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14) in pure DataFrame ops:

* **large-star**: every node links its strictly-larger neighbors to the
  minimum of its neighborhood (including itself);
* **small-star**: every node links its smaller-or-equal neighbors to the
  minimum of its neighborhood.

Both rounds are a ``groupBy(min)`` plus an equi-join back on the node id
— no all-pairs stage, shuffle width is two longs per edge — and the
edge set converges to a star forest in O(log² n) rounds.  Per-round
``localCheckpoint`` truncates the otherwise exponentially-growing
iterative lineage, which is what makes the loop viable on a real
cluster (the logical plan would otherwise double per round and stall
the driver long before the executors see work).

Reference parity: the reference has no graph stage at all — its dedup
story stops at pairwise suggestions (suggester_agent.py) — so this is
part of the training-data-pipeline extension surface, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(e: DataFrame) -> DataFrame:
    """Undirected edge set as (u, v) with u > v, self-loops dropped."""
    return (
        e.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Link each node's larger neighbors to its neighborhood minimum."""
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least(F.col("_mn"), F.col("u")).alias("m"))
    out = (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return out.filter(F.col("u") != F.col("v")).distinct()


def _small_star(e: DataFrame) -> DataFrame:
    """Link each node's smaller neighbors (and itself) to the minimum."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    relink = (
        e.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    keep = mins.select("u", F.col("m").alias("v"))
    return relink.unionAll(keep).filter(F.col("u") != F.col("v")).distinct()


def _signature(e: DataFrame) -> tuple[int, int]:
    """Order-independent (count, checksum) fingerprint of an edge set."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) accumulator: a sum of 64-bit hashes overflows a
        # long after ~2^33 edges (and trips ANSI mode far earlier)
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("s"),
    ).collect()[0]
    return int(row["n"]), int(row["s"])


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 24,
) -> DataFrame:
    """Component label per node: ``(id, component)`` where ``component``
    is the minimum node id reachable from ``id`` (including itself).

    Nodes are every id appearing in ``edges``; isolated nodes (not in
    any edge) are by definition their own singleton component and are
    not emitted — union them in at the call site if needed.
    """
    # Evaluate the (possibly very expensive — LSH candidate generation,
    # verify joins) pair lineage EXACTLY ONCE: checkpoint the undirected
    # edge set WITH self-loops, then derive both the node set and the
    # working edges from the checkpoint.  Deriving nodes from the raw
    # `edges` frame instead would re-run the whole upstream pipeline on
    # every downstream action (measured: q65's save re-paid the full
    # MinHash-LSH pass per run).
    base = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        base.select(F.col("u").alias("id"))
        .unionAll(base.select(F.col("v").alias("id")))
        .distinct()
    )
    e = base.filter(F.col("u") != F.col("v"))

    prev = _signature(e)
    for _ in range(max_iter):
        e = _canonical(_small_star(_large_star(e))).localCheckpoint(eager=True)
        sig = _signature(e)
        if sig == prev:
            break
        prev = sig

    # converged star forest: every non-root points at its component root
    labels = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    return (
        nodes.join(labels, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Duplicate clusters from verified near-dup pairs.

    Returns ``(id, cluster_id, cluster_size, is_canonical)`` for every
    id that participates in at least one pair; ``cluster_id`` is the
    minimum member id (the deterministic canonical representative — the
    row a pipeline keeps, dropping the rest).
    """
    comp = connected_components(pairs, id_a, id_b)
    # component count scales with the duplicate population, so the size
    # lookup is a shuffle join on the component key, not a broadcast —
    # a broadcast would not survive a 100 TB corpus
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(sizes, "component").select(
        "id",
        F.col("component").alias("cluster_id"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )


def dedup_families(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Label every document with its near-dup FAMILY: the minimum member
    id of its connected component in the MinHash-LSH verified-pair
    graph; singletons are their own family.  Returns the input plus
    ``family`` (long).

    This is the family labeler behind ``sampling.leakage_safe_split``
    (extracted so keep-best selection, q156, and any other
    family-keyed policy share it).  Scale shape: pairs from the banded
    LSH join (batch×corpus buckets, never n²), components from
    alternating large-star/small-star (O(log n) rounds, eager
    fixpoint — construction launches jobs), then one long-keyed equi
    join AQE broadcasts when the paired set is small."""
    from sparkdiff.operators.dedup import near_dup_pairs

    clash = {"family", "_cc_fam"} & set(df.columns)
    if clash:
        raise ValueError(
            f"dedup_families writes columns {sorted(clash)} that already "
            "exist on the input frame; rename or drop them first"
        )
    pairs = near_dup_pairs(
        df, id_col, text_col, threshold, k, num_perm, bands, hash_method
    )
    comps = connected_components(pairs, "id_a", "id_b")
    return (
        df.join(
            comps.select(
                F.col("id").alias(id_col), F.col("component").alias("_cc_fam")
            ),
            id_col,
            "left",
        )
        .withColumn(
            "family", F.coalesce(F.col("_cc_fam"), F.col(id_col).cast("long"))
        )
        .drop("_cc_fam")
    )


def keep_best_per_family(
    labeled: DataFrame,
    id_col: str,
    score_col: str,
    family_col: str = "family",
) -> DataFrame:
    """Canonical-representative selection: within each duplicate family
    keep the HIGHEST-scoring member (ties break to the lowest id) —
    the production dedup policy ("keep best", not "keep first"):
    when near-duplicates differ in quality, dropping by arrival order
    throws away the good copy half the time.  Adds ``kept`` (int 0/1);
    exactly one member of every family is kept.  The window partitions
    by family, so the sort is per-family parallel — family sizes are
    bounded in a deduped corpus, never corpus-scale."""
    from pyspark.sql import Window

    w = Window.partitionBy(family_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return labeled.withColumn(
        "kept", (F.row_number().over(w) == 1).cast("int")
    )
