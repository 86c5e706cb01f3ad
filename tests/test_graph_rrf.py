"""Unit pins for fixed-point PageRank and reciprocal-rank fusion."""

import pytest
from pyspark.sql import functions as F

from sparkdiff.operators.graph import MASS, pagerank
from sparkdiff.operators.retrieval import rrf_fuse


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src: long, dst: long")


def test_pagerank_star_center_dominates(spark):
    # undirected star 0-1, 0-2, 0-3: the hub must outrank the leaves,
    # leaves tie exactly (same integer arithmetic).
    pairs = []
    for leaf in (1, 2, 3):
        pairs += [(0, leaf), (leaf, 0)]
    r = {row.node: row.rank_s for row in pagerank(_edges(spark, pairs), 2).collect()}
    assert r[0] > r[1]
    assert r[1] == r[2] == r[3]


def test_pagerank_mass_roughly_conserved(spark):
    pairs = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2)]
    out = pagerank(_edges(spark, pairs), 3)
    total = out.agg(F.sum("rank_s")).first()[0]
    # integer floor losses only: within 0.1% of the full mass
    assert total == pytest.approx(MASS, rel=1e-3)


def test_pagerank_partition_invariant(spark):
    pairs = [(i % 7, (i * 3) % 7) for i in range(40)] + [
        ((i * 3) % 7, i % 7) for i in range(40)
    ]
    e = _edges(spark, pairs).distinct()
    a = {r.node: r.rank_s for r in pagerank(e, 2).collect()}
    b = {r.node: r.rank_s for r in pagerank(e.repartition(13), 2).collect()}
    assert a == b


def _reference_pagerank(pairs, iters):
    """Pure-Python textbook damped PageRank in the SAME scaled-long
    arithmetic: nodes = src∪dst, dangling mass redistributed uniformly
    each round."""
    nodes = sorted({s for s, _ in pairs} | {d for _, d in pairs})
    n = len(nodes)
    out = {v: [d for s, d in pairs if s == v] for v in nodes}
    rank = {v: MASS // n for v in nodes}
    base = {v: MASS // n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0 for v in nodes}
        for v in nodes:
            if out[v]:
                share = rank[v] // len(out[v])
                for d in out[v]:
                    contrib[d] += share
        dm = sum(rank[v] for v in nodes if not out[v])
        rank = {
            v: (3 * base[v]) // 20 + (17 * (contrib[v] + dm // n)) // 20
            for v in nodes
        }
    return rank


def test_pagerank_dangling_mass_redistributed(spark):
    """Graph with a SINK (node 3 has no out-edges): its inbound mass
    must flow back uniformly instead of leaking; every node matches the
    pure-Python textbook reference exactly, and the sink itself holds
    rank (it would be absent entirely under the old sources-only node
    set)."""
    pairs = [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3)]
    want = _reference_pagerank(pairs, 3)
    got = {
        r.node: r.rank_s
        for r in pagerank(_edges(spark, pairs), 3).collect()
    }
    assert got == want
    assert got[3] > 0
    # mass conserved up to integer floor losses
    assert sum(got.values()) == pytest.approx(MASS, rel=1e-3)


def test_pagerank_all_dangling_except_one(spark):
    """Extreme dangling case: 0->1, 0->2 — both leaves are sinks holding
    2/3 of the mass after round 1; reference equality pins the dm//n
    term end-to-end."""
    pairs = [(0, 1), (0, 2)]
    want = _reference_pagerank(pairs, 2)
    got = {
        r.node: r.rank_s
        for r in pagerank(_edges(spark, pairs), 2).collect()
    }
    assert got == want


def test_rrf_fuse_orders_by_summed_reciprocals(spark):
    r1 = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id: long, rank: long"
    )
    r2 = spark.createDataFrame(
        [(20, 1), (10, 2), (40, 3)], "doc_id: long, rank: long"
    )
    out = {r.doc_id: r for r in rrf_fuse([r1, r2], top_k=10).collect()}
    # 10 and 20 have symmetric (1,2)/(2,1) ranks: identical rrf, the
    # smaller doc_id wins the tiebreak
    assert out[10].rrf == out[20].rrf
    assert out[10].fused_rank == 1 and out[20].fused_rank == 2
    # single-list docs carry -1 for the missing ranker and score less
    assert out[30].r1 == -1 and out[40].r0 == -1
    assert out[30].rrf == pytest.approx(1.0 / 63.0)
    assert set(out) == {10, 20, 30, 40}


def test_hierarchy_closure_flattens_forest_with_dangling_parent(spark):
    """Pointer doubling must equal the per-level walk, treat dangling
    parents (dirty data) as terminal roots like a recursive CTE does,
    and keep depth = edges traversed."""
    import pytest

    from sparkdiff.operators.graph import hierarchy_closure

    #      0 (root)        7 -> 99 (dangling)
    #     / \
    #    1   2
    #    |
    #    3 -> 4 -> 5 (chain under 1: 3's parent is 1)
    rows = [
        (0, None), (1, 0), (2, 0), (3, 1), (4, 3), (5, 4),
        (7, 99),  # 99 is not a node
    ]
    df = spark.createDataFrame(rows, "node int, parent int")
    got = {
        r.node: (r.root, r.depth)
        for r in hierarchy_closure(df).collect()
    }
    assert got == {
        0: (0, 0), 1: (0, 1), 2: (0, 1), 3: (0, 2), 4: (0, 3),
        5: (0, 4), 7: (99, 1),
    }


def test_hierarchy_closure_raises_on_cycle(spark):
    import pytest

    from sparkdiff.operators.graph import hierarchy_closure

    df = spark.createDataFrame(
        [(1, 2), (2, 1)], "node int, parent int"
    )
    with pytest.raises(ValueError, match="cycle"):
        hierarchy_closure(df, max_rounds=5)


def test_hierarchy_closure_deep_chain_uses_log_rounds(spark):
    """A 4096-deep path settles under doubling (12 rounds of joins);
    per-level recursion would need 4096 joins and never finish inside
    the max_rounds=40 guard — so completing AT ALL certifies the
    doubling, and the depths must be exact."""
    from sparkdiff.operators.graph import hierarchy_closure

    n = 4096
    df = spark.createDataFrame(
        [(i, i - 1 if i > 0 else None) for i in range(n)],
        "node int, parent int",
    )
    got = {r.node: (r.root, r.depth) for r in hierarchy_closure(df).collect()}
    assert len(got) == n
    assert got[0] == (0, 0)
    assert got[1] == (0, 1)
    assert got[n - 1] == (0, n - 1)
    assert all(root == 0 and depth == node for node, (root, depth) in got.items())
