"""Connected components (large-star/small-star) vs a Python union-find
oracle on random graphs, plus the worst-case chain and the dedup-cluster
wrapper's canonical-representative contract."""

from __future__ import annotations

import random
from collections import defaultdict

from sparkdiff.operators.cluster import connected_components, dedup_clusters


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = defaultdict(list)
    for n in nodes:
        comps[find(n)].append(n)
    return {n: min(members) for members in comps.values() for n in members}


def test_components_match_union_find_on_random_graphs(spark):
    rng = random.Random(42)
    for n_nodes, n_edges in [(50, 40), (200, 150), (300, 600), (1000, 300)]:
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        nodes = sorted({x for e in edges for x in e})
        expected = _uf_components(edges, nodes)
        edf = spark.createDataFrame(edges, "src long, dst long")
        got = {r["id"]: r["component"] for r in connected_components(edf).collect()}
        assert got == expected


def test_components_long_chain(spark):
    # a path graph maximizes rounds-to-converge for naive propagation;
    # star-contraction must still collapse it to one component
    edf = spark.createDataFrame([(i, i + 1) for i in range(500)], "src long, dst long")
    rows = connected_components(edf).collect()
    assert len(rows) == 501
    assert all(r["component"] == 0 for r in rows)


def test_dedup_clusters_canonical_contract(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "id_a long, id_b long",
    )
    rows = {r["id"]: r for r in dedup_clusters(pairs).collect()}
    assert {r["cluster_id"] for r in rows.values()} == {1, 10, 20}
    # exactly one canonical member per cluster, and it is the min id
    canon = [r["id"] for r in rows.values() if r["is_canonical"]]
    assert sorted(canon) == [1, 10, 20]
    assert rows[3]["cluster_id"] == 1 and rows[3]["cluster_size"] == 3
    assert rows[11]["cluster_size"] == 2
