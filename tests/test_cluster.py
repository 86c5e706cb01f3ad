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


def test_keep_best_per_family_prefers_quality_over_order(spark):
    """Within a family the HIGHEST-scoring member is kept even when it
    has the larger id (the policy difference vs keep-first); singletons
    always keep; exactly one kept per family."""
    from sparkdiff.operators.cluster import keep_best_per_family

    labeled = spark.createDataFrame(
        [
            (1, 10, 0.2),   # family 10: id 1 is WORSE
            (2, 10, 0.9),   # ...id 2 is better -> kept despite larger id
            (3, 10, 0.9),   # tie with 2 -> lower id (2) wins
            (4, 40, 0.1),   # singleton
        ],
        "doc_id: long, family: long, q: double",
    )
    out = {r.doc_id: r.kept for r in
           keep_best_per_family(labeled, "doc_id", "q").collect()}
    assert out == {1: 0, 2: 1, 3: 0, 4: 1}


def test_dedup_families_matches_leakage_split_labels(spark):
    """The extracted family labeler gives the same labels the split
    operator uses (refactor equivalence), and rejects input frames that
    already carry a family column."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from sparkdiff.operators.cluster import dedup_families
    from sparkdiff.operators.sampling import leakage_safe_split
    from sparkdiff.session import load_table

    from .conftest import SF_DIR_SMALL

    d = load_table(spark, SF_DIR_SMALL, "documents").select("doc_id", "text")
    fams = {
        r.doc_id: r.family
        for r in dedup_families(
            d, "doc_id", "text", threshold=0.6, hash_method="md5"
        ).collect()
    }
    split = {
        r.doc_id: r.family
        for r in leakage_safe_split(
            d, "doc_id", "text", {"train": 0.5, "val": 0.5},
            threshold=0.6, hash_method="md5",
        ).collect()
    }
    assert fams == split and len(fams) == d.count()
    with _pytest.raises(ValueError, match="dedup_families"):
        dedup_families(d.withColumn("family", F.lit(1)), "doc_id", "text")
