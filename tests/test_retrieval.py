"""Unit tests for the retrieval operator library (kmeans / BM25 /
posting lists) and the CDC merge operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkdiff.operators.retrieval import (
    bm25_rank,
    kmeans_assign,
    posting_lists,
)
from sparkdiff.operators.workload import cdc_apply

from .conftest import SF_DIR_SMALL


def _vectors(spark):
    from sparkdiff.session import load_table

    return load_table(spark, SF_DIR_SMALL, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )


def test_kmeans_cost_non_increasing(spark):
    """Lloyd's invariant: total within-cluster cost never rises with
    more iterations."""
    e = _vectors(spark)
    costs = [
        kmeans_assign(e, "vec_id", "v", k=4, iters=i)
        .agg(F.sum("dist"))
        .collect()[0][0]
        for i in (1, 2, 3)
    ]
    assert costs[0] >= costs[1] >= costs[2]


def test_kmeans_deterministic_and_covering(spark):
    e = _vectors(spark)
    a = kmeans_assign(e, "vec_id", "v", k=4, iters=2)
    b = kmeans_assign(e, "vec_id", "v", k=4, iters=2)
    ra, rb = sorted(a.collect()), sorted(b.collect())
    assert ra == rb
    assert len(ra) == e.count()  # every vector assigned exactly once
    clusters = {r["cluster"] for r in ra}
    assert clusters <= {0, 1, 2, 3} and len(clusters) >= 2


def test_bm25_orders_by_term_frequency(spark):
    """All else equal (same dl), more hits of a query term => higher
    rank; a doc with zero hits scores 0."""
    rows = [
        (1, ["alpha", "beta", "gamma", "pad"]),
        (2, ["alpha", "alpha", "beta", "pad"]),
        (3, ["delta", "pad", "pad", "pad"]),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, _toks array<string>")
    out = {
        r["doc_id"]: (r["score"], r["rank"])
        for r in bm25_rank(docs, ["alpha", "beta"], top_k=10).collect()
    }
    assert out[2][0] > out[1][0] > out[3][0]
    assert out[2][1] == 1 and out[3][0] == 0.0


def test_bm25_precomputed_base_is_value_identical(spark):
    """Round-9 batch 7: ``bm25_rank`` persists its tf/dl projection and
    accepts it precomputed (``base=``, the q93 shared-projection path).
    Both paths must produce identical rows, and ``bm25_tf_base`` must
    carry exactly the (id, dl, tf_j) columns the scorer reads."""
    from sparkdiff.operators.retrieval import bm25_tf_base

    rows = [
        (1, ["alpha", "beta", "gamma", "pad"]),
        (2, ["alpha", "alpha", "beta", "pad"]),
        (3, ["delta", "pad", "pad", "pad"]),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, _toks array<string>")
    terms = ["alpha", "beta"]
    base = bm25_tf_base(docs, terms)
    assert base.columns == ["doc_id", "dl", "tf0", "tf1"]
    direct = sorted(bm25_rank(docs, terms, top_k=10).collect())
    via_base = sorted(bm25_rank(docs, terms, top_k=10, base=base).collect())
    assert direct == via_base
    spark.catalog.clearCache()


def test_posting_lists_df_band_and_sorted(spark):
    rows = [
        (10, "common"), (11, "common"), (12, "common"), (13, "common"),
        (20, "pair"), (21, "pair"),
        (30, "single"),
    ]
    tr = spark.createDataFrame(rows, "doc_id long, token string")
    out = {
        r["token"]: r
        for r in posting_lists(tr, max_df=3).collect()
    }
    assert set(out) == {"pair"}  # 'common' over cap, 'single' under min
    assert out["pair"]["df"] == 2
    assert out["pair"]["postings"] == "20,21"


def test_cdc_apply_latest_wins_delete_drops_insert_appears(spark):
    base = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300)], "k long, val long"
    )
    changes = spark.createDataFrame(
        [
            (1, 111, "U", 1),
            (1, 122, "U", 2),   # latest wins
            (2, None, "D", 1),  # delete drops
            (9, 900, "I", 1),   # insert appears
        ],
        "k long, val long, op string, seq int",
    )
    out = {r["k"]: (r["val"], r["src"]) for r in
           cdc_apply(base, changes, "k").collect()}
    assert out == {1: (122, "U"), 3: (300, "B"), 9: (900, "I")}


def test_embed_dim_constant_matches_fixture(spark):
    """testkit.EMBED_DIM replaces the one-row first() probes (lazy
    registry); it must track the driver-generated fixture."""
    from sparkdiff.session import load_table
    from sparkdiff.testkit import EMBED_DIM

    row = (
        load_table(spark, SF_DIR_SMALL, "embeddings")
        .select(F.size("embedding").alias("d"))
        .first()
    )
    assert row["d"] == EMBED_DIM


def test_pq_encode_codes_and_self_recall(spark):
    """With k = n tiny corpus the Lloyd seeds ARE the vectors, so every
    vector is its own centroid: codes are unique per subspace, the
    codebook has m*k rows, and ADC top-1 of each vector-as-query is the
    vector itself (distance exactly 0).  Partition count must not
    change any of it."""
    from sparkdiff.operators.retrieval import pq_adc_topk, pq_encode

    vecs = [
        (0, [0.0, 0.0, 9.0, 9.0]),
        (1, [5.0, 5.0, 1.0, 1.0]),
        (2, [9.0, 0.0, 5.0, 5.0]),
        (3, [1.0, 8.0, 0.0, 9.0]),
    ]
    e = spark.createDataFrame(vecs, "vec_id: long, v: array<double>")
    codes, cb = pq_encode(e, "vec_id", "v", m=2, sub_dim=2, k=4, iters=1)
    crows = codes.collect()
    assert len(crows) == 8  # 4 vectors x 2 subspaces
    assert cb.count() == 8  # 2 subspaces x 4 centroids
    for sub in (0, 1):
        per = sorted(r.code for r in crows if r.sub == sub)
        assert per == [0, 1, 2, 3]  # unique codes: every vec its own cell
    q = e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    top1 = pq_adc_topk(
        codes, cb, q, vec_col="qv", m=2, sub_dim=2, top_k=1
    ).collect()
    assert {(r.query_id, r.vec_id) for r in top1} == {(i, i) for i in range(4)}
    assert all(r.adc == 0.0 for r in top1)
    # partition-invariant
    codes7, cb7 = pq_encode(
        e.repartition(7), "vec_id", "v", m=2, sub_dim=2, k=4, iters=1
    )
    assert sorted(map(tuple, codes7.collect())) == sorted(map(tuple, crows))


def test_pq_groups_identical_subvectors(spark):
    """Vectors sharing a subvector must share that subspace's code even
    when their OTHER subspace differs — the independence that gives PQ
    k^m effective cells from m*k centroids."""
    from sparkdiff.operators.retrieval import pq_encode

    # seeds are ids 0 and 1 — they must DIFFER within each subspace or
    # the duplicate seed collapses a cluster (ties break to the lower
    # cluster id and the empty cell drops out of the codebook)
    e = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 9.0, 9.0]),
            (1, [9.0, 9.0, 1.0, 1.0]),
            (2, [0.0, 0.0, 1.0, 1.0]),  # sub0 of 0, sub1 of 1
        ],
        "vec_id: long, v: array<double>",
    )
    codes, _ = pq_encode(e, "vec_id", "v", m=2, sub_dim=2, k=2, iters=2)
    c = {(r.vec_id, r.sub): r.code for r in codes.collect()}
    assert c[(0, 0)] == c[(2, 0)]
    assert c[(1, 1)] == c[(2, 1)]
    assert c[(0, 1)] != c[(2, 1)]
    assert c[(1, 0)] != c[(2, 0)]
