"""Similarity search over embedding columns (``array<float>``).

The reference does cosine similarity row-at-a-time in Python over MiniLM
vectors (``agents/slack_search_agent.py:50-53``) and k-NN through an
in-process FAISS store (``tools/rag_tool.py:41-46``).  Here:

- ``cosine_topk``   — brute-force baseline: broadcast the (small) query
  set, JVM-native fold for the dot product, ``row_number`` top-k.  Exact;
  O(|Q|·|C|) but fully data-parallel over the corpus.
- ``lsh_cosine_topk`` — scale path: random-hyperplane (SRP) bucketing;
  only pairs sharing a bucket are scored.  Approximate; at 100 TB the
  bucket join replaces the cross product (same shape as a real IVF
  coarse quantizer).

All arithmetic is double-precision with an explicit fold order so results
are engine-exact and reproducible under any partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: k at which semdedup's cluster assignment switches from flat Lloyd
#: (O(n·k·d), bit-pinned by the q88/q136 oracles at driver scales where
#: auto-k stays below this) to the coarse-then-fine hierarchical form
#: (O(n·√k·d), `operators/retrieval.kmeans_assign_hierarchical`).
HIERARCHICAL_K_THRESHOLD = 64


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic IEEE order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """``dot / (|a| * |b|)`` with a zero-norm guard."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(
        d / (na * nb)
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int,
) -> DataFrame:
    """Exact top-k neighbors per query: ``(query_id, corpus_id, cosine,
    rank)``.  The query side is broadcast, so the corpus is scanned once
    with no shuffle; the only shuffle is the per-query top-k window."""
    q = queries.select(
        F.col(query_id).alias("query_id"), _as_double(F.col(query_vec)).alias("qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("corpus_id"), _as_double(F.col(corpus_vec)).alias("cv")
    )
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        "corpus_id",
        cosine(F.col("qv"), F.col("cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def quantize_embeddings(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``(id, qvec array<int>,
    qss long)`` with ``q_i = floor(x_i · 127 / max|x| + 0.5)`` (round
    half up; the all-zero vector quantizes to zeros) and ``qss`` the
    exact integer sum of squares (the norm the quantized cosine needs,
    precomputed once per vector).

    This is the memory/bandwidth lever of large-scale ANN: int8 vectors
    are 4× smaller than float32 — 4× more corpus per executor page, 4×
    less shuffle — while similarity math becomes EXACT integer
    arithmetic (engine- and partitioning-independent; no float-sum
    ordering concerns).  The scale is per-vector, so no corpus pass is
    needed to calibrate.

    Companion to :func:`quantize_int8` (which reports compression
    error statistics without emitting codes, q89); this one emits the
    codes an ANN index actually stores, and rounds half-up (a strictly
    tighter quantizer than q89's floor — kept distinct so q89's
    pinned oracle stays byte-stable).

    Plan shape: ``_mx`` (the max-abs scale) is materialized in its own
    projection and referenced twice downstream — the CollapseProject
    non-cheap-multi-reference guard keeps Catalyst from inlining the
    array_max into the quantize lambda (the per-element HOF
    re-evaluation hazard, SCALE.md #1)."""
    v = _as_double(F.col(vec_col))
    base = df.select(F.col(id_col).alias("_qid"), v.alias("_v")).withColumn(
        "_mx", F.array_max(F.transform(F.col("_v"), lambda x: F.abs(x)))
    )
    quant = F.when(
        F.col("_mx") > 0.0,
        F.transform(
            F.col("_v"),
            lambda x: F.floor(x * F.lit(127.0) / F.col("_mx") + F.lit(0.5)).cast(
                "int"
            ),
        ),
    ).otherwise(F.transform(F.col("_v"), lambda x: F.lit(0)))
    out = base.select(F.col("_qid").alias(id_col), quant.alias("qvec"))
    return out.withColumn(
        "qss",
        F.aggregate(
            F.transform(F.col("qvec"), lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product (long accumulator — order-independent,
    so safe under any partitioning/codegen plan)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def jl_signs(in_dim: int, out_dim: int, salt: str = "jl") -> list[list[float]]:
    """Deterministic ±1 Johnson–Lindenstrauss projection matrix:
    cell (i, j) is the parity of the md5 of ``salt:i:j`` — computed
    DRIVER-SIDE, so the Spark plan and any SQL oracle embed the exact
    same literal signs (the Achlioptas 2003 database-friendly JL
    variant: ±1 entries preserve pairwise distances within (1±ε) at
    out_dim = O(log n / ε²), no Gaussian sampling needed)."""
    import hashlib

    return [
        [
            1.0
            if int(
                hashlib.md5(f"{salt}:{i}:{j}".encode()).hexdigest()[:15], 16
            )
            % 2
            == 0
            else -1.0
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def jl_project(vec: Column, signs: list[list[float]]) -> Column:
    """Project a vector to ``len(signs)`` dims as a pure column
    expression (sign matrix inlined as a nested array literal; each
    output dim a zip_with/aggregate fold).  Fine for SMALL matrices —
    for production sizes use :func:`with_jl_projection`, because a
    64×16 literal costs ~2.4 s of driver ANALYSIS time per plan that
    references it (measured; the multiplier is every lineage
    re-derivation, which took q155 to 14.9 s end-to-end)."""
    v = _as_double(vec)
    signs_lit = F.array(
        *[F.array(*[F.lit(float(s)) for s in row]) for row in signs]
    )
    return F.transform(
        signs_lit,
        lambda row: F.aggregate(
            F.zip_with(row, v, lambda s, x: s * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def with_jl_projection(
    df: DataFrame,
    vec_col: str,
    signs: list[list[float]],
    out_col: str = "p",
) -> DataFrame:
    """Add the JL projection of ``vec_col`` as ``out_col`` — the
    dimensionality lever of the ANN compression ladder (4× fewer dims
    before int8 q150 / PQ q152 even start).

    The sign matrix rides as a ONE-ROW broadcast relation
    (LocalRelation → BroadcastNestedLoopJoin of one row — the repo's
    documented one-row-aggregate pattern), NOT as an expression
    literal: a 64×16 nested array literal costs ~2.4 s of driver
    analysis PER PLAN that re-derives the lineage (measured on q155:
    14.9 s end-to-end as a literal, ~2 s as data).  Values are
    identical — same fold order, and the matrix entries are the same
    doubles whether they arrive as literal or broadcast data.

    Math: ``out[j] = Σ_i signs[j][i] · v[i]`` — left fold in i order,
    engine-exact (``s*x`` IEEE-commutes)."""
    from sparkdiff.operators._util import reserve_columns

    reserve_columns(df, ("_jl_s",), "with_jl_projection")
    spark = df.sparkSession
    sdf = spark.createDataFrame(
        [([list(map(float, row)) for row in signs],)],
        "_jl_s: array<array<double>>",
    )
    v = _as_double(F.col(vec_col))
    proj = F.transform(
        F.col("_jl_s"),
        lambda row: F.aggregate(
            F.zip_with(row, v, lambda s, x: s * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (
        df.crossJoin(F.broadcast(sdf))
        .withColumn(out_col, proj)
        .drop("_jl_s")
    )


def dot_const(vec: Column, coefs: list[float]) -> Column:
    """Dot product against a CONSTANT vector as a flat left-associated
    expression tree (``v[0]*c0 + v[1]*c1 + …``).

    Bit-identical to the :func:`dot` fold (the fold's ``0.0 + x`` seed is
    exact), but whole-stage-codegen-able: higher-order-function lambdas
    run interpreted per element, which made fold-based SRP signatures the
    hot spot once dozens of planes multiply the per-row work.
    """
    out: Column | None = None
    for i, c in enumerate(coefs):
        term = vec[i] * F.lit(float(c))
        out = term if out is None else out + term
    return out if out is not None else F.lit(0.0)


def srp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bit signature (one int per plane block of
    up to 31 bits)."""
    bits = [(dot_const(vec, p) >= 0).cast("int") for p in planes]
    out = F.lit(0)
    for i, b in enumerate(bits):
        out = out + b * F.lit(1 << i)
    return out


def _deterministic_planes(n_planes: int, dim: int, seed: int = 0x9E37) -> list[list[float]]:
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (6364136223846793005 * state + 1442695040888963407) % (1 << 63)
            # uniform in [-1, 1): sign-projection only needs symmetry
            row.append((state / float(1 << 62)) - 1.0)
        planes.append(row)
    return planes


_PROBE_EXPR_MAX_NODES = 4096


def _probe_cells(centroids: list[list[float]], n_probe: int):
    """Column producing the ``n_probe`` best cells (by centroid dot
    product, score desc / cell asc on ties) for the ``_nv`` query vector.

    Two physical strategies behind one logical contract:

    - **small codebooks** (n_clusters*dim ≤ 4096): a flat
      whole-stage-codegen-able expression tree (``dot_const`` per
      centroid, ``array_sort`` for top-n_probe).  Per-row, shuffle-free.
    - **large codebooks** (thousands of cells — a real IVF at 100 TB):
      the expression tree would put n_clusters*dim literal nodes into
      Catalyst (analysis blows up long before execution), so probe via
      one Arrow-batched numpy matmul — queries×centroids per batch,
      task-broadcast codebook, still per-row and shuffle-free.
    """
    n_nodes = len(centroids) * (len(centroids[0]) if centroids else 0)
    if n_nodes <= _PROBE_EXPR_MAX_NODES:
        cell_scores = F.array(
            *[
                F.struct(
                    dot_const(F.col("_nv"), ctr).alias("score"),
                    F.lit(i).alias("cell"),
                )
                for i, ctr in enumerate(centroids)
            ]
        )
        # array_sort is (score asc, cell asc); reversed → score desc,
        # cell desc on ties — mirrored below by lexsort's key order
        return F.slice(F.reverse(F.array_sort(cell_scores)), 1, n_probe)[
            "cell"
        ]

    C = np.array([list(map(float, c)) for c in centroids])

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def top_cells(vs: pd.Series) -> pd.Series:
        V = np.stack([np.asarray(x, dtype=np.float64) for x in vs])
        S = V @ C.T  # (n_queries_in_batch, n_clusters)
        cells = np.arange(S.shape[1])
        order = np.lexsort((-cells[None, :].repeat(S.shape[0], 0), -S), axis=1)
        return pd.Series(list(order[:, :n_probe].astype(np.int32)))

    return top_cells(F.col("_nv"))


def ivf_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int,
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-style approximate top-k: a KMeans coarse quantizer partitions
    the (L2-normalized) corpus into ``n_clusters`` inverted lists; each
    query scores only the ``n_probe`` nearest lists.

    On normalized vectors, euclidean-argmin assignment == cosine-argmax,
    so a query probing its own cell always finds an exact-duplicate
    vector.  At scale this is the real ANN shape: the corpus is scanned
    once at build time, and per-query work is |corpus| * n_probe /
    n_clusters.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    def _normalized(df, idc, vc):
        # two-step: materialize the norm before the per-element lambda
        # (interpreted HOF lambdas re-evaluate captured expressions per
        # element — see SCALE.md)
        step = df.select(
            F.col(idc).alias("_id"), _as_double(F.col(vc)).alias("_dv")
        ).withColumn("_n", norm(F.col("_dv")))
        nv = F.when(F.col("_n") == 0, F.col("_dv")).otherwise(
            F.transform(F.col("_dv"), lambda x: x / F.col("_n"))
        )
        return step.select("_id", nv.alias("_nv"))

    c = _normalized(corpus, corpus_id, corpus_vec)
    q = _normalized(queries, query_id, query_vec)

    train = c.select("_id", array_to_vector(F.col("_nv")).alias("features"))
    model = KMeans(k=n_clusters, seed=seed, maxIter=10).fit(train)
    assigned = model.transform(train).select(
        F.col("_id").alias("corpus_id"), F.col("prediction").alias("cell")
    )
    c_cells = c.join(
        assigned, c["_id"] == assigned["corpus_id"]
    ).select("corpus_id", F.col("_nv").alias("cv"), "cell")

    centroids = [list(map(float, ctr)) for ctr in model.clusterCenters()]
    probed = q.select(
        F.col("_id").alias("query_id"),
        F.col("_nv").alias("qv"),
        F.explode(_probe_cells(centroids, n_probe)).alias("cell"),
    )
    scored = c_cells.join(F.broadcast(probed), "cell").select(
        "query_id", "corpus_id", cosine(F.col("qv"), F.col("cv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _srp_band_keys_udf(planes: list[list[float]], bands: int, rows_per_band: int):
    """Arrow-batched band-key computation: for each vector, one int key
    per band built from ``rows_per_band`` SRP sign bits.

    The dot products accumulate SEQUENTIALLY OVER DIMENSIONS (vectorized
    across rows and planes), i.e. the exact IEEE order of the
    :func:`dot` left fold — so the signs, and therefore the candidate
    sets, are bit-reproducible by any engine running the same fold (the
    DuckDB oracle does).  A flat Column-expression formulation of the
    same math is ~3 orders of magnitude slower to ANALYZE (bands ×
    rows × dim literal nodes blow up Catalyst), which is why this one
    step is a pandas UDF in an otherwise JVM-native pipeline.
    """
    P = [list(map(float, p)) for p in planes]

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def band_keys(vs: pd.Series) -> pd.Series:
        A = np.array(P)  # (n_planes, dim)
        V = np.stack([np.asarray(x, dtype=np.float64) for x in vs])  # (n, dim)
        acc = np.zeros((V.shape[0], A.shape[0]))
        for i in range(A.shape[1]):
            acc = acc + V[:, i : i + 1] * A[None, :, i]
        bits = (acc >= 0).astype(np.int64)
        keys = np.zeros((V.shape[0], bands), dtype=np.int64)
        for p_idx in range(A.shape[0]):
            keys[:, p_idx // rows_per_band] += bits[:, p_idx] << (
                p_idx % rows_per_band
            )
        return pd.Series(list(keys.astype(np.int32)))

    return band_keys


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.99,
    dim: int = 64,
    bands: int = 6,
    rows_per_band: int = 12,
    seed: int = 0x9E37,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs ``(id_a, id_b, cosine)``
    with cosine ≥ threshold — the vector-space member of the dedup
    family (exact / MinHash / SimHash / n-gram / THIS).

    Banded SRP-LSH, same scale shape as MinHash-LSH: ``bands`` band keys
    of ``rows_per_band`` sign bits per vector, a self-equi-join on
    (band, key) for candidates (NO all-pairs stage), then exact cosine
    verification on candidates only.  A plane agrees on a pair with
    probability ``1 - θ/π``; near-identical vectors (θ≈0) survive a
    12-bit band with p≈0.89 and six bands with p≈1-1e-6, while random
    pairs (θ≈π/2) pass a band with 0.5^12 ≈ 0.02% — the verify join
    stays linear in corpus size.
    """
    if not 1 <= rows_per_band <= 31:
        raise ValueError(
            f"rows_per_band must be in [1, 31] (band keys are int32 bit "
            f"packs), got {rows_per_band}"
        )
    planes = _deterministic_planes(bands * rows_per_band, dim, seed)
    v = df.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
    )
    keys = v.select(
        "_id",
        F.posexplode(
            _srp_band_keys_udf(planes, bands, rows_per_band)(F.col("_v"))
        ).alias("band", "key"),
    ).persist()
    # persisted: BOTH self-join sides consume the key table — without
    # it each side re-runs the ArrowEvalPython band-keyer over the
    # corpus (guide §4: don't pay the Python boundary twice).  n×bands
    # integer rows (callers carry PERSISTS_BY_DESIGN).
    a = keys.select(F.col("_id").alias("id_a"), "band", "key")
    b = keys.select(F.col("_id").alias("id_b"), "band", "key")
    cands = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = v.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"))
    vb = v.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"))
    verified = cands.join(va, "id_a").join(vb, "id_b").select(
        "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cosine")
    )
    return verified.filter(F.col("cosine") >= threshold)


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int,
    dim: int,
    n_planes: int = 12,
) -> DataFrame:
    """Approximate top-k: score only (query, corpus) pairs whose SRP
    bucket matches.  Recall trades off with ``n_planes`` (more planes →
    smaller buckets → faster, lower recall)."""
    planes = _deterministic_planes(n_planes, dim)
    q = queries.select(
        F.col(query_id).alias("query_id"),
        _as_double(F.col(query_vec)).alias("qv"),
    ).withColumn("bucket", srp_signature(F.col("qv"), planes))
    c = corpus.select(
        F.col(corpus_id).alias("corpus_id"),
        _as_double(F.col(corpus_vec)).alias("cv"),
    ).withColumn("bucket", srp_signature(F.col("cv"), planes))
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id", "corpus_id", cosine(F.col("qv"), F.col("cv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def dot_flat(a: Column, b: Column, dim: int) -> Column:
    """Pair dot product as a FLAT left-associated expression tree
    (``a[0]*b[0] + a[1]*b[1] + …``) for a known dimension.

    Bit-identical to the :func:`dot` fold (the fold's ``0.0 + x`` seed
    is exact, and both add terms left-to-right), but whole-stage-
    codegen-able — the :func:`dot` higher-order-function lambda runs
    interpreted per element, which dominates once an all-pairs stage
    multiplies the per-row work (see :func:`semdedup`).
    """
    out: Column | None = None
    for i in range(dim):
        term = a[i] * b[i]
        out = term if out is None else out + term
    return out if out is not None else F.lit(0.0)


def norm_flat(a: Column, dim: int) -> Column:
    """Codegen-able twin of :func:`norm` (same left-to-right order)."""
    return F.sqrt(dot_flat(a, a, dim))


def cosine_flat(a: Column, b: Column, dim: int) -> Column:
    """Codegen-able twin of :func:`cosine` (same guard, same order)."""
    d = dot_flat(a, b, dim)
    na, nb = norm_flat(a, dim), norm_flat(b, dim)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(
        d / (na * nb)
    )


def semdedup(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    k: int | None = None,
    iters: int = 2,
    threshold: float = 0.99,
    dim: int | None = None,
    pair_salt: int = 1,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with k-means, compare
    vectors ONLY within their cluster, and drop every vector that has a
    near-identical (cosine ≥ ``threshold``) neighbor with a smaller id.

    Returns ``(id_col, cluster, n_near, kept)`` — one row per input
    vector; ``n_near`` counts smaller-id within-cluster neighbors above
    the threshold and ``kept`` is 1 iff there are none (the smallest id
    of each semantic-duplicate group survives, matching the exact-dedup
    keep-min contract of q19).

    Scale shape: the k-means pass is the bounded Lloyd of
    ``operators/retrieval.kmeans_assign`` (corpus never shuffles for
    assignment).  The all-pairs stage is confined to one cluster per
    pair — the cluster count is the knob that bounds the quadratic term
    (SemDeDup runs k ≈ 10% of corpus size at production scale, making
    expected cluster populations O(10)); the pair join itself is a plain
    equi-join on the cluster id, so it shuffles each vector once.
    ``k=None`` (the scale-safe default for ad-hoc use) derives
    ``k = max(4, n // 100)`` from one corpus count, keeping expected
    cell population ~100 at any corpus size; pass an explicit ``k``
    (as the oracle-pinned q88 does) when the build must stay lazy and
    the answer engine-reproducible.  ``dim=None`` probes the vector
    dimensionality from one row; both fallbacks run an eager job, so
    registry queries pass both explicitly.

    The threshold test uses the MULTIPLICATIVE cosine form
    ``dot(a,b) ≥ t · (‖a‖ · ‖b‖) AND ‖a‖ · ‖b‖ > 0`` with the norms
    computed once per ROW (flat codegen'd sums, carried as scalar
    columns through the pair join).  The ``‖a‖·‖b‖ > 0`` conjunct is
    the zero-norm guard (rhs = 0 would make the threshold test
    vacuously true for zero vectors); written as the PRODUCT it
    references BOTH sides, so Catalyst cannot push it down.  (Split
    per-side ``‖·‖ > 0`` guards get pushed into the scans with the norm
    expression inlined over the raw cast-transform — the per-element
    HOF re-evaluation hazard again, measured 2x slower.)
    Earlier forms, measured at sf0.1: full ``cosine_flat`` in the pair
    filter = three 64-term sums + two sqrts per pair (5.3 s);
    pre-normalized vectors via a ``transform`` HOF = the pair join
    consuming a CodegenFallback array column (80 s).  The scalar-norm
    multiplicative form keeps per-pair work to ONE flat product sum +
    two multiplies, all whole-stage-codegen'd.
    """
    from sparkdiff.operators.retrieval import kmeans_assign

    base = vectors.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
    )
    if dim is None:
        # one-row bounded probe — EAGER (runs a job at construction);
        # pass ``dim`` explicitly to keep the build fully lazy
        dim = len(base.select("_v").first()[0])
    if k is None:
        # k ∝ n is the scale-safe default: expected cell population
        # stays O(100) as the corpus grows, so the within-cell
        # quadratic term stays linear overall (the probe measured
        # fixed k=16 going 1.9x-the-ratio at 4x corpus; SemDeDup runs
        # k ≈ 10% of corpus at production scale).  One corpus count —
        # EAGER; pass explicit ``k`` for a lazy, oracle-pinnable build.
        k = max(4, base.count() // 100)
    if k >= HIERARCHICAL_K_THRESHOLD:
        # auto-k makes FLAT assignment O(n·k·d) = O(n²·d/100) — the
        # round-9 64×-replica probe measured it as a >20-minute job at
        # n=336k.  Past the threshold the coarse-then-fine form
        # (O(n·√k·d)) takes over; cell populations keep the same ~100
        # expectation, which is the property the pair scan needs.  The
        # driver/oracle scales (sf0.01 → k=5, sf0.1 → k=52) stay on
        # the bit-pinned flat path below the threshold.
        from sparkdiff.operators.retrieval import kmeans_assign_hierarchical

        assigned = kmeans_assign_hierarchical(
            base, "_id", "_v", k=k, iters=iters
        ).select("_id", "cluster")
    else:
        # dim -> the codegen'd flat distance in the Lloyd rounds
        # (bit-identical fold order; round 9)
        assigned = kmeans_assign(
            base, "_id", "_v", k=k, iters=iters, dim=dim
        ).select("_id", "cluster")
    withnorm = base.select(
        "_id", "_v", norm_flat(F.col("_v"), dim).alias("_n")
    )
    # Persist the assigned+norm projection: it feeds THREE consumers
    # (both pair-join sides and the final outer join) whose lineages
    # would otherwise each re-run the Lloyd assignment — 11 s vs 1.7 s
    # at sf0.1.  At scale this is the (id, cluster, vec, norm) table
    # SemDeDup materializes anyway; MEMORY_AND_DISK spills rather than
    # OOMs.
    withn = (
        assigned.join(withnorm, "_id")
        .select("_id", "cluster", "_v", "_n")
        .persist()
    )
    # ``pair_salt`` B > 1 parallelizes the within-cluster pair scan when
    # the CLUSTER DOMAIN caps reducer parallelism (guide §2.5's
    # too-few-distinct-keys hazard: q88's oracle-pinned k=4 puts ALL
    # pair work on 4 reducers regardless of core count).  One-sided
    # salting: each b-row keeps its deterministic bucket
    # pmod(xxhash64(id), B); each a-row replicates to every target
    # bucket, so any (a, b) pair meets exactly once — on b's bucket —
    # and the join output (and thus the value hash) is unchanged.
    # Parallelism k·B, a-side shuffle ×B (bounded, B is a constant);
    # the scale-default k ∝ n already yields enough clusters, so B=1
    # (plan unchanged) is the default and salting is for pinned-small-k
    # callers.
    join_keys = ["cluster"]
    a = withn.select(
        F.col("cluster"),
        F.col("_id").alias("_ida"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = withn.select(
        F.col("cluster"),
        F.col("_id").alias("_idb"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    if pair_salt > 1:
        join_keys = ["cluster", "_bk"]
        a = a.withColumn(
            "_bk",
            F.explode(F.sequence(F.lit(0), F.lit(pair_salt - 1))),
        )
        b = b.withColumn(
            "_bk",
            F.pmod(F.xxhash64(F.col("_idb")), F.lit(pair_salt)).cast("int"),
        )
    near = (
        a.join(b, join_keys)
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(
            (
                dot_flat(F.col("_va"), F.col("_vb"), dim)
                >= F.lit(float(threshold))
                * (F.col("_na") * F.col("_nb"))
            )
            & ((F.col("_na") * F.col("_nb")) > F.lit(0.0))
        )
        .groupBy(F.col("_idb").alias("_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_near"))
    )
    return (
        withn.join(near, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "cluster",
            F.coalesce(F.col("n_near"), F.lit(0)).cast("long").alias("n_near"),
            (F.coalesce(F.col("n_near"), F.lit(0)) == 0)
            .cast("int")
            .alias("kept"),
        )
    )


def quantize_int8(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "v"
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization with an exact,
    engine-portable error report — the storage-compression step an
    embedding store applies before ANN indexing (4x smaller, cache-
    resident codebooks).

    ``code_i = floor(v_i * 127 / amax)`` (amax = per-vector max |v_i|);
    reconstruction ``code_i * amax / 127``.  Every step is IEEE-754
    double multiply/divide/floor — correctly rounded and therefore
    bit-identical across engines — and the per-vector error total sums
    ``floor(|err_i| * 2^40)`` longs in array order, so the result is
    hash-stable (a raw double error sum would not be).  Zero vectors
    quantize to all-zero codes (guard against 0/0 -> NaN).

    Returns ``(id_col, n_dims, max_code, min_code, qerr_s)``.  Purely
    per-row column expressions: no shuffle, no UDF, identical plan at
    any scale.
    """
    ERR_SCALE = float(1 << 40)
    base = vectors.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
    )
    amax = F.array_max(F.transform(F.col("_v"), F.abs))
    q = base.select(
        "_id",
        "_v",
        amax.alias("_amax"),
    )
    codes = F.when(
        F.col("_amax") == 0.0,
        F.transform(F.col("_v"), lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(
            F.col("_v"),
            lambda x: F.floor(x * F.lit(127.0) / F.col("_amax")),
        )
    )
    c = q.select("_id", "_v", "_amax", codes.alias("_codes"))
    qerr = F.aggregate(
        F.zip_with(
            F.col("_v"),
            F.col("_codes"),
            lambda x, cd: F.floor(
                F.abs(x - cd.cast("double") * F.col("_amax") / F.lit(127.0))
                * F.lit(ERR_SCALE)
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return c.select(
        F.col("_id").alias(id_col),
        F.size("_v").cast("long").alias("n_dims"),
        F.array_max("_codes").cast("long").alias("max_code"),
        F.array_min("_codes").cast("long").alias("min_code"),
        qerr.cast("long").alias("qerr_s"),
    )


def embedding_cross_matches(
    corpus: DataFrame,
    probes: DataFrame,
    corpus_id: str,
    probe_id: str,
    corpus_vec: str,
    probe_vec: str,
    threshold: float = 0.99,
    dim: int = 64,
    bands: int = 6,
    rows_per_band: int = 12,
    seed: int = 0x9E37,
) -> DataFrame:
    """Cross-set cosine matches ``(corpus_id, probe_id, cosine)`` with
    cosine ≥ threshold — :func:`embedding_near_dup_pairs`'s CROSS-SET
    twin: dedup asks "which corpus items duplicate EACH OTHER", this
    asks "which corpus items match a PROBE set" (semantic benchmark
    decontamination, leaked-document lookup, reference-set screening).

    Identical scale shape: both sides sign against the SAME plane set,
    candidates come from a (band, key) equi-join of corpus keys against
    probe keys — probes × corpus never materializes — and the exact
    cosine verifies candidates only.  Probe sets are typically eval
    benchmarks (10³–10⁵ rows), so the probe side of the join broadcasts
    under AQE for free."""
    if not 1 <= rows_per_band <= 31:
        raise ValueError(
            f"rows_per_band must be in [1, 31] (band keys are int32 bit "
            f"packs), got {rows_per_band}"
        )
    planes = _deterministic_planes(bands * rows_per_band, dim, seed)
    keyer = _srp_band_keys_udf(planes, bands, rows_per_band)
    c = corpus.select(
        F.col(corpus_id).alias("_cid"), _as_double(F.col(corpus_vec)).alias("_cv")
    )
    p = probes.select(
        F.col(probe_id).alias("_pid"), _as_double(F.col(probe_vec)).alias("_pv")
    )
    ck = c.select(
        "_cid", F.posexplode(keyer(F.col("_cv"))).alias("band", "key")
    )
    pk = p.select(
        "_pid", F.posexplode(keyer(F.col("_pv"))).alias("band", "key")
    )
    cands = ck.join(pk, ["band", "key"]).select("_cid", "_pid").distinct()
    verified = (
        cands.join(c, "_cid")
        .join(p, "_pid")
        .select(
            F.col("_cid").alias("corpus_id"),
            F.col("_pid").alias("probe_id"),
            cosine(F.col("_cv"), F.col("_pv")).alias("cosine"),
        )
    )
    return verified.filter(F.col("cosine") >= threshold)
