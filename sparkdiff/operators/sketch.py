"""Count-min sketch (Cormode & Muthukrishnan 2005, J. Algorithms):
the MERGEABLE heavy-hitter/frequency sketch — fixed d×w integer
matrix, one-sided error (estimates never undercount), and two sketches
merge by cell-wise addition.  At 100 TB that is the whole point: every
partition/day/source builds its own d×w grid, grids add, and the final
table is d·w rows regardless of corpus size — the counts analogue of
the Bloom filter (operators/bloom.py) and the HLL NDV twin
(operators/profile.py), completing the repo's sketch family.

Determinism: the d hash rows are the repo's standard md5 60-bit
construction (``conv(substr(md5(token || salt || row), 1, 15), 16,
10) % w``) — engine-portable, so the ENTIRE sketch (cell values,
probe buckets, min-estimates) is replayable in ANSI SQL and value-hash
oracled (q154).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(token: Column | str, row: int, w: int, salt: str) -> Column:
    """Row-``row``'s bucket for ``token``: md5-60-bit hash mod ``w``
    (non-negative, so ``%`` and ``pmod`` agree across engines)."""
    t = F.col(token) if isinstance(token, str) else token
    h = F.conv(
        F.substring(F.md5(F.concat(t, F.lit(f"{salt}{row}"))), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(w)).cast("long")


def _row_buckets(token_col: str, d: int, w: int, salt: str) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("r"),
                cms_bucket(token_col, i, w, salt).alias("b"),
            )
            for i in range(d)
        ]
    )


def count_min_sketch(
    occurrences: DataFrame,
    token_col: str = "token",
    d: int = 4,
    w: int = 1024,
    salt: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: returns ``(r, b, cnt)`` with at most d·w rows.
    One corpus scan, one map-side-combined aggregation over a
    d·w-bounded key space — mergeable with any other sketch of the same
    (d, w, salt) by summing ``cnt`` per (r, b).

    Two input shapes, identical cells: one row per OCCURRENCE
    (``weight_col=None`` — the streaming shape), or one row per
    DISTINCT token with ``weight_col`` its occurrence count — the batch
    shape when a frequency table already exists, hashing vocab-sized
    rows instead of exploding every occurrence d× (q154: the d·|corpus
    tokens| explode was the query's whole cost; the weighted build
    hashes |vocab| rows)."""
    if d < 1 or w < 1:
        raise ValueError(f"d and w must be >= 1, got {d}, {w}")
    wcol = (
        F.lit(1).cast("long")
        if weight_col is None
        else F.col(weight_col).cast("long")
    )
    return (
        occurrences.select(
            wcol.alias("_cms_w"),
            F.explode(_row_buckets(token_col, d, w, salt)).alias("rb"),
        )
        .select("_cms_w", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .groupBy("r", "b")
        .agg(F.sum("_cms_w").cast("long").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with identical (d, w, salt): cell-wise
    sum.  ``sketch(A) ⊕ sketch(B) == sketch(A ∪ B)`` exactly — the
    property that lets every partition/source/day sketch independently."""
    return (
        a.unionByName(b)
        .groupBy("r", "b")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str = "token",
    d: int = 4,
    w: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Point-estimate each probe token's occurrence count: min over the
    token's d cells.  Never undercounts; overcounts only by hash-
    collision mass (≤ 2·N/w per row w.h.p.).  The sketch side is
    d·w-bounded, so it broadcasts and the probe table never shuffles."""
    pb = probes.select(
        token_col, F.explode(_row_buckets(token_col, d, w, salt)).alias("rb")
    ).select(token_col, F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    return (
        pb.join(F.broadcast(sketch), ["r", "b"])
        .groupBy(token_col)
        .agg(F.min("cnt").cast("long").alias("cms_est"))
    )


# --------------------------------------------------------------------------
# HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007, AofA): the
# MERGEABLE cardinality sketch.  Spark's built-in
# ``approx_count_distinct`` is HLL++ but its registers are opaque (and
# its estimate is not replayable in another engine); this explicit
# register-table form gives the repo the same three properties the
# count-min and Bloom operators already have: (a) a fixed-size state
# table (m = 2^p rows max, regardless of corpus size), (b) loss-free
# MAX-merge across partitions/days/sources, and (c) full ANSI-SQL
# replayability so the estimate itself is value-hash oracled (q157).
#
# Determinism across engines is engineered, not assumed:
#   * hash = the repo's md5-60-bit construction; bucket = h % m,
#     suffix = the next HLL_SUFFIX_BITS bits (bit ops only).
#   * rho (leading-zero rank) = 41 - length(bin(suffix)) — binary-string
#     length instead of log2(), so no libm anywhere.
#   * the harmonic sum is computed SCALED BY 2^41 in int64
#     (sum of 1 << (41 - reg), absent registers contribute 1 << 41);
#     with 40 suffix bits and m <= 4096 the scaled sum stays < 2^53,
#     so the int64 -> double cast is exact and the single double
#     division + floor is bit-identical on any IEEE-754 engine.
#   * the small-range linear-counting correction needs ln(); libm last-
#     ulp divergence would poison a value-hash, so the RAW estimate is
#     the oracled surface and the correction is a separate library
#     column (`hll_corrected`) tested against Python's math.log.
# --------------------------------------------------------------------------

#: Suffix width in bits.  40 (not the full 52 the 60-bit hash could
#: spare) keeps the scaled harmonic sum exactly representable:
#: max rho = 41, so each register term <= 2^41 and the m-register sum
#: stays < 2^53 for every p <= 12.
HLL_SUFFIX_BITS = 40


def hll_alpha(m: int) -> float:
    """Bias-correction constant alpha_m of Flajolet et al. (2007):
    the paper's tabulated values for m = 16/32/64, the closed form for
    m >= 128."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    if m < 128:
        raise ValueError(f"hll_alpha needs m in {{16,32,64}} or >= 128, got {m}")
    return 0.7213 / (1.0 + 1.079 / m)


def hll_alpha_m2_scaled(p: int) -> float:
    """``alpha_m * m^2 * 2^(HLL_SUFFIX_BITS+1)`` as one double — the
    numerator of the raw estimate against the SCALED integer harmonic
    sum.  Both engines receive this exact double (Spark via lit(),
    DuckDB via repr() round-trip), so the division is bit-identical."""
    m = 1 << p
    return hll_alpha(m) * m * m * float(1 << (HLL_SUFFIX_BITS + 1))


def hll_registers(
    df: DataFrame,
    token_col: str = "token",
    keys: list[str] | tuple = (),
    p: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """One corpus scan -> the register table ``(*keys, bucket, reg)``
    with at most m = 2^p rows per key group.  Feed raw OCCURRENCES —
    duplicates cost nothing (MAX absorbs them map-side), which is the
    whole point: no distinct(), no shuffle of the value domain, state
    bounded by m however large the corpus."""
    if not 4 <= p <= 12:
        raise ValueError(f"p must be in [4, 12], got {p}")
    m = 1 << p
    keys = list(keys)
    t = F.col(token_col)
    h = F.conv(
        F.substring(F.md5(F.concat(t, F.lit(salt))), 1, 15), 16, 10
    ).cast("long")
    bucket = F.pmod(h, F.lit(m)).cast("long")
    suffix = F.shiftright(h, p).bitwiseAND(F.lit((1 << HLL_SUFFIX_BITS) - 1))
    rho = (
        F.when(suffix == 0, F.lit(HLL_SUFFIX_BITS + 1))
        .otherwise(F.lit(HLL_SUFFIX_BITS + 1) - F.length(F.bin(suffix)))
        .cast("long")
    )
    return (
        df.select(*keys, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(a: DataFrame, b: DataFrame, keys: list[str] | tuple = ()) -> DataFrame:
    """MAX-merge two register tables built with identical (p, salt):
    ``hll(A) merge hll(B) == hll(A UNION ALL B)`` exactly — sketch each
    partition/day/source independently, merge m-bounded states."""
    return (
        a.unionByName(b)
        .groupBy(*list(keys), "bucket")
        .agg(F.max("reg").alias("reg"))
    )


def hll_estimate(
    registers: DataFrame, keys: list[str] | tuple = (), p: int = 8
) -> DataFrame:
    """Raw HLL estimate per key group: ``(*keys, buckets_hit, hll_ndv)``.

    ``hll_ndv = floor(alpha_m * m^2 / Z)`` with the harmonic sum Z kept
    as an exact scaled int64 until one final double division (module
    header explains why that is bit-stable across engines).  This is
    the RAW estimator — apply :func:`hll_corrected` for the small-range
    linear-counting correction when the estimate feeds decisions rather
    than a value-hash oracle."""
    m = 1 << p
    rmax = HLL_SUFFIX_BITS + 1
    agg = registers.groupBy(*list(keys)).agg(
        F.count(F.lit(1)).cast("long").alias("buckets_hit"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({rmax} - reg AS INT))")
        ).alias("_z_present"),
    )
    z_scaled = (
        F.col("_z_present")
        + (F.lit(m) - F.col("buckets_hit")) * F.lit(1 << rmax).cast("long")
    )
    est = F.floor(
        F.lit(hll_alpha_m2_scaled(p)) / z_scaled.cast("double")
    ).cast("long")
    return agg.select(*list(keys), "buckets_hit", est.alias("hll_ndv"))


def hll_corrected(estimate: Column, buckets_hit: Column, p: int = 8) -> Column:
    """Linear-counting correction (Flajolet et al. 2007 fig. 3): when
    the raw estimate <= 2.5m and some buckets are empty, the balls-in-
    bins estimate ``m * ln(m / n_empty)`` dominates.  Uses ln()
    (libm), so this column is deliberately OUTSIDE the oracle surface —
    pinned against Python math.log in tests instead."""
    m = 1 << p
    n_empty = F.lit(float(m)) - buckets_hit.cast("double")
    lc = F.floor(F.lit(float(m)) * F.log(F.lit(float(m)) / n_empty)).cast("long")
    small = (estimate <= F.lit(int(2.5 * m))) & (buckets_hit < F.lit(m))
    return F.when(small, lc).otherwise(estimate)


# --------------------------------------------------------------------------
# KMV (k-minimum-values / theta) sketch — the SET-OPERATION member of the
# sketch family (Bloom = membership, HLL = NDV, CMS = frequency).  Keeping
# the k smallest distinct hash values per key group yields a bounded,
# MERGEABLE uniform sample of the hashed value domain; Bar-Yossef et al.
# 2002 (RANDOM'02, "Counting distinct elements in a data stream") give the
# (k-1)/U_(k) NDV estimator and Beyer et al. 2007 (SIGMOD, "On synopses
# for distinct value estimation under multiset operations") the
# set-operation estimates this exists for: UNION and — unlike HLL —
# INTERSECTION cardinalities between any two sketched groups, because the
# k smallest hashes of A ∪ B are always contained in sample(A) ∪
# sample(B), and membership of those hashes in each side's sample is
# EXACT below the threshold.
#
# Determinism: the hash is the repo-standard md5-60-bit value
# (engine-portable), the sample is "k smallest distinct" (a set, no
# ties — hashes are distinct by construction on distinct inputs), the
# NDV estimate is one double division of exactly-representable operands
# ((k-1)·2^60 has a (k-1)-bit mantissa), and the intersection estimate is
# pure int64 arithmetic — so every column value-hash oracles (q164).
# --------------------------------------------------------------------------

#: Hash domain width for the KMV estimator: md5-60-bit, matching the
#: MinHash / Bloom / CMS construction.
KMV_HASH_BITS = 60


def kmv_hash(value: Column | str, salt: str = "kmv") -> Column:
    """Repo-standard 60-bit md5 hash of ``value || salt`` (non-negative
    int64) — the uniform variate the estimator divides by 2^60."""
    v = F.col(value) if isinstance(value, str) else value
    return F.conv(
        F.substring(F.md5(F.concat(v, F.lit(salt))), 1, 15), 16, 10
    ).cast("long")


def kmv_sketch(
    df: DataFrame,
    value_col: str = "token",
    keys: list[str] | tuple = (),
    k: int = 256,
    salt: str = "kmv",
    fan: int = 32,
    assume_distinct: bool = False,
) -> DataFrame:
    """One scan -> the sample table ``(*keys, hv)`` holding each key
    group's k smallest distinct hash values (all of them when the group
    has fewer than k distinct values).

    Scale shape: distinct ``(keys, hv)`` is one map-side-combined
    shuffle of the value domain — the same cost class as the exact NDV
    it replaces for ONE pass, but the output is k-bounded state that
    then merges for free (:func:`kmv_merge`), which is the point:
    sketch each day/source/partition independently, combine k-sized
    samples forever after.  The per-group top-k itself runs on a
    two-level rail so no window ever sorts a whole key group: rank
    within ``(keys, hv % fan)`` sub-buckets first (uniform hashes ->
    uniform buckets, skew-proof), then rank the surviving
    ``fan * k`` rows per group.  The k smallest of a group are always
    among its sub-buckets' k smallest, so the rail is lossless.

    ``assume_distinct=True`` skips the internal distinct shuffle — pass
    it when the caller already holds distinct ``(keys, value)`` rows
    (e.g. a persisted table another consumer built); duplicate values
    would then waste rank slots and silently bias the sample, so only
    assert it when it is actually true."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    keys = list(keys)
    hv = kmv_hash(value_col, salt)
    dist = df.select(*keys, hv.alias("hv"))
    if not assume_distinct:
        dist = dist.distinct()
    w1 = Window.partitionBy(
        *keys, F.pmod(F.col("hv"), F.lit(fan))
    ).orderBy("hv")
    local = (
        dist.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    w2 = Window.partitionBy(*keys).orderBy("hv")
    return (
        local.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_merge(
    a: DataFrame, b: DataFrame, keys: list[str] | tuple = (), k: int = 256
) -> DataFrame:
    """Merge two sample tables built with identical (salt, k):
    ``kmv(A) merge kmv(B) == kmv(A UNION ALL B)`` exactly (the k
    smallest of a union are contained in the union of each side's k
    smallest).  Inputs are k-bounded, so this is configuration-sized
    work however large the sketched corpora were."""
    from pyspark.sql import Window

    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy("hv")
    return (
        a.unionByName(b)
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_estimate(
    sample: DataFrame, keys: list[str] | tuple = (), k: int = 256
) -> DataFrame:
    """NDV estimate per key group: ``(*keys, kmv_ndv)``.

    A group with fewer than k sample rows is EXACT (the sample is the
    whole distinct set); otherwise ``floor((k-1) * 2^60 / max(hv))`` —
    the Bar-Yossef (k-1)/U_(k) estimator.  (k-1)·2^60 is one exact
    double (mantissa k-1, exponent 60), so the single division
    value-hash oracles."""
    num = float((k - 1) * (1 << KMV_HASH_BITS))
    agg = sample.groupBy(*list(keys)).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.max("hv").alias("_kth"),
    )
    est = F.when(F.col("_n") < k, F.col("_n")).otherwise(
        F.floor(F.lit(num) / F.col("_kth").cast("double")).cast("long")
    )
    return agg.select(*list(keys), est.alias("kmv_ndv"))


def kmv_pair_overlap(
    sample: DataFrame, key: str = "source", k: int = 256
) -> DataFrame:
    """Pairwise set-operation estimates between every two key groups of
    one sample table: ``(key_a, key_b, kmv_union, kmv_inter,
    jaccard_pm)`` for all ``key_a < key_b``.

    Per pair, the combined sample L = the k smallest distinct hashes of
    ``sample(a) ∪ sample(b)`` is a valid KMV sample of A ∪ B, so the
    union NDV uses the same (k-1)/U_(k) rule; every h in L lies below
    BOTH sides' thresholds, so ``h ∈ A iff h ∈ sample(a)`` — the match
    count c is exact on the sample and ``inter = c * union DIV |L|``
    (Beyer et al. 2007 §4) in pure int64.  The pair fan-out is
    |groups|² × k rows of longs — configuration-sized; the corpora
    themselves were touched once, at sketch time."""
    from pyspark.sql import Window

    s = sample.select(F.col(key).alias("_g"), "hv")
    groups = s.select("_g").distinct()
    pairs = (
        groups.select(F.col("_g").alias("key_a"))
        .join(groups.select(F.col("_g").alias("key_b")))
        .filter(F.col("key_a") < F.col("key_b"))
    )
    # bounded broadcast fan-out: every pair picks up both sides' samples
    rows = pairs.join(
        F.broadcast(s).alias("m"),
        (F.col("m._g") == F.col("key_a")) | (F.col("m._g") == F.col("key_b")),
    ).select(
        "key_a",
        "key_b",
        "hv",
        (F.col("m._g") == F.col("key_a")).cast("long").alias("_ina"),
        (F.col("m._g") == F.col("key_b")).cast("long").alias("_inb"),
    )
    per_h = rows.groupBy("key_a", "key_b", "hv").agg(
        F.max("_ina").alias("in_a"), F.max("_inb").alias("in_b")
    )
    w = Window.partitionBy("key_a", "key_b").orderBy("hv")
    top = per_h.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    num = float((k - 1) * (1 << KMV_HASH_BITS))
    agg = top.groupBy("key_a", "key_b").agg(
        F.count(F.lit(1)).cast("long").alias("_nl"),
        F.max("hv").alias("_kth"),
        F.sum((F.col("in_a") * F.col("in_b"))).cast("long").alias("_c"),
    )
    union_est = F.when(F.col("_nl") < k, F.col("_nl")).otherwise(
        F.floor(F.lit(num) / F.col("_kth").cast("double")).cast("long")
    )
    return agg.select(
        "key_a",
        "key_b",
        "_nl",
        "_c",
        union_est.alias("kmv_union"),
    ).select(
        "key_a",
        "key_b",
        "kmv_union",
        # c <= k and union < 2^53, so the products stay in int64
        F.expr("_c * kmv_union DIV _nl").cast("long").alias("kmv_inter"),
        F.expr("_c * 1000 DIV _nl").cast("long").alias("jaccard_pm"),
    )
