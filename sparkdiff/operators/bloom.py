"""Bloom-filter membership gate for ingest pipelines.

The probabilistic complement to the exact corpus dedup index
(``operators/dedup.corpus_dedup_index``): a *bit-exact, engine-portable*
Bloom filter over corpus keys, sized m bits with h hash functions, that
answers "definitely new" / "maybe seen" with zero false negatives.  The
intended deployment is as the CHEAP pre-gate in front of the exact
index: a 100 TB corpus of 10^11 documents needs only ``m ≈ 1.2 TB`` of
bits at 1% fpp — but per-tenant / per-shard filters are MB-sized, and
the filter table here is ``m/64`` rows of packed longs, broadcastable
for any practical m.  Batch keys that miss the filter skip the exact
index entirely (the common case for novel content).

Hashing: position_i(key) = md5-60-bit(key ‖ seed ‖ i) mod m — the same
oracle-representable construction the MinHash/sampling families use, so
a SQL oracle replays membership decisions exactly (q140).  No Spark
``BloomFilter`` sketch is used deliberately: its hash (Murmur3 of JVM
serialized bytes) is not replayable by other engines, and its merged
bitmap is opaque to SQL — this table-of-longs form is engine-portable,
incrementally updatable (bit_or of two builds = union), and prunable.

Scale shape: build = one scan -> h-way position explode -> distinct ->
``groupBy(word_idx)`` bit_or (m/64-row result).  Probe (lazy form) =
h-way explode -> broadcast join against the filter words -> per-key
``min(bit set)`` — one bounded shuffle of batch×h rows.  The compact
form collects the (configuration-sized) filter once and probes with
pure column expressions — zero shuffle, for hot streaming gates.

NULL keys are first-class: build and probe both render NULL through the
``NULL_KEY`` sentinel, so a NULL-keyed row inserts, probes, and joins
back like any other key (probe output is TOTAL over input rows — no
silent third bucket).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_size(n_keys: int, fpp: float) -> tuple[int, int]:
    """Closed-form sizing: bits ``m = ceil(-n ln p / ln^2 2)`` rounded
    up to a multiple of 64, hashes ``h = round(m/n · ln 2)`` (>= 1)."""
    if n_keys < 1:
        raise ValueError(f"n_keys must be >= 1, got {n_keys}")
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0,1), got {fpp}")
    m = math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    h = max(1, round(m / n_keys * math.log(2)))
    return m, h


#: rendering of a NULL key — NULL is a legal, insertable, probeable
#: member (md5(concat(NULL, ...)) would otherwise be NULL, silently
#: dropping NULL-keyed rows from BOTH buckets).  The NUL prefix keeps
#: the sentinel out of any realistic key domain; a corpus whose string
#: keys genuinely start with chr(0) must pre-escape them.
NULL_KEY = "\x00<null-key>"


def _key_str(key: Column) -> Column:
    """Total string rendering of the key: NULL → :data:`NULL_KEY`."""
    return F.coalesce(key.cast("string"), F.lit(NULL_KEY))


def _positions(key: Column, m_bits: int, n_hashes: int, seed: str) -> Column:
    """Array of the key's ``n_hashes`` bit positions in ``[0, m)``.
    Total over input rows — NULL keys hash via :data:`NULL_KEY`."""
    return F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                _key_str(key), F.lit(f"{seed}#{i}")
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(m_bits),
            )
            for i in range(n_hashes)
        ]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int,
    n_hashes: int,
    seed: str = "",
) -> DataFrame:
    """Build the filter: ``(word_idx, bits)`` — bit ``p`` of the filter
    lives at ``word_idx = p div 64``, ``bits & (1 << (p mod 64))``.
    Words with no set bits are absent (sparse).  Unioning two builds of
    the same geometry = ``groupBy(word_idx).bit_or(bits)`` — the
    incremental-append path."""
    if m_bits < 64 or m_bits % 64:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    pos = (
        df.select(
            F.explode(
                _positions(F.col(key_col), m_bits, n_hashes, seed)
            ).alias("_pos")
        )
        .distinct()
        # pyspark's shiftleft() helper takes a literal int shift, so the
        # column-shift form goes through the SQL function directly
        .withColumn(
            "_bit",
            F.expr("shiftleft(cast(1 as bigint), cast(pmod(_pos, 64) as int))"),
        )
    )
    return pos.groupBy(
        (F.col("_pos") / 64).cast("long").alias("word_idx")
    ).agg(F.bit_or("_bit").alias("bits"))


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int,
    n_hashes: int,
    seed: str = "",
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Lazy membership probe: adds boolean ``out_col`` — true iff every
    hash position is set (zero false negatives by construction; false
    positives at the designed fpp).  Geometry/seed must match the
    build.  Broadcast-joins the filter words, then one ``groupBy`` on
    the probe key ANDs the h bits.

    TOTAL over input rows: NULL keys hash via the :data:`NULL_KEY`
    sentinel and the join back rides the sentinel string (an equi join
    on a NULL key would never match), so every row — NULL-keyed
    included — gets a definite true/false ``out_col``."""
    if "__bloom_k" in df.columns:
        raise ValueError(
            "bloom_probe reserves the internal column name '__bloom_k'; "
            "rename or drop it on the input frame first"
        )
    probe = df.select(
        _key_str(F.col(key_col)).alias("__bloom_k"),
        F.explode(
            _positions(F.col(key_col), m_bits, n_hashes, seed)
        ).alias("_pos"),
    ).withColumn("_w", (F.col("_pos") / 64).cast("long"))
    hit = (
        probe.join(
            F.broadcast(bloom.withColumnRenamed("word_idx", "_w")), "_w", "left"
        )
        .withColumn(
            "_hit",
            F.expr(
                "cast(shiftright(coalesce(bits, cast(0 as bigint)), "
                "cast(pmod(_pos, 64) as int)) & 1 as int)"
            ),
        )
        .groupBy("__bloom_k")
        .agg((F.min("_hit") == 1).alias(out_col))
    )
    return (
        df.withColumn("__bloom_k", _key_str(F.col(key_col)))
        .join(hit, "__bloom_k", "left")
        .drop("__bloom_k")
    )


def bloom_probe_compact(
    df: DataFrame,
    key_col: str,
    bloom_words: dict[int, int],
    m_bits: int,
    n_hashes: int,
    seed: str = "",
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Zero-shuffle probe for hot paths: the filter words arrive as a
    plain dict (collect the ``bloom_build`` result once per stream —
    configuration-sized by the same argument as the decontamination
    automaton), are embedded as ONE dense array literal, and membership
    is a pure column expression — no join, no shuffle, whole-stage
    codegen end to end.

    SIZE DOMAIN — small filters only (m ≲ 2^19, i.e. ≤ ~8k words):
    the word array is evaluated per row, so probe cost scales with
    m/64 × batch rows regardless of how the literal is built (measured
    at m = 2^22: 142 s as an array(lit,...) expression tree, 37 s as
    one lit(list), 5 s as a broadcast one-row crossJoin — the 512 KB
    array is copied into every joined row either way).  For larger
    geometries use :func:`bloom_probe`: the filter stays a word TABLE
    and the probe is a broadcast equi-join on word index — per-row
    cost is h lookups, independent of m."""
    clash = {"__bloom_flt", "__bloom_ps"} & set(df.columns)
    if clash:
        raise ValueError(
            f"bloom_probe_compact reserves internal column names {clash}; "
            "rename or drop them on the input frame first"
        )
    words = [int(bloom_words.get(i, 0)) for i in range(m_bits // 64)]
    arr = F.lit(words).cast("array<bigint>")
    out = df.withColumn("__bloom_flt", arr).withColumn(
        "__bloom_ps", _positions(F.col(key_col), m_bits, n_hashes, seed)
    )
    checks = [
        "(shiftright(element_at(__bloom_flt, "
        f"cast(__bloom_ps[{i}] div 64 as int) + 1), "
        f"cast(pmod(__bloom_ps[{i}], 64) as int)) & 1) = 1"
        for i in range(n_hashes)
    ]
    return out.withColumn(
        out_col, F.expr(" AND ".join(checks))
    ).drop("__bloom_flt", "__bloom_ps")


def bloom_semi_join(
    fact: DataFrame,
    fact_key: str,
    dim_keys: DataFrame,
    dim_key: str,
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
    seed: str = "bsj",
) -> DataFrame:
    """Runtime-filter semi-join reduction: build the filter from the
    (selective) dim-side key set, collect its configuration-sized word
    table once, and gate the fact scan with the zero-shuffle compact
    probe — fact rows whose key definitely isn't in the dim subset die
    AT THE SCAN, before any exchange.  This is the classic distributed
    runtime filter (Spark's own ``runtime.bloomFilter`` rewrite, Trino
    dynamic filtering): at 100 TB the win is the shuffle you never pay —
    only the surviving sliver (true matches + designed-fpp strays) is
    hashed across the cluster for the exact join the caller still runs,
    which silently removes the strays (false positives cost I/O, never
    correctness; false negatives are impossible by construction).

    Collects the filter words at construction (the decontamination
    automaton's documented convention) — size the geometry for the
    compact domain (m ≲ 2^19; see :func:`bloom_probe_compact`).
    Returns the gated fact frame unchanged in schema."""
    flt = bloom_build(dim_keys.select(dim_key), dim_key, m_bits, n_hashes, seed)
    words = {int(r["word_idx"]): int(r["bits"]) for r in flt.collect()}
    gated = bloom_probe_compact(
        fact, fact_key, words, m_bits, n_hashes, seed, out_col="__bloom_pass"
    )
    return gated.filter(F.col("__bloom_pass")).drop("__bloom_pass")
