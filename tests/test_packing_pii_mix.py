"""Unit tests for the round-2 training-pipeline additions: sequence
packing, domain-weighted mixing, shuffle-shard export, PII scrubbing.
(The q56–q61 oracle parity runs in test_oracle_queries.py; these pin
the operator-level invariants.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkdiff.functions.pii import PII_PATTERNS, pii_count, redact_pii
from sparkdiff.operators.packing import pack_concat_chunks
from sparkdiff.operators.sampling import (
    hash_sample,
    shuffle_shards,
    weighted_domain_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_packing_matches_serial_prefix_sum(spark):
    rows = [(i, (i * 37) % 190) for i in range(200)]
    df = _docs(spark, rows).withColumn(
        "shard_key", (F.col("doc_id") % 3).cast("long")
    )
    got = {
        r.doc_id: (r.shard, r.window_id, r.spans)
        for r in pack_concat_chunks(
            df, "doc_id", "n_tokens", capacity=100, shard_col="shard_key"
        ).collect()
    }
    # serial replay
    cum = {}
    for i, tok in rows:
        shard = i % 3
        prev = cum.get(shard, 0)
        cum[shard] = prev + tok
        start = prev // 100
        spans = (cum[shard] - 1) // 100 - start + 1 if tok > 0 else 1
        assert got[i] == (shard, start, spans), i


def test_packing_window_ids_nondecreasing_and_deterministic(spark):
    rows = [(i, (i * 13) % 97) for i in range(500)]
    df = _docs(spark, rows)
    a = pack_concat_chunks(df, "doc_id", "n_tokens", capacity=64)
    b = pack_concat_chunks(
        df.repartition(7), "doc_id", "n_tokens", capacity=64
    )
    ra = sorted((r.doc_id, r.window_id, r.spans) for r in a.collect())
    rb = sorted((r.doc_id, r.window_id, r.spans) for r in b.collect())
    assert ra == rb
    last = -1
    for _, w, s in ra:
        assert w >= last and s >= 1
        last = w


def test_packing_rejects_bad_capacity(spark):
    with pytest.raises(ValueError):
        pack_concat_chunks(_docs(spark, [(1, 1)]), "doc_id", "n_tokens", 0)


def test_domain_mix_monotone_and_exhaustive(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
    )
    keep_all = weighted_domain_sample(
        df, "doc_id", "source", {"src0": 1.0}, default_rate=0.0, seed="s"
    )
    # rate 1.0 keeps every row of the domain; default 0.0 drops the rest
    assert keep_all.count() == df.filter("source = 'src0'").count()
    assert keep_all.filter("source <> 'src0'").count() == 0

    lo = weighted_domain_sample(
        df, "doc_id", "source", {"src1": 0.2}, default_rate=0.0, seed="s"
    )
    hi = weighted_domain_sample(
        df, "doc_id", "source", {"src1": 0.6}, default_rate=0.0, seed="s"
    )
    lo_ids = {r.doc_id for r in lo.collect()}
    hi_ids = {r.doc_id for r in hi.collect()}
    assert lo_ids <= hi_ids  # raising a rate only ADDS rows
    n = df.filter("source = 'src1'").count()
    assert 0.1 * n < len(lo_ids) < 0.3 * n

    with pytest.raises(ValueError):
        weighted_domain_sample(df, "doc_id", "source", {"src1": 1.5})


def test_domain_mix_agrees_with_hash_sample(spark):
    """A single-domain mix at rate r must equal hash_sample(r) — same
    variate, same threshold."""
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.lit("d").alias("source")
    )
    a = {r.doc_id for r in hash_sample(df, "doc_id", 0.3, seed="z").collect()}
    b = {
        r.doc_id
        for r in weighted_domain_sample(
            df, "doc_id", "source", {"d": 0.3}, seed="z"
        ).collect()
    }
    assert a == b


def test_shuffle_shards_permutation_properties(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    out = shuffle_shards(df, "doc_id", n_shards=8, seed="t")
    rows = out.collect()
    assert len(rows) == 1000
    # positions are 1..n contiguous within each shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # deterministic under repartition
    again = {
        (r.doc_id, r.shard, r.pos)
        for r in shuffle_shards(
            df.repartition(11), "doc_id", n_shards=8, seed="t"
        ).collect()
    }
    assert again == {(r.doc_id, r.shard, r.pos) for r in rows}
    # a different seed produces a different permutation
    other = {
        (r.doc_id, r.shard, r.pos)
        for r in shuffle_shards(df, "doc_id", n_shards=8, seed="u").collect()
    }
    assert other != again
    # the shuffle order is not the identity order within shards
    id_order = {
        s: [d for d, _, _ in sorted(
            ((d, sh, p) for d, sh, p in again if sh == s), key=lambda x: x[2]
        )]
        for s in by_shard
    }
    assert any(order != sorted(order) for order in id_order.values())


def test_pii_redaction_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b-c_d@sub.example.org now"),
            (2, "dial 555-867-5309 or 10.20.30.40"),
            (3, "ssn 123-45-6789 ok"),
            (4, "clean text, no identifiers here"),
        ],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id",
        *[
            pii_count("text", pat).alias(f"n_{name}")
            for name, pat, _ in PII_PATTERNS
        ],
        redact_pii("text").alias("red"),
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].n_email == 1 and rows[1].red == "mail <EMAIL> now"
    assert rows[2].n_phone == 1 and rows[2].n_ipv4 == 1
    assert rows[2].red == "dial <PHONE> or <IP>"
    assert rows[3].n_ssn == 1 and rows[3].n_phone == 0
    assert rows[3].red == "ssn <SSN> ok"
    assert rows[4].red == "clean text, no identifiers here"
    assert all(
        getattr(rows[4], f"n_{name}") == 0 for name, _, _ in PII_PATTERNS
    )


def test_packing_rejects_input_shard_column(spark):
    """The OUTPUT column is the fixed name 'shard'; an input column of
    that name would come out duplicated (ambiguous downstream)."""
    df = _docs(spark, [(1, 5)]).withColumn("shard", F.lit(0))
    with pytest.raises(ValueError, match="'shard'"):
        pack_concat_chunks(df, "doc_id", "n_tokens", capacity=8)
