"""Distributed BPE training vs a pure-Python Sennrich reference."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from sparkdiff.operators.bpe import bpe_merges, bpe_segment, encode_word


def _ref_bpe(word_freq: dict[str, int], rounds: int):
    """Textbook BPE on the word-frequency table: greedy left-to-right
    merge of the (count desc, pair asc) argmax each round."""
    vocab = {tuple(list(w) + ["$"]): c for w, c in word_freq.items()}
    merges = []
    for r in range(1, rounds + 1):
        pc = collections.Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, a + b, cnt))
        new: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + c
        vocab = new
    return merges, vocab


def _tokens_df(spark, corpus: list[str]):
    rows = [(t,) for t in corpus]
    return spark.createDataFrame(rows, "token string")


def test_bpe_matches_reference(spark):
    corpus = (
        ["lower"] * 6 + ["low"] * 7 + ["newest"] * 5 + ["widest"] * 3
        + ["new"] * 4 + ["wide"] * 2
    )
    got = [
        (r["round"], r["sym_l"], r["sym_r"], r["merged"], r["cnt"])
        for r in bpe_merges(_tokens_df(spark, corpus), rounds=6)
        .orderBy("round")
        .collect()
    ]
    ref, _ = _ref_bpe(collections.Counter(corpus), 6)
    assert got == ref


def test_bpe_overlapping_runs_merge_left_to_right(spark):
    # the boundary case the delimiter wrapping exists for: merging
    # (b)(b) inside bbbb must yield [bb, bb], not [bb, b, b]
    corpus = ["bbbb"] * 3
    merges = bpe_merges(_tokens_df(spark, corpus), rounds=2).orderBy("round")
    got = [(r["sym_l"], r["sym_r"], r["cnt"]) for r in merges.collect()]
    ref, _ = _ref_bpe({"bbbb": 3}, 2)
    assert got == [(m[1], m[2], m[4]) for m in ref]


def test_bpe_no_cross_symbol_false_match(spark):
    # after merging (a)(b) -> (ab), the pair (b)(c) must not match
    # inside "(ab)(c...": ab's trailing b is not a symbol boundary
    corpus = ["ab"] * 10 + ["abc"] * 6 + ["bc"] * 5
    got = [
        (r["round"], r["sym_l"], r["sym_r"], r["merged"], r["cnt"])
        for r in bpe_merges(_tokens_df(spark, corpus), rounds=4)
        .orderBy("round")
        .collect()
    ]
    ref, _ = _ref_bpe(collections.Counter(corpus), 4)
    assert got == ref


def test_bpe_segment_applies_merges_in_order(spark):
    corpus = ["lower"] * 6 + ["low"] * 7 + ["newest"] * 5
    ref, _ = _ref_bpe(collections.Counter(corpus), 4)
    merges = [(m[1], m[2]) for m in ref]
    df = spark.createDataFrame([("lower",), ("newest",), ("slow",)], "w string")
    got = {
        r["w"]: r["bpe_tokens"]
        for r in bpe_segment(df, "w", merges).collect()
    }
    for w in got:
        _, vocab = _ref_bpe({w: 1}, 0)
        syms = list(next(iter(vocab)))
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        assert got[w] == syms, w


def test_encode_word_shape(spark):
    df = spark.createDataFrame([("low",)], "w string")
    assert df.select(encode_word("w").alias("s")).first()["s"] == "(l)(o)(w)($)"


def test_bpe_filters_unsafe_tokens(spark):
    # tokens carrying delimiter characters are excluded by the guard
    corpus = ["ok"] * 3 + ["ba(d"] * 100
    merges = bpe_merges(_tokens_df(spark, corpus), rounds=1).collect()
    assert merges[0]["cnt"] == 3  # only "ok" survives: (o)(k)($) pairs


def test_bpe_segment_rejects_delimiter_words(spark):
    """A word containing ( ) or $ would encode ambiguously (collides
    with the symbol wrapping / EOW marker) — it must RAISE, not
    mis-tokenize silently; the training side filters, the segment side
    errors (symmetric guard, opposite policy by design)."""
    import pytest

    for bad in ["lo(w", "lo)w", "lo$w"]:
        df = spark.createDataFrame([(bad,)], "w string")
        with pytest.raises(Exception) as exc:
            bpe_segment(df, "w", [("l", "o")]).collect()
        assert "delimiter" in str(exc.value)
    # clean words and NULLs still pass
    df = spark.createDataFrame([("low",), (None,)], "w string")
    got = [r["bpe_tokens"] for r in bpe_segment(df, "w", [("l", "o")]).collect()]
    assert got[0] == ["lo", "w", "$"] and got[1] is None


def _ref_bpe_batched(word_freq: dict[str, int], rounds: int, m: int):
    """Mirror of the batched mode: per job, rank pairs (count desc,
    pair asc), select the first `min(m, remaining)` pairwise
    symbol-disjoint pairs from the top 4x over-fetch, apply them all
    (disjoint => chained == simultaneous), repeat."""
    vocab = {tuple(list(w) + ["$"]): c for w, c in word_freq.items()}
    merges = []
    while len(merges) < rounds:
        pc = collections.Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        want = min(m, rounds - len(merges))
        fetch = want if want == 1 else want * 4
        ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:fetch]
        used: set[str] = set()
        batch = []
        for (a, b), cnt in ranked:
            if len(batch) == want:
                break
            if a in used or b in used or (a + b) in used:
                continue
            used.update((a, b, a + b))
            batch.append((a, b, cnt))
        for a, b, cnt in batch:
            merges.append((len(merges) + 1, a, b, a + b, cnt))
        for a, b, _ in batch:
            new: dict[tuple, int] = {}
            for syms, c in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                key = tuple(out)
                new[key] = new.get(key, 0) + c
            vocab = new
    return merges


def test_bpe_batched_matches_mirrored_reference(spark):
    corpus = (
        ["lower"] * 6 + ["low"] * 7 + ["newest"] * 5 + ["widest"] * 3
        + ["new"] * 4 + ["wide"] * 2 + ["window"] * 8
    )
    got = [
        (r["round"], r["sym_l"], r["sym_r"], r["merged"], r["cnt"])
        for r in bpe_merges(_tokens_df(spark, corpus), rounds=8, batch_size=4)
        .orderBy("round")
        .collect()
    ]
    ref = _ref_bpe_batched(collections.Counter(corpus), 8, 4)
    assert got == ref
    # within each batch the selected pairs are pairwise symbol-disjoint
    for i in range(0, len(got), 4):
        syms: list[str] = []
        for _, a, b, ab, _ in got[i : i + 4]:
            assert a not in syms and b not in syms and ab not in syms
            syms += [a, b, ab]


def test_bpe_batch_size_one_is_exact_sequential(spark):
    corpus = ["lower"] * 6 + ["low"] * 7 + ["newest"] * 5
    seq = bpe_merges(_tokens_df(spark, corpus), rounds=5).orderBy("round").collect()
    one = (
        bpe_merges(_tokens_df(spark, corpus), rounds=5, batch_size=1)
        .orderBy("round")
        .collect()
    )
    assert [tuple(r) for r in seq] == [tuple(r) for r in one]
    import pytest

    with pytest.raises(ValueError):
        bpe_merges(_tokens_df(spark, corpus), rounds=5, batch_size=0)
