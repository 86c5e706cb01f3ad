"""Exact repeated-substring detection/excision vs a brute-force
Python reference (operators/substring.py — the Lee et al. 2022
"ExactSubstr" family)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkdiff.operators.substring import excise_repeated_spans, repeated_spans


def _ref_spans(texts: dict[int, str], L: int, keep_first: bool):
    """Brute-force: mark every position whose L-gram repeats (or, with
    keep_first, every non-first occurrence), merge overlapping/adjacent
    [p, p+L) intervals per doc.  Positions are 1-based inclusive."""
    occ: dict[str, list[tuple[int, int]]] = {}
    for d in sorted(texts):
        t = texts[d]
        for p in range(1, len(t) - L + 2):
            occ.setdefault(t[p - 1 : p - 1 + L], []).append((d, p))
    marked: dict[int, list[int]] = {}
    for gram, where in occ.items():
        if len(where) < 2:
            continue
        keep = {min(where)} if keep_first else set()
        for d, p in where:
            if (d, p) not in keep:
                marked.setdefault(d, []).append(p)
    spans = []
    for d, ps in marked.items():
        ps = sorted(set(ps))
        start = prev = ps[0]
        n = 1
        for p in ps[1:]:
            if p - prev > L:
                spans.append((d, start, prev + L - 1, n))
                start, n = p, 0
            prev = p
            n += 1
        spans.append((d, start, prev + L - 1, n))
    return sorted(spans)


def _ref_excise(texts: dict[int, str], L: int):
    out = {}
    spans_by_doc: dict[int, list[tuple[int, int]]] = {}
    for d, s, e, _ in _ref_spans(texts, L, keep_first=True):
        spans_by_doc.setdefault(d, []).append((s, e))
    for d, t in texts.items():
        sp = spans_by_doc.get(d, [])
        clean, pos = [], 1
        for s, e in sp:
            clean.append(t[pos - 1 : s - 1])
            pos = e + 1
        clean.append(t[pos - 1 :])
        out[d] = (
            "".join(clean),
            len(sp),
            sum(e - s + 1 for s, e in sp),
        )
    return out


def _df(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )


CORPUS = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "a quick brown fox jumps over me today",
    3: "completely unique content here",
    4: "short",
    5: "the quick brown fox jumps over the lazy dog",
    6: "xx" * 30,  # periodic self-repeat within one doc
}


@pytest.mark.parametrize("keep_first", [False, True])
def test_spans_match_reference(spark, keep_first):
    got = sorted(
        tuple(r)
        for r in repeated_spans(_df(spark, CORPUS), 10, keep_first=keep_first)
        .select("doc_id", "span_start", "span_end", "n_seeds")
        .collect()
    )
    assert got == _ref_spans(CORPUS, 10, keep_first)


def test_excise_matches_reference(spark):
    got = {
        r["doc_id"]: (r["clean_text"], r["n_spans"], r["n_chars_excised"])
        for r in excise_repeated_spans(_df(spark, CORPUS), 10).collect()
    }
    assert got == _ref_excise(CORPUS, 10)


def test_full_duplicate_doc_excised_to_empty(spark):
    texts = {1: "abcdefghijKLMNOPQRST", 2: "abcdefghijKLMNOPQRST"}
    got = {
        r["doc_id"]: (r["clean_text"], r["n_chars_excised"])
        for r in excise_repeated_spans(_df(spark, texts), 5).collect()
    }
    # doc 1 is the corpus-first occurrence everywhere; doc 2 vanishes
    assert got == {1: ("abcdefghijKLMNOPQRST", 0), 2: ("", 20)}


def test_docs_shorter_than_min_len_pass_through(spark):
    texts = {1: "tiny", 2: "also tiny", 3: "also tiny"}
    spans = repeated_spans(_df(spark, texts), 50).collect()
    assert spans == []
    got = {
        r["doc_id"]: r["clean_text"]
        for r in excise_repeated_spans(_df(spark, texts), 50).collect()
    }
    assert got == texts  # untouched, even the identical pair


def test_within_doc_repeat_detected(spark):
    # a phrase repeated INSIDE one document must span both occurrences
    # (report mode) / the later one (keep-first)
    t = "PREFIX abcdefghij MIDDLE abcdefghij SUFFIX"
    spans = sorted(
        (r["span_start"], r["span_end"])
        for r in repeated_spans(_df(spark, {7: t}), 10).collect()
    )
    assert spans == [(s, e) for _, s, e, _ in _ref_spans({7: t}, 10, False)]
    kept = sorted(
        (r["span_start"], r["span_end"])
        for r in repeated_spans(_df(spark, {7: t}), 10, keep_first=True).collect()
    )
    assert kept == [(s, e) for _, s, e, _ in _ref_spans({7: t}, 10, True)]


def test_min_len_validation(spark):
    with pytest.raises(ValueError):
        repeated_spans(_df(spark, {1: "abc"}), 1)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=3, max_value=6),
)
def test_excise_matches_reference_property(spark, texts, L):
    corpus = {i: t for i, t in enumerate(texts)}
    got = {
        r["doc_id"]: (r["clean_text"], r["n_spans"], r["n_chars_excised"])
        for r in excise_repeated_spans(_df(spark, corpus), L).collect()
    }
    assert got == _ref_excise(corpus, L)


def _ref_excise_fixpoint(texts: dict[int, str], L: int, rescan: int):
    """Reference for ``rescan=N``: iterate _ref_excise, stopping early
    when the previous pass cut nothing (the impl's check)."""
    cur = dict(texts)
    tot_n = {d: 0 for d in texts}
    tot_c = {d: 0 for d in texts}
    res = _ref_excise(cur, L)
    for d, (c, n, x) in res.items():
        cur[d], tot_n[d], tot_c[d] = c, tot_n[d] + n, tot_c[d] + x
    last = sum(n for _, n, _ in res.values())
    for _ in range(rescan):
        if last == 0:
            break
        res = _ref_excise(cur, L)
        for d, (c, n, x) in res.items():
            cur[d], tot_n[d], tot_c[d] = c, tot_n[d] + n, tot_c[d] + x
        last = sum(n for _, n, _ in res.values())
    return {d: (cur[d], tot_n[d], tot_c[d]) for d in texts}


# Splice-manufactured repeat: cutting "0123456789" out of doc 2 splices
# "abc"+"def..." into "abcdef...", which ONLY THEN matches doc 1's
# "abcdef" — the span a one-pass excision can never see.
SPLICE_CORPUS = {
    0: "pp0123456789rr",
    1: "uvwabcdefxyz",
    2: "abc0123456789defghijkl",
}


def test_rescan_reaches_splice_manufactured_repeat(spark):
    # one pass leaves the spliced repeat behind...
    once = {
        r["doc_id"]: r["clean_text"]
        for r in excise_repeated_spans(_df(spark, SPLICE_CORPUS), 6).collect()
    }
    assert once[2] == "abcdefghijkl"  # splice formed doc 1's "abcdef"
    leftover = repeated_spans(
        _df(spark, {d: t for d, t in once.items()}), 6
    ).collect()
    assert leftover, "the splice must manufacture a new repeated span"
    # ...rescan=1 cuts it and matches the iterated Python reference
    got = {
        r["doc_id"]: (r["clean_text"], r["n_spans"], r["n_chars_excised"])
        for r in excise_repeated_spans(
            _df(spark, SPLICE_CORPUS), 6, rescan=1
        ).collect()
    }
    assert got == _ref_excise_fixpoint(SPLICE_CORPUS, 6, 1)
    assert got[2] == ("ghijkl", 2, 16)  # both passes accumulated


def test_rescan_certifies_span_free(spark):
    # a generous rescan whose final pass finds nothing certifies the
    # cleaned corpus span-free at the seed length
    cleaned = {
        r["doc_id"]: r["clean_text"]
        for r in excise_repeated_spans(
            _df(spark, SPLICE_CORPUS), 6, rescan=3
        ).collect()
    }
    assert repeated_spans(_df(spark, cleaned), 6).collect() == []


def test_rescan_zero_is_the_one_pass_behavior(spark):
    base = excise_repeated_spans(_df(spark, CORPUS), 10).collect()
    same = excise_repeated_spans(_df(spark, CORPUS), 10, rescan=0).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, same))
    with pytest.raises(ValueError):
        excise_repeated_spans(_df(spark, CORPUS), 10, rescan=-1)


def test_content_checksum_flips_on_single_char_change(spark):
    """q142's commutative corpus digest: any one-character edit in any
    document flips the per-source digest, and the digest is
    partitioning-independent (it's a SUM of per-row hashes)."""
    from pyspark.sql import functions as F

    from sparkdiff.functions.canonical import content_checksum

    def digest(texts):
        return (
            _df(spark, texts)
            .agg(content_checksum("doc_id", F.col("text")).alias("d"))
            .first()["d"]
        )

    base = {1: "alpha beta", 2: "gamma delta", 3: "epsilon zeta"}
    d0 = digest(base)
    assert d0.isdigit()  # plain digit string, no float rendering
    # flip one character of one doc -> digest changes
    edited = {**base, 2: "gamma delt_"}
    assert digest(edited) != d0
    # swap content BETWEEN docs -> digest changes (doc_id is hashed in)
    swapped = {1: base[2], 2: base[1], 3: base[3]}
    assert digest(swapped) != d0
    # partitioning / order independence
    df = _df(spark, base)
    repart = (
        df.repartition(7)
        .agg(content_checksum("doc_id", F.col("text")).alias("d"))
        .first()["d"]
    )
    assert repart == d0
