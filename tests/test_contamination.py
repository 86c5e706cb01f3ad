"""Aho-Corasick exact-substring decontamination
(`operators/contamination.py`)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sparkdiff.operators.contamination import AhoCorasick, exact_contamination


def _naive_ids(patterns: list[tuple[int, str]], text: str) -> set[int]:
    return {pid for pid, pat in patterns if pat in text}


def test_automaton_matches_naive_on_random_corpus():
    rng = random.Random(134)
    alphabet = "abc"
    patterns = []
    for i in range(60):
        n = rng.randint(1, 6)
        patterns.append((i, "".join(rng.choice(alphabet) for _ in range(n))))
    ac = AhoCorasick(patterns)
    for _ in range(300):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        assert ac.search_ids(text) == _naive_ids(patterns, text), text


def test_automaton_overlaps_prefixes_and_duplicates():
    # 'a' is a prefix of 'ab'; 'ba' overlaps 'ab'; ids 7 and 8 share a
    # pattern string and must BOTH be reported.
    pats = [(1, "a"), (2, "ab"), (3, "ba"), (7, "xx"), (8, "xx")]
    ac = AhoCorasick(pats)
    assert ac.search_ids("ab") == {1, 2}
    assert ac.search_ids("bab") == {1, 2, 3}
    assert ac.search_ids("xx") == {7, 8}
    assert ac.search_ids("") == set()
    assert ac.search_ids("ccc") == set()


def test_automaton_suffix_output_via_fail_links():
    # matching 'ab' must also report 'b' (an output reached only
    # through the failure chain), even mid-scan with no mismatch.
    ac = AhoCorasick([(1, "ab"), (2, "b")])
    assert ac.search_ids("ab") == {1, 2}
    ac2 = AhoCorasick([(1, "abcde"), (2, "cd")])
    assert ac2.search_ids("abcde") == {1, 2}


def test_automaton_rejects_degenerate_inputs():
    with pytest.raises(ValueError):
        AhoCorasick([])
    with pytest.raises(ValueError):
        AhoCorasick([(1, "")])


def test_exact_contamination_operator(spark):
    docs = spark.createDataFrame(
        [
            (10, "the quick brown fox"),
            (11, "quick brow"),
            (12, "nothing here"),
            (13, None),
        ],
        "doc_id long, text string",
    )
    pats = spark.createDataFrame(
        [(1, "quick"), (2, "brown fox"), (3, "zebra"), (4, "q")],
        "test_id long, pat string",
    )
    got = {
        (r.doc_id, r.test_id)
        for r in exact_contamination(docs, pats).collect()
    }
    want = {(10, 1), (10, 2), (10, 4), (11, 1), (11, 4)}
    assert got == want
    # invariant under input partitioning (the scan is embarrassingly
    # parallel; matches depend only on row content)
    got7 = {
        (r.doc_id, r.test_id)
        for r in exact_contamination(docs.repartition(7), pats).collect()
    }
    assert got7 == want


def test_exact_contamination_pattern_cap(spark):
    docs = spark.createDataFrame([(1, "aa")], "doc_id long, text string")
    pats = spark.createDataFrame(
        [(i, "a" * (i + 1)) for i in range(5)], "test_id long, pat string"
    )
    with pytest.raises(ValueError, match="max_patterns"):
        exact_contamination(docs, pats, max_patterns=3)


def test_exact_contamination_plan_has_no_join_or_shuffle(spark):
    """The corpus side must be ONE scan feeding mapInPandas — no join,
    no exchange before the match stream exists."""
    docs = spark.createDataFrame([(1, "aa")], "doc_id long, text string")
    pats = spark.createDataFrame([(1, "a")], "test_id long, pat string")
    plan = (
        exact_contamination(docs, pats)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_exact_contamination_empty_pattern_side(spark):
    """No test suite -> empty result with the stable schema, not an
    error (the lazy-registry convention for degenerate inputs)."""
    docs = spark.createDataFrame([(1, "aa")], "doc_id long, text string")
    pats = spark.createDataFrame([], "test_id long, pat string")
    out = exact_contamination(docs, pats)
    assert out.columns == ["doc_id", "test_id"]
    assert out.count() == 0


from hypothesis import given, settings, strategies as st  # noqa: E402

_pat = st.text(alphabet="ab", min_size=1, max_size=5)


@settings(max_examples=200, deadline=None)
@given(
    pats=st.lists(_pat, min_size=1, max_size=25),
    text=st.text(alphabet="ab", max_size=60),
)
def test_automaton_property_equals_naive(pats, text):
    """For ANY pattern set and text over a binary alphabet (the
    adversarial case for fail links — every string is a near-repeat),
    the automaton must agree with naive `pat in text` exactly."""
    numbered = list(enumerate(pats))
    ac = AhoCorasick(numbered)
    assert ac.search_ids(text) == _naive_ids(numbered, text)


def test_search_first_positions():
    ac = AhoCorasick([(1, "ab"), (2, "b"), (3, "ba")])
    assert ac.search_first("abab") == {1: 0, 2: 1, 3: 1}
    assert ac.search_first("zzab") == {1: 2, 2: 3}
    assert ac.search_first("") == {}


@settings(max_examples=200, deadline=None)
@given(
    pats=st.lists(_pat, min_size=1, max_size=25),
    text=st.text(alphabet="ab", max_size=60),
)
def test_search_first_property_equals_str_find(pats, text):
    numbered = list(enumerate(pats))
    ac = AhoCorasick(numbered)
    want = {
        pid: text.find(pat)
        for pid, pat in numbered
        if pat in text
    }
    # duplicate (pid, pat) entries collapse to the same find result
    assert ac.search_first(text) == want


def test_exact_contamination_positions_mode(spark):
    docs = spark.createDataFrame(
        [(10, "xx quick brown quick")], "doc_id long, text string"
    )
    pats = spark.createDataFrame(
        [(1, "quick"), (2, "brown")], "test_id long, pat string"
    )
    got = {
        (r.doc_id, r.test_id): r.first_pos
        for r in exact_contamination(docs, pats, positions=True).collect()
    }
    assert got == {(10, 1): 3, (10, 2): 9}


def test_search_spans_merges_overlaps():
    ac = AhoCorasick([(1, "abc"), (2, "cde"), (3, "xx")])
    # 'abc' at 0 and 'cde' at 2 overlap -> one [0,5) span
    assert ac.search_spans("abcde") == [(0, 5)]
    assert ac.search_spans("abc xx abc") == [(0, 3), (4, 6), (7, 10)]
    assert ac.search_spans("zzz") == []
    # adjacent spans coalesce
    ac2 = AhoCorasick([(1, "ab"), (2, "cd")])
    assert ac2.search_spans("abcd") == [(0, 4)]


@settings(max_examples=200, deadline=None)
@given(
    pats=st.lists(_pat, min_size=1, max_size=15),
    text=st.text(alphabet="ab", max_size=50),
)
def test_search_spans_property(pats, text):
    """Spans must exactly cover the union of all naive match intervals,
    merged; the excised text must contain NO pattern as a substring
    ONLY when no pattern can be formed by splicing -- weaker invariant
    checked: covered positions == naive union, spans disjoint+sorted."""
    numbered = list(enumerate(pats))
    ac = AhoCorasick(numbered)
    spans = ac.search_spans(text)
    covered = set()
    for s, e in spans:
        assert 0 <= s < e <= len(text)
        assert not (covered & set(range(s, e)))  # disjoint
        covered |= set(range(s, e))
    naive = set()
    for _, pat in numbered:
        start = text.find(pat)
        while start != -1:
            naive |= set(range(start, start + len(pat)))
            start = text.find(pat, start + 1)
    assert covered == naive
    assert spans == sorted(spans)


def test_excise_contamination_operator(spark):
    from sparkdiff.operators.contamination import excise_contamination

    docs = spark.createDataFrame(
        [
            (1, "keep SECRET keep"),
            (2, "no match here"),
            (3, None),
            (4, "SECRETSECRET"),
        ],
        "doc_id long, text string",
    )
    pats = spark.createDataFrame([(7, "SECRET")], "test_id long, pat string")
    got = {
        r.doc_id: (r.clean_text, r.n_spans, r.n_chars_excised)
        for r in excise_contamination(docs, pats).collect()
    }
    assert got[1] == ("keep  keep", 1, 6)
    assert got[2] == ("no match here", 0, 0)
    assert got[3] == (None, 0, 0)
    assert got[4] == ("", 1, 12)  # adjacent occurrences merge to one span
    # empty suite: text passes through untouched
    empty = spark.createDataFrame([], "test_id long, pat string")
    out = {r.doc_id: r.clean_text for r in excise_contamination(docs, empty).collect()}
    assert out[1] == "keep SECRET keep"


def test_excise_contamination_rescan_reaches_fixpoint(spark):
    """rescan=N: a splice that manufactures a NEW pattern occurrence
    (the documented one-pass limitation: {'ab','XY'} over 'aXYb' ->
    'ab') is itself excised; counts accumulate across passes, and a
    clean doc pays nothing."""
    from sparkdiff.operators.contamination import excise_contamination

    docs = spark.createDataFrame(
        [
            (1, "aXYb"),          # one pass -> 'ab' (new match), two -> ''
            (2, "plain text"),
            (3, "aaXYXYbb"),      # nested: needs multiple passes
        ],
        "doc_id long, text string",
    )
    pats = spark.createDataFrame(
        [(1, "ab"), (2, "XY")], "test_id long, pat string"
    )
    one = {
        r.doc_id: (r.clean_text, r.n_spans)
        for r in excise_contamination(docs, pats).collect()
    }
    assert one[1] == ("ab", 1)  # the documented splice artifact
    fix = {
        r.doc_id: (r.clean_text, r.n_spans, r.n_chars_excised)
        for r in excise_contamination(docs, pats, rescan=10).collect()
    }
    assert fix[1] == ("", 2, 4)
    assert fix[2] == ("plain text", 0, 0)
    assert fix[3][0] == ""  # fully decontaminated
    assert fix[3][2] == 8   # every char was pattern mass
    # and the certified-clean texts really contain no pattern
    for t, _, _ in fix.values():
        assert "ab" not in t and "XY" not in t
