"""Text analysis for large-scale training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Beyond the reference's own surface (BASELINE.json north star): these are
the per-document scoring passes an LLM-data pipeline runs over billions
of documents, so every one is a pure column expression — no UDFs, fully
codegen'd, trivially data-parallel.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from sparkdiff.functions.text import raw_tokens, sql_stoplist, tokens

#: Marker-word heuristics per language (n-gram-free deterministic lang-ID;
#: a real deployment would swap in fastText via a pandas_udf — the operator
#: contract stays the same).
LANG_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "a", "and", "of", "in", "is", "to")),
    ("de", ("der", "die", "das", "und", "ist", "nicht")),
    ("fr", ("le", "la", "les", "et", "est", "une")),
    ("es", ("el", "los", "las", "es", "una", "que")),
)


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    m = F.array(*[F.lit(x) for x in markers])
    return F.size(F.array_intersect(F.array_distinct(toks), m)).cast("long")


def lang_id(text: Column | str, toks: Column | None = None) -> Column:
    """Predict language by distinct marker-word hits; ties break by the
    declaration order in ``LANG_MARKERS``; no hits → 'und'.

    ``toks``: an already-materialized token-array column to score instead
    of re-splitting ``text`` (value-identical: marker words are non-empty,
    so the empty-string tokens a raw split keeps and a filtered array
    drops can never hit)."""
    if toks is None:
        toks = raw_tokens(text)
    hits = [(lang, _marker_hits(toks, mk)) for lang, mk in LANG_MARKERS]
    best = None
    for lang, h in hits:
        cond = (h > 0)
        for other_lang, oh in hits:
            if other_lang == lang:
                continue
            # earlier-declared languages win ties
            earlier = [l for l, _ in LANG_MARKERS].index(other_lang) < [
                l for l, _ in LANG_MARKERS
            ].index(lang)
            cond = cond & ((h > oh) | ((h == oh) & F.lit(not earlier)))
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    return best.otherwise(F.lit("und"))


def alnum_len(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(F.regexp_replace(F.lower(c), "[^a-z0-9]", ""))


def quality_score(text: Column | str, toks: Column | None = None) -> Column:
    """Composite quality in [0,1]: length saturation + alnum cleanliness +
    stopword naturalness (the length/punct/stopword-ratio class of
    heuristics).  Expression structure is mirrored verbatim in the oracle
    so the IEEE evaluation order matches.

    ``toks``: an already-materialized NON-EMPTY token array (the
    `_tokenized_docs` `_toks` column — ``filter(split(lower(text),
    '[^a-z0-9]+'), length > 0)``) to count from instead of re-splitting
    ``text`` twice; value-identical because ``n_toks`` counted exactly
    the non-empty raw tokens and ``tokens(c)``'s length≥3 + stopword
    filter subsumes the non-empty filter.
    """
    from sparkdiff.functions.text import MIN_TOKEN_LEN, STOPWORDS

    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c).cast("double")
    length_score = F.least(F.lit(1.0), n / F.lit(500.0))
    clean_ratio = alnum_len(c).cast("double") / F.greatest(n, F.lit(1.0))
    if toks is None:
        raw = raw_tokens(c)
        n_toks = F.size(F.filter(raw, lambda t: F.length(t) > 0)).cast("double")
        n_content = F.size(tokens(c)).cast("double")
    else:
        stop = F.array(*[F.lit(s) for s in STOPWORDS])
        n_toks = F.size(toks).cast("double")
        n_content = F.size(
            F.filter(
                toks,
                lambda t: (F.length(t) >= MIN_TOKEN_LEN)
                & ~F.array_contains(stop, t),
            )
        ).cast("double")
    stop_ratio = F.lit(1.0) - n_content / F.greatest(n_toks, F.lit(1.0))
    return (
        F.lit(0.4) * length_score
        + F.lit(0.3) * clean_ratio
        + F.lit(0.3) * stop_ratio
    )


def ws_token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.filter(F.split(c, "\\s+"), lambda t: F.length(t) > 0)).cast(
        "long"
    )


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish token estimate: alnum runs + non-space punctuation marks
    each count as one token (a cheap ``len(tokenize(text))`` stand-in)."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.size(F.filter(raw_tokens(c), lambda t: F.length(t) > 0))
    punct = F.length(F.regexp_replace(F.lower(c), "[a-z0-9\\s]", ""))
    return (words + punct).cast("long")


def word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams from a MATERIALIZED token-array column
    (materialize first — HOF lambdas re-evaluate captured expressions
    per element, see SCALE.md).  Fewer than ``n`` tokens → empty array."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def dup_fraction(grams: Column) -> Column:
    """``1 - distinct/total`` over a MATERIALIZED n-gram array column.
    Materializing the grams in a prior projection matters: building them
    inline duplicates the whole transform subtree into both the total
    and the distinct count (measured ~2.3x slower at sf0.1).

    FILTER CONSUMERS NEED A REAL BARRIER: a projection alone does not
    protect a ``.filter(dup_fraction(...) < t)`` — predicate pushdown
    substitutes the projected gram expression (word_ngrams and whatever
    fed it) into the filter condition below the project, re-creating
    the inline-duplication trap plus per-element HOF re-evaluation
    (measured ~15x on the curation probe, SCALE.md).  Either persist()
    the gram projection before filtering (InMemoryRelation is a
    pushdown barrier — the q68 convention) or project the score/flag as
    a COLUMN and aggregate on it instead of filtering (the q67 funnel
    shape)."""
    total = F.size(grams).cast("double")
    uniq = F.size(F.array_distinct(grams)).cast("double")
    return F.when(total > 0, F.lit(1.0) - uniq / total).otherwise(F.lit(0.0))


def repetition_ratio(toks: Column, n: int = 3) -> Column:
    """Duplicate word-n-gram fraction ``1 - distinct/total`` — the
    Gopher-style repetition signal: boilerplate and looping generations
    score high, natural prose low.  0.0 for docs shorter than ``n``
    tokens.  Convenience form; for multiple n values per doc, project
    ``word_ngrams`` to columns first and apply :func:`dup_fraction`."""
    return dup_fraction(word_ngrams(toks, n))


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 over the normalized (lowercased,
    alnum-only) text — the reference's md5-row-hash idiom (F6) applied to
    documents; near-identical docs that differ only in
    punctuation/whitespace collide intentionally."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(c), "[^a-z0-9]", ""))


# --- DuckDB mirrors ------------------------------------------------------

def sql_lang_id(expr: str) -> str:
    toks = f"list_distinct(string_split_regex(lower({expr}), '[^a-z0-9]+'))"
    hit_exprs = {
        lang: (
            f"len(list_intersect({toks}, "
            f"[{', '.join(repr(m) for m in mk)}]))"
        )
        for lang, mk in LANG_MARKERS
    }
    langs = [lang for lang, _ in LANG_MARKERS]
    cases = []
    for lang in langs:
        h = hit_exprs[lang]
        conds = [f"{h} > 0"]
        for other in langs:
            if other == lang:
                continue
            oh = hit_exprs[other]
            if langs.index(other) < langs.index(lang):
                conds.append(f"{h} > {oh}")
            else:
                conds.append(f"({h} > {oh} OR {h} = {oh})")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(cases) + " ELSE 'und' END"


def sql_quality_score(expr: str) -> str:
    n = f"CAST(length({expr}) AS DOUBLE)"
    alnum = f"CAST(length(regexp_replace(lower({expr}), '[^a-z0-9]', '', 'g')) AS DOUBLE)"
    toks = f"string_split_regex(lower({expr}), '[^a-z0-9]+')"
    n_toks = f"CAST(len(list_filter({toks}, t -> length(t) > 0)) AS DOUBLE)"
    n_content = (
        f"CAST(len(list_filter({toks}, t -> length(t) >= 3 "
        f"AND NOT list_contains({sql_stoplist()}, t))) AS DOUBLE)"
    )
    return (
        f"0.4 * least(1.0, {n} / 500.0)"
        f" + 0.3 * ({alnum} / greatest({n}, 1.0))"
        f" + 0.3 * (1.0 - {n_content} / greatest({n_toks}, 1.0))"
    )
