"""Text/search analytics primitives (SURVEY.md §2.8 F13–F21).

The reference implements these in per-row Python over REST-result dicts
(``agents/slack_search_agent.py``, ``tools/cdp_chat_tool/*``).  Here they
are pure column expressions — JVM-side, codegen-friendly, no UDFs — so
they vectorize inside whole-stage codegen and scale to full corpora.

All constants (stopword list, status weights, scoring weights) are pinned
module-level so Spark queries and ANSI oracles share one source of truth.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Deterministic stand-in for the reference's NLTK english stopword set
#: (``slack_search_agent.py:129-131`` loads NLTK; the engine pins a fixed
#: list so results are reproducible without model downloads).
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "in", "to", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "are",
)

#: Status → weight map of the reference's relevance blend
#: (``slack_search_agent.py:64-68``).
STATUS_WEIGHTS: tuple[tuple[str, float], ...] = (
    ("closed", 1.0),
    ("resolved", 0.9),
    ("done", 0.85),
    ("in progress", 0.5),
    ("open", 0.3),
)

#: Recency decay horizon in days (``1 - days/730`` floored at 0,
#: ``slack_search_agent.py:70-77``).
RECENCY_HORIZON_DAYS = 730

TOKEN_SPLIT_RE = "[^a-z0-9]+"
MIN_TOKEN_LEN = 3


def raw_tokens(col: Column | str) -> Column:
    """Lowercased alnum tokens (F17 first stage)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), TOKEN_SPLIT_RE)


def tokens(col: Column | str) -> Column:
    """F17: tokenize + stopword removal + length>2 filter
    (``slack_search_agent.py:129-131,163-164``)."""
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.filter(
        raw_tokens(col),
        lambda t: (F.length(t) >= MIN_TOKEN_LEN) & ~F.array_contains(stop, t),
    )


def jaccard(a: Column, b: Column) -> Column:
    """F13: ``|a∩b| / |a∪b|`` over distinct token sets
    (``jira_tool.py:430-435``).  0.0 when both sets are empty."""
    da, db = F.array_distinct(a), F.array_distinct(b)
    union = F.size(F.array_union(da, db))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        F.size(F.array_intersect(da, db)).cast("double") / union.cast("double")
    )


def term_hits(text: Column | str, terms: list[str]) -> Column:
    """P9/F16 core: number of query terms contained in the text
    (substring containment, as the reference's ``word in text`` checks)."""
    t = F.lower(F.col(text) if isinstance(text, str) else text)
    hit = lambda term: F.contains(t, F.lit(term)).cast("long")
    out = hit(terms[0])
    for term in terms[1:]:
        out = out + hit(term)
    return out


def term_hit_score(text: Column | str, terms: list[str], resolved: Column) -> Column:
    """F16: +10 per matched term, +5 if resolved
    (``slack_search_agent.py:660-673``)."""
    return term_hits(text, terms) * 10 + F.when(resolved, 5).otherwise(0)


def status_weight(status: Column | str) -> Column:
    """Status-weight lookup of the relevance blend (F15)."""
    c = F.lower(F.col(status) if isinstance(status, str) else status)
    expr = None
    for name, w in STATUS_WEIGHTS:
        expr = (F.when(c == name, w) if expr is None else expr.when(c == name, w))
    return expr.otherwise(F.lit(0.4))


def recency_score(age_days: Column) -> Column:
    """F15 recency component: ``max(0, 1 - days/730)``."""
    return F.greatest(
        F.lit(0.0), F.lit(1.0) - age_days.cast("double") / F.lit(float(RECENCY_HORIZON_DAYS))
    )


def relevance_blend(semantic: Column, keyword: Column, status_recency: Column) -> Column:
    """F15: ``0.5*semantic + 0.3*keyword + 0.2*status_recency`` scaled to
    0-100 (``slack_search_agent.py:46-87``).  Kept un-rounded (double) so
    the value is engine-exact; callers may round for presentation.
    """
    return (
        F.lit(0.5) * semantic + F.lit(0.3) * keyword + F.lit(0.2) * status_recency
    ) * F.lit(100.0)


# --- SQL fragments so oracles share the exact same constants -------------

def sql_stoplist() -> str:
    return "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


def sql_tokens(expr: str) -> str:
    """DuckDB expression equivalent to :func:`tokens`."""
    return (
        f"list_filter(string_split_regex(lower({expr}), '{TOKEN_SPLIT_RE}'), "
        f"t -> length(t) >= {MIN_TOKEN_LEN} AND NOT list_contains({sql_stoplist()}, t))"
    )
