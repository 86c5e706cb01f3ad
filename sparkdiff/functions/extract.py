"""Regex entity extraction + lexicon classification (F18–F21, P8,
P11/P12, U3).

The reference extracts Jira keys / URLs / error patterns with per-row
Python regexes (``tools/cdp_chat_tool/slack_tool.py:373-381,501-509``,
``agents/slack_search_agent.py:177-180``) and classifies content with
keyword lexicons (``mcp_enhanced_search_agent.py:1294-1309``).  Pure
column expressions here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Jira issue-key pattern (``slack_tool.py:501-509``).
JIRA_KEY_RE = r"\b[A-Z][A-Z0-9]{1,9}-\d+\b"
URL_RE = r"https?://[^\s<>|]+"

#: Solution/error lexicons (≈ the reference's 30-term lists,
#: ``slack_tool.py:383-390``, ``direct_api_fallback.py:418-421``).
SOLUTION_KEYWORDS = (
    "fixed", "resolved", "solution", "workaround", "patch", "solved",
    "root cause", "mitigation",
)
ERROR_KEYWORDS = (
    "error", "exception", "failed", "failure", "timeout", "crash",
)


def extract_all(col: Column | str, pattern: str) -> Column:
    """U3: distinct regex matches, order-normalized."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sort_array(F.array_distinct(F.regexp_extract_all(c, F.lit(pattern), 0)))


def contains_word(col: Column | str, word: str) -> Column:
    """P8: word-boundary containment (``\\b<word>\\b`` rlike)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(rf"\b{word}\b")


def matches_lexicon(col: Column | str, lexicon: tuple[str, ...]) -> Column:
    """P12/F19/F20: any lexicon term contained in the lowercased text."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    out = F.contains(c, F.lit(lexicon[0]))
    for term in lexicon[1:]:
        out = out | F.contains(c, F.lit(term))
    return out
