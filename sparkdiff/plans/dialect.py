"""Deterministic dialect rewriter (X5).

The reference "converts" Hive scripts to Snowflake with a 37-rule LLM
prompt (``tools/script_converter_tool.py:31-215``).  On Spark most of
those rules are unnecessary — Spark SQL *is* (a superset of) the Hive
dialect — so the engine only needs a small deterministic layer:

1. ``to_spark_sql``: make either dialect runnable on Spark —
   * Hive-isms Spark lacks: ``reflect(...)`` forms (rules 8/9) and the
     custom ``collect_max_one`` UDAF pattern (rule 13) → native
     ``url_decode`` / ``sha2`` / ``max_by``;
   * Snowflake-isms from sf-side scripts: ``IFF``, ``SPLIT_PART``,
     ``decodeurl``, ``SHA2_HEX``, ``hashcode``, ``TO_NUMBER_CUSTOM``,
     ``DATEADD(second, n, ts)``;
   * noise: ``MAPJOIN`` hints (rule 19), ``SET mapred.reduce.tasks``
     (rule 20).

Plain-regex, no LLM: the rewrites the prompt describes are mechanical.
"""

from __future__ import annotations

import re

_COLLECT_MAX_ONE = re.compile(
    r"CASE\s+WHEN\s+map_values\s*\(\s*collect_max_one\s*\(\s*(?P<val>.+?)\s*,\s*"
    r"(?P<ord>CASE\s+WHEN\s+.+?\s+END)\s*\)\s*\)\s*\[0\]\s*=\s*0L?\s+THEN\s+NULL\s+"
    r"ELSE\s+(?P<cast_open>cast\s*\(\s*)?map_keys\s*\(\s*collect_max_one\s*\(\s*"
    r"(?P=val)\s*,\s*(?P=ord)\s*\)\s*\)\s*\[0\]\s*(?(cast_open)as\s+(?P<cast_type>[a-z0-9_(), ]+?)\s*\))\s*END",
    re.IGNORECASE | re.DOTALL,
)


def _rewrite_collect_max_one(m: re.Match) -> str:
    """``collect_max_one(value, ord)`` keeps the value whose ``ord`` is
    maximal, yielding NULL when the winning ord is 0 (i.e. the column was
    NULL on every row).  Native equivalent:
    ``CASE WHEN max(ord)=0 THEN NULL ELSE max_by(value, struct(ord, value))
    END`` — the struct ordering pins tie-breaks to the string-max of the
    value, exactly what the Snowflake form
    ``SUBSTRING(MAX(CONCAT(pad(ts), val)), 14)`` (converter rule 13)
    does when two rows share the winning timestamp (SURVEY §7.4 #2)."""
    val, ordk = m.group("val"), m.group("ord")
    expr = (
        f"CASE WHEN max({ordk}) = 0 THEN NULL "
        f"ELSE max_by({val}, struct({ordk}, {val})) END"
    )
    if m.group("cast_open"):
        expr = f"CAST({expr} AS {m.group('cast_type').strip()})"
    return expr


_SIMPLE_ARG = r"[^(),]+(?:\([^()]*\))?[^(),]*"

_RULES: list[tuple[re.Pattern, object]] = [
    # reflect('java.net.URLDecoder','decode', X [,'UTF-8'])  -> url_decode(X)
    (
        re.compile(
            r"reflect\s*\(\s*['\"]java\.net\.URLDecoder['\"]\s*,\s*['\"]decode['\"]\s*,"
            r"\s*(?P<arg>" + _SIMPLE_ARG + r")\s*(?:,\s*['\"]UTF-8['\"]\s*)?\)",
            re.IGNORECASE,
        ),
        lambda m: f"url_decode({m.group('arg').strip()})",
    ),
    # reflect('...DigestUtils','sha256Hex', X) -> sha2(X, 256)
    (
        re.compile(
            r"reflect\s*\(\s*['\"][\w.]*DigestUtils['\"]\s*,\s*['\"]sha256Hex['\"]\s*,"
            r"\s*(?P<arg>" + _SIMPLE_ARG + r")\s*\)",
            re.IGNORECASE,
        ),
        lambda m: f"sha2({m.group('arg').strip()}, 256)",
    ),
    # Snowflake custom scalar functions (rules 8-10, 13)
    (
        re.compile(r"\bSHA2_HEX\s*\(\s*(?P<arg>" + _SIMPLE_ARG + r")\s*\)", re.IGNORECASE),
        lambda m: f"sha2({m.group('arg').strip()}, 256)",
    ),
    (re.compile(r"\bdecodeurl\s*\(", re.IGNORECASE), "url_decode("),
    (re.compile(r"\bhashcode\s*\(", re.IGNORECASE), "hash("),
    # TO_NUMBER_CUSTOM(ts): 13-digit zero-padded epoch-millis rendering
    # (so SUBSTRING(..., 14) strips it -- converter rule 13/27)
    (
        re.compile(
            r"\bTO_NUMBER_CUSTOM\s*\(\s*(?P<arg>" + _SIMPLE_ARG + r")\s*\)",
            re.IGNORECASE,
        ),
        lambda m: f"lpad(cast(cast({m.group('arg').strip()} as bigint) as string), 13, '0')",
    ),
    # IFF -> if (rule 26 inverse)
    (re.compile(r"\bIFF\s*\(", re.IGNORECASE), "if("),
    # SPLIT_PART(c, d, n) -> element_at(split(c, d), n)  (rule 21 inverse)
    (
        re.compile(
            r"\bSPLIT_PART\s*\(\s*(?P<c>" + _SIMPLE_ARG + r")\s*,\s*(?P<d>"
            + _SIMPLE_ARG + r")\s*,\s*(?P<n>\d+)\s*\)",
            re.IGNORECASE,
        ),
        lambda m: f"element_at(split({m.group('c').strip()}, {m.group('d').strip()}), {m.group('n')})",
    ),
    # DATEADD(second, n, ts) -> ts + INTERVAL n SECOND (rule 34 inverse)
    (
        re.compile(
            r"\bDATEADD\s*\(\s*second\s*,\s*(?P<n>-?\d+)\s*,\s*(?P<ts>"
            + _SIMPLE_ARG + r")\s*\)",
            re.IGNORECASE,
        ),
        lambda m: f"({m.group('ts').strip()} + INTERVAL {m.group('n')} SECOND)",
    ),
    # noise removal (rules 19, 20)
    (re.compile(r"/\*\+\s*MAPJOIN\s*\([^)]*\)\s*\*/", re.IGNORECASE), ""),
    (re.compile(r"^\s*SET\s+mapred\.reduce\.tasks\s*=[^;]*;\s*$", re.IGNORECASE | re.MULTILINE), ""),
]


def to_spark_sql(script: str) -> str:
    """Rewrite a Hive or Snowflake workload script into Spark SQL."""
    out = _COLLECT_MAX_ONE.sub(_rewrite_collect_max_one, script)
    for pattern, repl in _RULES:
        out = pattern.sub(repl, out)
    return out
