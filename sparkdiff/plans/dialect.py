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


# ---------------------------------------------------------------------------
# Hive -> Snowflake script conversion (the reference's /convert flow,
# tools/script_converter_tool.py rules 1-36, done deterministically)
# ---------------------------------------------------------------------------

#: INSERT to a dw table (udm_<entity>, NOT udm_s_/udm_pv_), optionally
#: already carrying a column-list/shorthand "(${columns...})" which rule
#: 31 says to leave untouched.
_INSERT_DW = re.compile(
    r"INSERT\s+(?:OVERWRITE\s+)?(?:INTO\s+)?(?:TABLE\s+)?"
    r"udm_(?!pv_|s_)(?P<entity>[A-Za-z0-9_]+)"
    r"(?P<collist>\s*\(\s*\$\{columns[^}]*\}\s*\))?",
    re.IGNORECASE,
)
_FROM_JOIN_PV = re.compile(r"\b(?P<kw>FROM|JOIN)(?P<ws>\s+)udm_pv_(?P<e>[A-Za-z0-9_]+)", re.IGNORECASE)
_FROM_JOIN_DW = re.compile(r"\b(?P<kw>FROM|JOIN)(?P<ws>\s+)udm_(?!pv_|s_)(?P<e>[A-Za-z0-9_]+)", re.IGNORECASE)
_UDM_SPARSE = re.compile(r"\budm_s_(?P<e>[A-Za-z0-9_]+)", re.IGNORECASE)

#: rule 15's main-script fingerprints
_MAIN_MARKS = (
    re.compile(r"collect_max_one", re.IGNORECASE),
    re.compile(r"SUBSTRING\s*\(\s*MAX\s*\(\s*CONCAT\s*\(\s*RowModified", re.IGNORECASE),
)

def _rewrite_collect_max_one_sf(m: re.Match) -> str:
    """Rule 13 forward: the Hive ``collect_max_one`` block becomes the
    Snowflake ``SUBSTRING(MAX(CONCAT(TO_NUMBER_CUSTOM(ord), IFF(...))),
    14)`` keep-latest idiom.  Only the canonical shape (val =
    ``COALESCE(col, default)``, ord = ``CASE WHEN col IS NULL then 0L
    else ordcol END``) is rewritten; anything else is left untouched for
    a human to review — same conservatism as the reference prompt's
    exact-block matching."""
    mo_val = re.match(
        r"COALESCE\s*\(\s*(?P<col>.+?)\s*,\s*(?P<dflt>[^,]+?)\s*\)\s*$",
        m.group("val"),
        re.IGNORECASE | re.DOTALL,
    )
    mo_ord = re.match(
        r"CASE\s+WHEN\s+.+?\s+IS\s+NULL\s+then\s+0L?\s+else\s+(?P<ordcol>.+?)\s+END\s*$",
        m.group("ord"),
        re.IGNORECASE | re.DOTALL,
    )
    if not (mo_val and mo_ord):
        return m.group(0)
    col = mo_val.group("col").strip()
    ordcol = mo_ord.group("ordcol").strip()
    expr = (
        f"SUBSTRING(MAX(CONCAT(TO_NUMBER_CUSTOM({ordcol}),"
        f"IFF(COALESCE({col},'') = '',NULL,{col}))),14)"
    )
    if m.group("cast_open"):
        expr = f"CAST({expr} AS {m.group('cast_type').strip()})"
    return expr


_HIVE_TO_SF_RULES: list[tuple[re.Pattern, object]] = [
    # rule 8: reflect URLDecoder -> decodeurl
    (
        re.compile(
            r"reflect\s*\(\s*['\"]java\.net\.URLDecoder['\"]\s*,\s*['\"]decode['\"]\s*,"
            r"\s*(?P<arg>" + _SIMPLE_ARG + r")\s*(?:,\s*['\"]UTF-8['\"]\s*)?\)",
            re.IGNORECASE,
        ),
        lambda m: f"decodeurl({m.group('arg').strip()})",
    ),
    # rule 9: reflect sha256Hex -> SHA2_HEX
    (
        re.compile(
            r"reflect\s*\(\s*['\"][\w.]*DigestUtils['\"]\s*,\s*['\"]sha256Hex['\"]\s*,"
            r"\s*(?P<arg>" + _SIMPLE_ARG + r")\s*\)",
            re.IGNORECASE,
        ),
        lambda m: f"SHA2_HEX({m.group('arg').strip()})",
    ),
    # rule 12: INSTR(str, sub) -> position(sub, str) — BEFORE rule 7 so
    # the emitted "position(" is not re-matched
    (
        re.compile(
            r"\bINSTR\s*\(\s*(?P<s>" + _SIMPLE_ARG + r")\s*,\s*(?P<c>"
            + _SIMPLE_ARG + r")\s*\)",
            re.IGNORECASE,
        ),
        lambda m: f"position({m.group('c').strip()}, {m.group('s').strip()})",
    ),
    # rule 7: locate -> position (same substring-first argument order)
    (re.compile(r"\blocate\s*\(", re.IGNORECASE), "position("),
    # rule 10: hash -> hashcode
    (re.compile(r"\bhash\s*\(", re.IGNORECASE), "hashcode("),
    # rule 11: LCASE -> LOWER
    (re.compile(r"\bLCASE\s*\(", re.IGNORECASE), "LOWER("),
    # rule 26: IF -> IFF (word-boundary, call form only)
    (re.compile(r"\bIF\s*\(", re.IGNORECASE), "IFF("),
    # rule 14: UNIX_TIMESTAMP()*1000 -> CURRENT_TIMESTAMP()
    (
        re.compile(r"\bUNIX_TIMESTAMP\s*\(\s*\)\s*\*\s*1000\b", re.IGNORECASE),
        "CURRENT_TIMESTAMP()",
    ),
    # rule 21: SPLIT(c, d)[n] -> SPLIT_PART(c, d, n) (the converter keeps
    # the index literal as-is)
    (
        re.compile(
            r"\bSPLIT\s*\(\s*(?P<c>" + _SIMPLE_ARG + r")\s*,\s*(?P<d>"
            + _SIMPLE_ARG + r")\s*\)\s*\[\s*(?P<n>\d+)\s*\]",
            re.IGNORECASE,
        ),
        lambda m: f"SPLIT_PART({m.group('c').strip()}, {m.group('d').strip()}, {m.group('n')})",
    ),
    # rule 22: ${hiveconf:Var} -> $Var
    (re.compile(r"\$\{hiveconf:([A-Za-z0-9_]+)\}"), r"$\1"),
    # rules 19/20: noise removal
    (re.compile(r"/\*\+\s*MAPJOIN\s*\([^)]*\)\s*\*/", re.IGNORECASE), ""),
    (re.compile(r"^\s*SET\s+mapred\.reduce\.tasks\s*=[^;]*;\s*$", re.IGNORECASE | re.MULTILINE), ""),
]


def hive_to_sf_script(script: str) -> str:
    """Deterministic Hive→Snowflake conversion of a workload script
    (rules 1-5, 7-12, 14-16, 19-22, 26, 28, 31 of the reference's
    converter prompt; the LLM-judgment rules about preserving structure,
    comments and aliases hold by construction since only targeted spans
    are rewritten).

    Table-reference rules: dw INSERT targets gain the delta_stage_
    prefix, an appended ``(${columns:<entity>::%1$s})`` column-list
    shorthand (left unexpanded, rule 5) and the INSERT OVERWRITE INTO
    form (rule 28); pv/dw FROM-JOIN references go to PUBLIC.<entity>
    (rules 2b/3); sparse tables go to delta_udm_ everywhere (rule 4).
    Main scripts (rule 15: contain a collect_max_one / SUBSTRING(MAX(
    CONCAT(RowModified idiom) get ``SET MD5Source`` prepended when
    missing, and their dw LEFT OUTER JOINs read ``TABLE($MD5Source)``
    (rule 16).
    """
    out = _COLLECT_MAX_ONE.sub(_rewrite_collect_max_one_sf, script)
    dw_entity: str | None = None

    def _insert_repl(m: re.Match) -> str:
        nonlocal dw_entity
        e = m.group("entity")
        dw_entity = dw_entity or e.lower()
        collist = m.group("collist")
        if not collist:  # rule 5: append the shorthand, values unexpanded
            collist = " (${columns:" + e.lower() + "::%1$s})"
        return f"INSERT OVERWRITE INTO delta_stage_{e}{collist}"

    out = _INSERT_DW.sub(_insert_repl, out)
    out = _FROM_JOIN_PV.sub(lambda m: f"{m.group('kw')}{m.group('ws')}PUBLIC.{m.group('e')}", out)
    out = _UDM_SPARSE.sub(lambda m: f"delta_udm_{m.group('e')}", out)
    out = _FROM_JOIN_DW.sub(lambda m: f"{m.group('kw')}{m.group('ws')}PUBLIC.{m.group('e')}", out)

    for pattern, repl in _HIVE_TO_SF_RULES:
        out = pattern.sub(repl, out)

    # rule 15 fingerprints the INPUT script (pre-rewrite), like the
    # reference prompt does
    is_main = any(p.search(script) for p in _MAIN_MARKS)
    if is_main and dw_entity:
        # rule 16: dw-side LEFT OUTER JOINs read the MD5Source variable
        out = re.sub(
            r"(LEFT\s+OUTER\s+JOIN\s+)PUBLIC\." + re.escape(dw_entity) + r"\b",
            r"\1TABLE($MD5Source)",
            out,
            flags=re.IGNORECASE,
        )
        # rule 15: ensure SET MD5Source at the top
        if not re.search(r"SET\s+MD5Source\s*=", out, re.IGNORECASE):
            out = f"SET MD5Source='PUBLIC.{dw_entity}';\n" + out
    return out
