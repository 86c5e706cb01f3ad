"""``${columns:...}`` macro pre-parser (X4) — schema-driven SQL templating.

Grammar (from the reference's engine and its usage in the real workload
scripts, ``tools/script_expansion_tool.py:112-172`` and
``tools/script_converter_tool.py:48-62,144-155``):

    ${columns:<table>[:~excl1,excl2][:<format-spec>]}

- ``<table>`` resolves through the schema catalog (with the staged-name
  prefix fallback).  An EMPTY table slot (``${columns:::alias.%1$s}`` —
  the rule-31 shorthand of the converter prompt) resolves to the entity
  of the nearest preceding ``INSERT`` target in the script, with the
  staging-convention prefixes (``udm_``, ``delta_stage_``, ``PUBLIC.``
  …) stripped.
- ``~excl`` removes columns (case-insensitive).
- ``<format-spec>`` is either ONE format applied to every column, or a
  ``:``-separated list of per-type variants in the fixed order
  ``string : boolean : integral : double : decimal`` (this positional
  type dispatch is how the production scripts instantiate the
  ``collect_max_one`` pattern per column class — converter rule 13).
  ``%1$s`` is replaced by the column name.  Default format: ``%1$s``.

Also supports ``${hiveconf:Var}`` substitution (converter rule 22).

This is a *pre-parser*: it runs before ``spark.sql`` and emits plain SQL
text — no Catalyst rule needed (SURVEY §4).
"""

from __future__ import annotations

import re

from sparkdiff.sources.catalog import ColumnMeta, SchemaCatalog

_PATTERN = re.compile(r"\$\{(columns:[^}]+)\}")
_HIVECONF = re.compile(r"\$\{hiveconf:([A-Za-z0-9_]+)\}")
_INSERT_TARGET = re.compile(
    r"INSERT\s+(?:OVERWRITE\s+)?(?:INTO\s+)?(?:TABLE\s+)?"
    r"(?P<target>[A-Za-z0-9_.$]+)",
    re.IGNORECASE,
)
#: staging-convention prefixes stripped to recover the catalog entity
#: from an INSERT target (script_converter_tool.py rules 1-4)
_ENTITY_PREFIXES = ("udm_pv_", "udm_s_", "udm_", "delta_stage_", "delta_udm_")


def _entity_of(target: str) -> str:
    t = target.strip().lower()
    if "." in t:  # PUBLIC.customer and friends
        t = t.rsplit(".", 1)[1]
    for p in _ENTITY_PREFIXES:
        if t.startswith(p):
            return t[len(p):]
    return t

#: positional type-dispatch order of the format variants (converter rule 13)
_TYPE_SLOT = {
    "STRING": 0,
    "TIMESTAMP": 0,
    "DATE": 0,
    "BOOLEAN": 1,
    "INTEGER": 2,
    "LONG": 2,
    "DOUBLE": 3,
    "DECIMAL": 4,
}


class MacroExpander:
    def __init__(self, catalog: SchemaCatalog, upper_names: bool = False) -> None:
        """``upper_names=True`` reproduces the reference's upper-casing of
        emitted column names; default keeps catalog casing (friendlier to
        case-preserving engines, semantically identical on Spark)."""
        self.catalog = catalog
        self.upper_names = upper_names

    def _format_for(self, variants: list[str], col: ColumnMeta) -> str:
        if len(variants) == 1:
            return variants[0]
        slot = _TYPE_SLOT.get(col.type, 0)
        return variants[min(slot, len(variants) - 1)]

    def _expand_one(
        self, match: re.Match, inserts: list[tuple[int, str]] | None = None
    ) -> str:
        parts = match.group(1).split(":")
        if len(parts) < 2 or parts[0].lower() != "columns":
            return match.group(0)
        table = parts[1].strip().lower()
        if not table:
            # rule-31 shorthand ${columns:::fmt}: table = entity of the
            # nearest preceding INSERT target; unresolvable -> unchanged
            # (the reference leaves failed expansions in place)
            table = next(
                (e for pos, e in reversed(inserts or []) if pos <= match.start()),
                "",
            )
            if not table:
                return match.group(0)
        rest = parts[2:]
        exclusions: set[str] = set()
        if rest and rest[0] == "":
            # ${columns:t::fmt} — empty exclusions slot
            rest = rest[1:]
        elif rest and rest[0].startswith("~"):
            exclusions = {
                e.strip().upper() for e in rest[0][1:].split(",") if e.strip()
            }
            rest = rest[1:]
        variants = [v.strip() for v in rest if v.strip()] or ["%1$s"]
        if len(variants) > 1 and not all("%1$s" in v for v in variants):
            # a ':' inside one plain format, not a type-dispatch list
            variants = [":".join(variants)]

        cols = [
            c
            for c in self.catalog.get_columns_for_table(table)
            if c.name.strip().upper() not in exclusions
        ]
        rendered = []
        for c in cols:
            name = c.name.strip()
            if not name:
                continue
            if self.upper_names:
                name = name.upper()
            rendered.append(self._format_for(variants, c).replace("%1$s", name))
        return ", ".join(rendered)

    def expand(self, script: str, hiveconf: dict[str, str] | None = None) -> str:
        inserts = [
            (m.start(), _entity_of(m.group("target")))
            for m in _INSERT_TARGET.finditer(script)
        ]
        out = _PATTERN.sub(lambda m: self._expand_one(m, inserts), script)
        if hiveconf:
            out = _HIVECONF.sub(
                lambda m: hiveconf.get(m.group(1), m.group(0)), out
            )
        return out
