"""Canonical string rendering for cross-system value comparison.

The reference compares every cell AS A STRING: its Snowflake stored proc
reads both sides with ``getColumnValueAsString`` (reference
``db-setup.sql:19,27``) and its change-detection workload hashes rows via
``md5(concat(COALESCE(CAST(col AS STRING),'NULL'), ...))`` (reference
``tools/script_converter_tool.py:169-170``).  Reproducing that faithfully
in a *portable* way is the subtlest correctness problem in the engine
(SURVEY.md §7.4): Spark's ``CAST(double AS STRING)``, Snowflake's and
DuckDB's renderings all disagree on scientific notation thresholds and
trailing digits.

Policy (applied identically on both diff sides and in any ANSI oracle):

- NULL            → the sentinel string ``'NULL'``
- double/float    → ``CAST(CAST(x AS DECIMAL(18,4)) AS STRING)`` — fixed
                    4-decimal rendering, engine-independent, and exactly the
                    scale the reference pins for decimals (converter rule 27,
                    ``tools/script_converter_tool.py:77-85``)
- timestamp       → ``date_format(ts, 'yyyy-MM-dd HH:mm:ss')`` (second
                    precision, UTC session)
- date            → ISO ``yyyy-MM-dd``
- boolean         → ``'true'`` / ``'false'``
- integral/string → plain ``CAST(x AS STRING)``

Rows are fingerprinted with md5 over the canonical columns joined by an
ASCII unit separator — the reference's row-hash change-detection primitive
(F6/P7 in SURVEY.md §2.8).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NULL_SENTINEL = "NULL"
#: Field separator for row fingerprints. \x1f (unit separator) cannot appear
#: in the testdata and keeps ('ab','c') distinct from ('a','bc').
SEP = "\x1f"

DECIMAL_RENDER = "decimal(18,4)"
TS_FORMAT = "yyyy-MM-dd HH:mm:ss"


def canonical_col(
    col: Column | str,
    dtype: T.DataType,
    decimal_scale: int | None = 4,
    ts_format: str = TS_FORMAT,
) -> Column:
    """Render one column to its canonical string (never NULL).

    SENSITIVITY FLOOR: the defaults round doubles to ``decimal(18,4)``
    and timestamps to whole seconds, so differences below 1e-4 (e.g.
    717.2786 vs 717.278634433 — the reference's own cited discrepancy
    class, ``agents/suggester_agent.py:42``) or sub-second drift compare
    as EQUAL.  When both sides come from the same engine (identical
    float rendering), pass ``decimal_scale=None`` for engine-native
    full-precision strings and a fractional ``ts_format`` (e.g.
    ``'yyyy-MM-dd HH:mm:ss.SSSSSS'``) to tighten the floor; the default
    exists because cross-engine CAST-to-string renderings disagree on
    trailing digits and scientific-notation thresholds.
    """
    c = F.col(col) if isinstance(col, str) else col
    if isinstance(c_t := dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        if decimal_scale is None:
            rendered = c.cast("string")
        else:
            # values overflowing decimal(18,scale) cast to NULL (ANSI
            # off) — fall back to the engine-native rendering so huge
            # values stay distinguishable from real NULLs (and from
            # each other)
            rendered = F.coalesce(
                c.cast(f"decimal(18,{int(decimal_scale)})").cast("string"),
                c.cast("string"),
            )
    elif isinstance(c_t, (T.TimestampType, T.TimestampNTZType)):
        rendered = F.date_format(c, ts_format)
    elif isinstance(c_t, T.DateType):
        rendered = F.date_format(c, "yyyy-MM-dd")
    else:
        # integral, string, boolean: Spark casts bool -> 'true'/'false',
        # matching ANSI engines.
        rendered = c.cast("string")
    return F.coalesce(rendered, F.lit(NULL_SENTINEL))


def _resolve_fields(
    df: DataFrame, names: Iterable[str]
) -> list[tuple[str, str, T.DataType]]:
    """Resolve requested names to ``(requested, actual, dtype)``
    case-insensitively — Snowflake-side frames habitually carry
    upper-cased identifiers while the compared-column list is computed
    from the hive side, and Spark itself resolves ``F.col`` without case
    sensitivity by default."""
    by_upper = {f.name.upper(): (f.name, f.dataType) for f in df.schema.fields}
    out = []
    for n in names:
        try:
            actual, dtype = by_upper[n.upper()]
        except KeyError:
            raise KeyError(
                f"column {n!r} not found (case-insensitive) in {df.columns}"
            ) from None
        out.append((n, actual, dtype))
    return out


def canonical_columns(
    df: DataFrame,
    cols: Iterable[str] | None = None,
    decimal_scale: int | None = 4,
    ts_format: str = TS_FORMAT,
) -> list[Column]:
    """Canonical renderings (aliased to the *requested* names) for ``cols``."""
    names = list(cols) if cols is not None else list(df.columns)
    return [
        canonical_col(actual, dtype, decimal_scale, ts_format).alias(requested)
        for requested, actual, dtype in _resolve_fields(df, names)
    ]


def row_fingerprint(
    df: DataFrame,
    cols: Iterable[str],
    decimal_scale: int | None = 4,
    ts_format: str = TS_FORMAT,
) -> Column:
    """md5 fingerprint over the canonical rendering of ``cols``.

    This is the reference's change-detection primitive
    (``md5(concat(...)) != md5(concat(...))``, converter example
    ``tools/script_converter_tool.py:169-170``) and the key to diffing wide
    tables at scale: rows whose fingerprints match are never unpivoted.
    """
    parts = [
        canonical_col(actual, dtype, decimal_scale, ts_format)
        for _, actual, dtype in _resolve_fields(df, cols)
    ]
    return F.md5(F.concat_ws(SEP, *parts))


def content_checksum(*cols: Column | str) -> Column:
    """Commutative, engine-portable content-checksum AGGREGATE: the SUM
    of per-row 60-bit md5 digests over the chr(31)-joined rendering of
    ``cols``, accumulated in ``decimal(38,0)`` and rendered as a plain
    digit string.

    This is the bucket-checksum idiom of ``operators.diff`` (sum of
    bounded per-row hashes — order-independent, partitioning-
    independent, mergeable) made oracle-portable: DuckDB replays it as
    ``CAST(SUM(CAST('0x' || substr(md5(a || chr(31) || b), 1, 15) AS
    BIGINT)) AS VARCHAR)`` bit-for-bit.  Each summand is < 2^60 and the
    decimal(38,0) accumulator holds > 2^126, so the sum is exact past
    10^18 rows — no unbounded per-group buffer, no collect_list: every
    aggregation state is one decimal.  The string rendering exists
    because both engines' pandas fetch would round a 38-digit numeric
    to float64.

    A single-character change in any row flips its 60-bit digest, so
    the sum changes unless a second row's digest moves by the exact
    opposite amount (probability ~2^-60 per pair) — the same collision
    contract as the rest of the md5-60-bit family.

    NULL handling: every column is rendered through an explicit NUL-byte
    sentinel (``coalesce(cast(c as string), chr(0))``) on BOTH engines, so
    the digest is injective across NULL positions — ``('a', NULL, 'b')``
    and ``('a', 'b', NULL)`` hash differently, and a NULL never silently
    drops a separator (Spark ``concat_ws`` skips NULLs) or the whole row
    (DuckDB ``||`` null-propagates and SUM would drop it)."""
    rendered = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"), F.lit("\x00")
        )
        for c in cols
    ]
    row_digest = F.conv(
        F.substring(F.md5(F.concat_ws(SEP, *rendered)), 1, 15), 16, 10
    ).cast("decimal(28,0)")
    return F.sum(row_digest).cast("decimal(38,0)").cast("string")


def oracle_content_checksum_sql(*exprs: str) -> str:
    """The DuckDB replay of :func:`content_checksum` (chr(31) IS the
    ``SEP`` separator; chr(0) is the per-column NULL sentinel on both
    engines, keeping the digest injective across NULL positions)."""
    joined = " || chr(31) || ".join(
        f"COALESCE(CAST({e} AS VARCHAR), chr(0))" for e in exprs
    )
    return (
        f"CAST(SUM(CAST('0x' || substr(md5({joined}), 1, 15) AS BIGINT)) "
        "AS VARCHAR)"
    )


def oracle_canonical_sql(col: str, duck_type: str) -> str:
    """The DuckDB-SQL expression equivalent to :func:`canonical_col`.

    Used by oracle queries so both engines render identically.
    """
    t = duck_type.lower()
    if t in ("double", "float", "real") or t.startswith("decimal"):
        expr = (
            f"COALESCE(CAST(TRY_CAST({col} AS DECIMAL(18,4)) AS VARCHAR), "
            f"CAST({col} AS VARCHAR))"
        )
    elif t.startswith("timestamp"):
        expr = f"strftime({col}, '%Y-%m-%d %H:%M:%S')"
    elif t == "date":
        expr = f"strftime({col}, '%Y-%m-%d')"
    else:
        expr = f"CAST({col} AS VARCHAR)"
    return f"COALESCE({expr}, '{NULL_SENTINEL}')"
