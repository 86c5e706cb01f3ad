"""One-pass table profiling (the ANALYZE TABLE / data-quality scan).

The reference surveys candidate tables column-by-column before wiring a
validation (``metrics_insight_tool.py`` walks DESCRIBE output and probes
per-column stats); here the probe is ONE distributed aggregation over
the table producing, per profiled column: non-null count, exact distinct
count, and canonicalized min/max — the statistics a re-validation
pipeline uses to pick join keys (ndv == row count -> candidate pk) and
to sanity-check a pair before diffing.

Scale notes: all metrics come from a single ``agg`` pass.  Multiple
exact COUNT(DISTINCT) in one aggregate makes Catalyst plan an Expand
(one duplicated stream per distinct column) — row volume multiplies by
the number of profiled columns, but each stream carries ONLY its one
column (column pruning keeps the expand narrow), partial aggregation
still combines map-side, and there is exactly one shuffle.  For wide
exploratory profiling at 100 TB swap ``exact_ndv=False`` to use
HyperLogLog (``approx_count_distinct``) — no Expand at all; the approx
variant is pinned within rtol in tests but is NOT the oracle path
(sketches are not engine-portable).

The min/max canonical rendering mirrors ``functions/canonical.py``'s
rules (scaled-long for doubles, second-precision timestamps) so the
profile is hash-comparable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: fixed-point scale for double min/max (4 decimal places, floor —
#: floor(x*10^4) is IEEE-exact and portable; decimal casts are NOT:
#: Spark rounds HALF_UP where DuckDB rounds half-even).
_DBL_SCALE = 10_000


def _canon(c: Column, dt: T.DataType) -> Column:
    if isinstance(dt, T.DoubleType) or isinstance(dt, T.FloatType):
        return F.floor(c * F.lit(_DBL_SCALE)).cast("string")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    if isinstance(dt, T.DateType):
        return F.date_format(c, "yyyy-MM-dd")
    return c.cast("string")


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact_ndv: bool = True
) -> DataFrame:
    """Profile ``columns`` (default: every non-complex column) in one
    aggregation pass; returns one row per column:
    ``(column, n_rows, n_nonnull, ndv, min_str, max_str)``."""
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    if columns is None:
        columns = [
            c
            for c in df.columns
            if not isinstance(
                dtypes[c], (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
            )
        ]
    ndv = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_ndv
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs: list[Column] = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in columns:
        # min/max in VALUE space, canonicalized after the aggregate —
        # rendering first would make the comparison lexicographic.
        aggs += [
            F.count(F.col(c)).cast("long").alias(f"_nn_{c}"),
            ndv(c).cast("long").alias(f"_ndv_{c}"),
            _canon(F.min(F.col(c)), dtypes[c]).alias(f"_min_{c}"),
            _canon(F.max(F.col(c)), dtypes[c]).alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    # fan the one-row aggregate out to a row per column (q67's stack
    # shape: the fan-out happens on one row, cost-free at any scale)
    parts = ", ".join(
        f"'{c}', _nn_{c}, _ndv_{c}, _min_{c}, _max_{c}" for c in columns
    )
    return one.selectExpr(
        "n_rows",
        f"stack({len(columns)}, {parts}) as "
        "(column, n_nonnull, ndv, min_str, max_str)",
    ).select("column", "n_rows", "n_nonnull", "ndv", "min_str", "max_str")
