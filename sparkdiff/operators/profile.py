"""One-pass table profiling (the ANALYZE TABLE / data-quality scan).

The reference surveys candidate tables column-by-column before wiring a
validation (``metrics_insight_tool.py`` walks DESCRIBE output and probes
per-column stats); here the probe is ONE distributed aggregation over
the table producing, per profiled column: non-null count, exact distinct
count, and canonicalized min/max — the statistics a re-validation
pipeline uses to pick join keys (ndv == row count -> candidate pk) and
to sanity-check a pair before diffing.

Scale notes: non-null/min/max come from ONE no-distinct aggregation
pass; each exact NDV is its OWN single-distinct aggregate (map-side
partial dedup, narrowest possible shuffle: one column's distinct
values), unioned to a (column, ndv) table and broadcast-joined back to
the stacked base profile.  This deliberately avoids the single-agg
multi-COUNT(DISTINCT) form: Catalyst plans that as an Expand that
multiplies the row stream by the number of profiled columns and funnels
all of them through one aggregate pipeline — measured 11-16 s vs 4.5 s
for the split shape on 600k rows × 6 columns, and the gap widens with
width.  Columnar parquet means the per-column jobs re-read only their
own column, so total I/O matches the fused pass.  For wide exploratory
profiling at 100 TB swap ``exact_ndv=False`` to use HyperLogLog
(``approx_count_distinct``) — one pass, no per-column jobs; the approx
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
    aggs: list[Column] = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in columns:
        # min/max in VALUE space, canonicalized after the aggregate —
        # rendering first would make the comparison lexicographic.
        aggs += [
            F.count(F.col(c)).cast("long").alias(f"_nn_{c}"),
            _canon(F.min(F.col(c)), dtypes[c]).alias(f"_min_{c}"),
            _canon(F.max(F.col(c)), dtypes[c]).alias(f"_max_{c}"),
        ]
        if not exact_ndv:
            aggs.append(
                F.approx_count_distinct(c).cast("long").alias(f"_ndv_{c}")
            )
    one = df.agg(*aggs)
    # fan the one-row aggregate out to a row per column (q67's stack
    # shape: the fan-out happens on one row, cost-free at any scale)
    if not exact_ndv:
        parts = ", ".join(
            f"'{c}', _nn_{c}, _ndv_{c}, _min_{c}, _max_{c}" for c in columns
        )
        return one.selectExpr(
            "n_rows",
            f"stack({len(columns)}, {parts}) as "
            "(column, n_nonnull, ndv, min_str, max_str)",
        ).select(
            "column", "n_rows", "n_nonnull", "ndv", "min_str", "max_str"
        )
    parts = ", ".join(
        f"'{c}', _nn_{c}, _min_{c}, _max_{c}" for c in columns
    )
    base = one.selectExpr(
        "n_rows",
        f"stack({len(columns)}, {parts}) as "
        "(column, n_nonnull, min_str, max_str)",
    )
    # one single-distinct aggregate per column (no Expand — see module
    # docstring), unioned into a tiny (column, ndv) side table
    ndvs = None
    for c in columns:
        part = (
            df.select(c)
            .agg(F.count_distinct(F.col(c)).cast("long").alias("ndv"))
            .select(F.lit(c).alias("column"), "ndv")
        )
        ndvs = part if ndvs is None else ndvs.unionAll(part)
    return base.join(F.broadcast(ndvs), "column").select(
        "column", "n_rows", "n_nonnull", "ndv", "min_str", "max_str"
    )
