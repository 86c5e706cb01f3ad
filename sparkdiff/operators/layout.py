"""Data-layout planning: Z-order (Morton) clustering keys and a
file-skipping effectiveness report.

At 100 TB the cheapest query is the one that never reads the file:
parquet/Delta/Iceberg readers prune whole files from per-file min/max
column statistics, so the LAYOUT — which rows share a file — decides
how selective those stats are.  A linear sort gives perfect pruning on
the leading sort column and none on any other; Z-ORDER interleaves the
bits of several columns so every file covers a small hyper-rectangle
of the key space and range predicates on ANY of the interleaved
columns prune most files (the Morton-curve layout popularized by
Delta/Databricks ``OPTIMIZE ZORDER BY`` and Iceberg's sort orders; the
reference's warehouse tables lean on single-column clustering only —
this operator is the multi-dimensional extension a re-validation
pipeline needs when its diff predicates hit more than one column).

Nothing here shuffles more than the sort itself: the Morton key is a
pure 64-bit integer expression (whole-stage codegen, no UDF), the
file-id assignment rides the repartitionByRange rail from
``quantiles.scalable_row_number`` (no SinglePartition exchange), and
the report aggregates per (layout, file) before the tiny per-predicate
rollup — one range shuffle + one hash shuffle per layout at any scale.

Exactness: every step is integer arithmetic (bit spread, min-max
scaling with ``div``), so file boundaries — and therefore the report —
are bit-identical on any engine that can replay ``row_number`` over
the same total order; the DuckDB oracle does exactly that.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Morton spread masks for 16-bit dimensions interleaved 2-wide.
#: x = (x | x<<8) & M8; (x | x<<4) & M4; (x | x<<2) & M2; (x | x<<1) & M1
_SPREAD2 = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread2(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` to even bit positions (0,2,..,30)
    via the classic mask cascade — 8 long ops, all codegen'd."""
    x = c.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD2:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key2(x: Column, y: Column) -> Column:
    """64-bit Morton key interleaving the low 16 bits of two
    NON-NEGATIVE integer columns (bit j of ``x`` → position 2j, of
    ``y`` → 2j+1).  Scale inputs to [0, 65535] first — see
    :func:`scale16`.  Pure integer expression: deterministic, portable,
    and SQL-replicable (the oracle replays the same mask cascade)."""
    return _spread2(x).bitwiseOR(F.shiftleft(_spread2(y), 1))


def scale16(c: Column, cmin: Column, cmax: Column) -> Column:
    """Min-max scale an integer column to [0, 65535]:
    ``floor((c - cmin) * 65535 / max(1, cmax - cmin))``.
    ``cmin``/``cmax`` normally come from a one-row aggregate broadcast
    (in-plan, no driver collect).  The floor-of-double-division is
    EXACT here: the numerator is a non-negative integer bounded by
    span·65535, and any span below 2^37 keeps it under 2^53 where
    doubles represent integers exactly (the oracle's integer ``//``
    then agrees bit-for-bit)."""
    span = F.greatest(cmax - cmin, F.lit(1)).cast("long")
    scaled = (c.cast("long") - cmin.cast("long")) * F.lit(65535)
    return F.floor(scaled / span).cast("long")


def skipping_report(
    df: DataFrame,
    layouts: dict[str, Sequence[Column | str]],
    stat_cols: Sequence[str],
    predicates: dict[
        str, tuple[str, int, int] | Sequence[tuple[str, int, int]]
    ],
    rows_per_file: int,
) -> DataFrame:
    """Simulate each candidate file layout and measure min/max
    file-skipping effectiveness for a set of range predicates.

    ``layouts`` maps layout name → total-order sort key (include a
    unique tiebreak column so file assignment is deterministic);
    ``stat_cols`` are the integer columns whose per-file min/max a
    reader would keep; ``predicates`` maps predicate name → either one
    ``(stat_col, lo, hi)`` inclusive range or a SEQUENCE of them — a
    multi-clause entry is the CONJUNCTION (a reader skips a file when
    ANY clause's ``[lo,hi]`` misses the file's ``[min,max]``, so the
    hit test ANDs the per-clause overlap tests — exactly the pruning a
    multi-column WHERE gets).  Returns one row per (layout, predicate):
    total files, files a min/max reader must read, and the matching
    rows inside those files — ``files_hit / n_files`` IS the fraction
    of the table scanned at 100 TB.

    Cost per layout: the scalable_row_number range rail (parallel
    external sort, broadcast offsets) + one groupBy(file) — never a
    SinglePartition window; the per-file stats table is
    ``n_rows / rows_per_file`` rows, and the predicate evaluation runs
    on that small table only.
    """
    from sparkdiff.operators.quantiles import scalable_row_number

    if rows_per_file <= 0:
        raise ValueError(f"rows_per_file must be positive: {rows_per_file}")
    for p in predicates:
        if not p.isidentifier():
            raise ValueError(f"predicate name must be an identifier: {p!r}")
    reports = []
    for lname, order_cols in layouts.items():
        rn = scalable_row_number(df, list(order_cols), out_col="_rn")
        files = rn.withColumn(
            "_fid", F.expr(f"(_rn - 1) div {int(rows_per_file)}")
        )
        aggs = [F.count(F.lit(1)).alias("_frows")]
        for c in stat_cols:
            aggs += [
                F.min(c).alias(f"_min_{c}"),
                F.max(c).alias(f"_max_{c}"),
            ]
        stats = files.groupBy("_fid").agg(*aggs)
        # ALL predicates in ONE aggregate over the small per-file stats
        # table (a per-predicate branch would re-run the whole sort
        # rail per predicate), then a 1-row stack fans out the report.
        paggs = [F.count(F.lit(1)).cast("long").alias("n_files")]
        for pname, spec in predicates.items():
            clauses = [spec] if isinstance(spec[0], str) else list(spec)
            hit = F.lit(True)
            for c, lo, hi in clauses:
                hit = hit & (
                    (F.col(f"_min_{c}") <= F.lit(hi))
                    & (F.col(f"_max_{c}") >= F.lit(lo))
                )
            paggs += [
                F.sum(hit.cast("long")).cast("long").alias(f"_fh_{pname}"),
                F.sum(F.when(hit, F.col("_frows")).otherwise(0))
                .cast("long")
                .alias(f"_rh_{pname}"),
            ]
        one = stats.agg(*paggs)
        parts = ", ".join(
            f"'{p}', _fh_{p}, _rh_{p}" for p in predicates
        )
        reports.append(
            one.selectExpr(
                "n_files",
                f"stack({len(predicates)}, {parts}) as "
                "(predicate, files_hit, rows_in_hit_files)",
            ).select(
                F.lit(lname).alias("layout"),
                "predicate",
                "n_files",
                "files_hit",
                "rows_in_hit_files",
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out
