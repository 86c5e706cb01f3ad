"""Grouped percentiles with a scale-safe default.

``F.percentile`` (exact, interpolated) buffers EVERY value of a group in
its aggregation buffer — at 100 TB a single hot group OOMs an executor.
This module provides the same interpolated-percentile semantics without
unbounded buffering:

``method='dist'`` (default) — exact percentiles from the value
    *distribution*: ``groupBy(keys, value).count()`` (map-side combined;
    the shuffle carries one row per DISTINCT (key, value) pair, not one
    per row), cumulative counts via range-partitioned prefix sums (no
    single-task sort even when one group holds every distinct value of
    a continuous column), then the standard linear interpolation
    ``v_lo + frac * (v_hi - v_lo)`` at position ``p * (n - 1)`` computed
    from two conditional-min aggregates per percentile.  Bit-compatible
    with ``F.percentile`` / DuckDB ``quantile_cont`` whenever the
    interpolation arithmetic is exact, and reproduced verbatim by the
    q50 oracle so the driver hash-check stays green.

``method='approx'`` — ``F.approx_percentile`` (GK sketch, bounded
    memory, rank error ≤ n/accuracy).  The right choice when an
    approximate answer is acceptable: one pass, no window.

``method='exact'`` — the original ``F.percentile`` buffering path, for
    small data where a single sort buffer per group is cheapest.

Reference parity: the reference's metrics summaries only MIN/MAX/AVG
(tools/data_diff_tool.py); grouped quantiles are part of the
training-data-pipeline extension surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: (output column name, value column, percentile) specs.
QuantileSpec = tuple[str, str, float]


def grouped_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    specs: Sequence[QuantileSpec],
    method: str = "dist",
    accuracy: int = 10_000,
    cum: str = "ranged",
    count_col: str | None = None,
) -> DataFrame:
    """Per-key percentiles: one output row per key group with a column
    per spec plus ``n`` (group row count).

    ``cum`` picks the cumulative-count strategy for ``method='dist'``:
    ``"ranged"`` (default — range-partitioned prefix sums; survives a
    continuous column whose one group holds every distinct value) or
    ``"window"`` (one per-group window; fewer stages, the right call
    ONLY when the value domain is provably bounded — quantized/
    categorical — so a group's distinct values fit one task at any
    corpus size).  Both produce bit-identical results.

    ``count_col`` (``method='dist'`` only, round 9): the input is
    ALREADY value-aggregated — one row per (keys, value) carrying its
    row count — so the rail sums that column instead of counting rows.
    Lets a caller that needs the distinct-value table for other work
    (q109 shares it with its binning pass) build it once.
    """
    keys = list(keys)
    if count_col is not None and method != "dist":
        raise ValueError("count_col requires method='dist'")
    if method == "exact":
        aggs = [
            F.percentile(vcol, F.lit(p)).alias(out) for out, vcol, p in specs
        ]
        return df.groupBy(*keys).agg(*aggs, F.count(F.lit(1)).alias("n"))
    if method == "approx":
        aggs = [
            F.approx_percentile(vcol, F.lit(p), F.lit(accuracy)).alias(out)
            for out, vcol, p in specs
        ]
        return df.groupBy(*keys).agg(*aggs, F.count(F.lit(1)).alias("n"))
    if method != "dist":
        raise ValueError(f"unknown method {method!r}; use dist|approx|exact")
    if cum not in ("ranged", "window"):
        raise ValueError(f"unknown cum {cum!r}; use ranged|window")
    return _dist_quantiles(df, keys, list(specs), cum, count_col)


def _dist_quantiles(
    df: DataFrame, keys: list[str], specs: list[QuantileSpec],
    cum: str = "ranged", count_col: str | None = None,
) -> DataFrame:
    """Distribution-based exact interpolated percentiles.

    All value columns are melted into (column-id, value) rows by ONE
    ``posexplode``, so the source is scanned once regardless of how many
    columns are quantiled.  With ``cum="ranged"`` (default) the
    cumulative count uses range-partitioned prefix sums (local window
    per range bucket + cross-bucket offsets), NOT a per-group window —
    a continuous column has ~n distinct values in one (key, column)
    group, and a group-partitioned window would push the whole
    distribution through one task.  ``cum="window"`` keeps the
    single-window shape (fewer stages — measured ~1 s cheaper per call
    at sf0.1) for callers whose value domain is PROVABLY bounded
    (quantized/categorical), where a group's distinct values fit one
    task at any corpus size.  NULLs are excluded per column (matching
    ``F.percentile``); ``n`` is the non-null count of the first spec's
    value column.
    """
    vcols = list(dict.fromkeys(vcol for _, vcol, _ in specs))
    melted = df.select(
        *keys,
        *([count_col] if count_col else []),
        F.posexplode(
            F.array(*[F.col(c).cast("double") for c in vcols])
        ).alias("_cid", "_v"),
    ).filter(F.col("_v").isNotNull())
    # pre-aggregated input: sum the carried counts; otherwise count rows
    _c_agg = (
        F.sum(count_col).cast("long") if count_col else F.count(F.lit(1))
    )
    counts = melted.groupBy(*keys, "_cid", "_v").agg(_c_agg.alias("_c"))
    gb = [*keys, "_cid"]
    if cum == "window":
        w_cum = Window.partitionBy(*gb).orderBy("_v")
        w_all = Window.partitionBy(*gb)
        dist = counts.select(
            *keys,
            "_cid",
            "_v",
            F.sum("_c").over(w_cum).alias("_cum"),
            F.sum("_c").over(w_all).alias("_n"),
        )
        return _interpolate(dist, keys, specs, vcols)
    # Cumulative counts WITHOUT a per-group window: a continuous column
    # (near-distinct doubles) makes one (key, column) group hold every
    # distinct value, so `Window.partitionBy(keys, _cid).orderBy(_v)`
    # funnels the whole distribution through one task (q109: 600k rows,
    # one reducer).  Instead: range-repartition on (keys, _cid, _v) —
    # parallel external sort; local prefix sums per range bucket; the
    # cross-bucket offset is a prefix over the (keys, _cid, #buckets)-row
    # bucket-sum table (window parallelism = groups x columns, each
    # partition ≤ #buckets rows), joined back by equi-key.  Same _cum/_n
    # values bit-for-bit; all consumers of the range exchange reuse one
    # materialized shuffle (see scalable_row_number).
    #
    # TWO persists (round 9; guide §5), each load-bearing:
    # - `counts`: repartitionByRange's boundary SAMPLING job executes
    #   the child once more than the shuffle itself, so unpersisted the
    #   whole scan→melt→groupBy chain runs twice per call.
    # - `part`: every consumer below reads `_pid = spark_partition_id()`
    #   and correctness requires ONE bucket assignment.  Un-cached, that
    #   consistency came from ReuseExchange deduping the identical range
    #   exchanges; with `counts` cached, the exchanges stopped
    #   canonical-matching and the sides sampled boundaries
    #   INDEPENDENTLY — caught by the sf0.1 oracle (wrong deciles).
    #   Caching `part` pins one materialized assignment for everyone.
    # Both are the distinct-(key, column, value) table, MEMORY_AND_DISK,
    # released by the session owner's clearCache (PERSISTS_BY_DESIGN).
    part = counts.persist().repartitionByRange(
        *[F.col(c) for c in gb], F.col("_v")
    ).withColumn("_pid", F.spark_partition_id()).persist()
    w_local = Window.partitionBy(*gb, "_pid").orderBy("_v")
    local = part.withColumn("_lcum", F.sum("_c").over(w_local))
    bsums = part.groupBy(*gb, "_pid").agg(F.sum("_c").alias("_bc"))
    w_off = (
        Window.partitionBy(*gb)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = bsums.select(
        *gb,
        "_pid",
        F.coalesce(F.sum("_bc").over(w_off), F.lit(0)).alias("_off"),
    )
    tots = bsums.groupBy(*gb).agg(F.sum("_bc").alias("_n"))
    dist = (
        local.join(offs, [*gb, "_pid"])
        .join(tots, gb)
        .select(
            *keys,
            "_cid",
            "_v",
            (F.col("_off") + F.col("_lcum")).alias("_cum"),
            "_n",
        )
    )
    return _interpolate(dist, keys, specs, vcols)


def _interpolate(
    dist: DataFrame, keys: list[str], specs: list[QuantileSpec],
    vcols: list[str],
) -> DataFrame:
    # Interpolated percentile at 0-based position p*(n-1): v_lo is the
    # value at rank floor(pos)+1 (1-based), v_hi at ceil(pos)+1.  All
    # terms are per-row expressions over (_cid, _cum, _n), so each
    # percentile is one conditional-min struct in a single groupBy.
    aggs = []
    for out, vcol, p in specs:
        on_col = F.col("_cid") == vcols.index(vcol)
        pos = F.lit(float(p)) * (F.col("_n") - 1).cast("double")
        lo = F.floor(pos)
        hi = F.ceil(pos)
        v_lo = F.min(F.when(on_col & (F.col("_cum") >= lo + 1), F.col("_v")))
        v_hi = F.min(F.when(on_col & (F.col("_cum") >= hi + 1), F.col("_v")))
        # the two interpolation coefficients exactly as Spark's
        # Percentile computes them: (pos - floor(pos)) and (ceil(pos) -
        # pos), both constant per (key, column) — min = the value
        frac = F.min(F.when(on_col, pos - lo.cast("double")))
        cofrac = F.min(F.when(on_col, hi.cast("double") - pos))
        aggs.append(
            F.struct(
                v_lo.alias("lo"),
                v_hi.alias("hi"),
                frac.alias("frac"),
                cofrac.alias("cofrac"),
            ).alias(f"_{out}")
        )
    n_agg = F.max(F.when(F.col("_cid") == 0, F.col("_n"))).alias("n")
    grouped = dist.groupBy(*keys).agg(*aggs, n_agg)
    # Spark's Percentile formula: (ceil(pos)-pos)*v_lo +
    # (pos-floor(pos))*v_hi, with the frac==0 case returning v_lo
    # directly (the blend would give 0).  Mirrored verbatim in the q50
    # oracle so both engines run the identical IEEE expression tree.
    outs = []
    for out, _, _ in specs:
        lo, hi, frac, cofrac = (
            F.col(f"_{out}.{f}") for f in ("lo", "hi", "frac", "cofrac")
        )
        outs.append(
            F.when(frac == 0, lo).otherwise(cofrac * lo + frac * hi).alias(out)
        )
    return grouped.select(*keys, *outs, "n")


def scalable_row_number(
    df: DataFrame,
    order_cols: Sequence,
    out_col: str = "rn",
) -> DataFrame:
    """Exact global ``row_number`` over a TOTAL order without funneling
    the table through one task.

    ``Window.orderBy(...)`` with no ``partitionBy`` plans an
    ``Exchange SinglePartition`` — every row through one reducer, the
    classic warehouse-scale cliff.  This rail keeps the same exact
    semantics with three bounded pieces:

    1. ``repartitionByRange`` on the sort key — a parallel external
       sort; range buckets are globally ordered by partition id and
       equal keys land in one bucket,
    2. a LOCAL ``row_number`` per range bucket (window partitioned by
       ``spark_partition_id()`` — parallelism = #buckets),
    3. the cumulative bucket-count offset joined back as a broadcast —
       the only small-table state is the #partitions-row counts table
       (offset = Σ counts of lower buckets via a bounded broadcast
       non-equi join, no SinglePartition exchange anywhere).

    ``order_cols`` must be a total order (include a unique tiebreak) so
    the result is deterministic regardless of where the range sampler
    places bucket boundaries.  NOTE a real dependency: ``local`` and
    ``counts`` both derive from the same ``part`` reference, and
    correctness REQUIRES both to see the same ``_pid`` assignment —
    i.e. the range exchange must be materialized once, not recomputed
    with freshly-sampled boundaries.  ``part`` is therefore PERSISTED
    (round 9): the rail originally leaned on canonical-subtree exchange
    reuse (``ReuseExchange`` matching the two identical exchange
    subtrees), which holds for plain scans but BROKE the moment a
    caller persisted the rail's input (q143: the two range exchanges
    over the InMemoryRelation stopped canonical-matching, sampled
    boundaries independently, and the offsets keyed to the wrong
    assignment — caught by the sf0.1 value-hash).  One cached
    ``(_pid, row)`` table pins the assignment for both consumers under
    any input, exactly like ``_dist_quantiles``' ``part`` persist.
    Callers therefore show up in the persist-lifecycle audit
    (PERSISTS_BY_DESIGN).

    CACHE LIFECYCLE (round-9 advisor finding): the persist has no
    unpersist handle — under the bench/oracle convention the session
    owner calls ``spark.catalog.clearCache()`` between queries, which
    bounds it.  A long-lived driver invoking this rail (or
    ``systematic_weighted_sample``) repeatedly in one session — e.g.
    ``layout.skipping_report`` looping over layouts, or ``blocking``'s
    two calls — accumulates one bounded cache entry per call until the
    owner clears; callers that need scoped lifetimes should pass a
    pre-persisted input and manage it themselves (the
    ``batch_shingles`` pattern in ``dedup.incremental_near_dup_pairs``).
    """
    order_cols = list(order_cols)
    part = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    ).persist()
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    local = part.withColumn("_lrn", F.row_number().over(w))
    counts = part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    offsets = (
        counts.alias("a")
        .join(
            F.broadcast(counts.select(
                F.col("_pid").alias("_bpid"), F.col("_c").alias("_bc")
            )),
            F.col("_bpid") < F.col("_pid"),
            "left",
        )
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_bc"), F.lit(0)).cast("long").alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def weighted_quantile_cuts(
    df: DataFrame,
    value_col,
    weight_col,
    n_bins: int = 10,
) -> DataFrame:
    """Exact WEIGHTED quantile cut points: ``(bin, target_weight,
    cut)`` for bin = 1..n_bins-1, where ``cut`` is the smallest value
    whose cumulative weight reaches ``ceil(bin·W/n_bins)`` — the
    importance-weighted twin of the q109 equi-depth cuts (token-count-
    weighted corpus statistics, quantity-weighted price deciles).

    Scale shape: weights collapse to one row per DISTINCT value first
    (map-side combine); the cumulative weight rides the same
    range-partitioned prefix-sum rail as ``_dist_quantiles``'s ranged
    mode — no per-group window over a continuous domain.  Cut
    selection joins the (9-row, broadcast) target table with a >=
    predicate and takes MIN(value) per bin; integer weights keep every
    comparison exact."""
    vw = df.groupBy(F.col(value_col).alias("_v")).agg(
        F.sum(weight_col).cast("long").alias("_w")
    # persisted for the same reasons as _dist_quantiles' ranged path
    # (round 9): `vw` so the boundary sampler does not re-run the
    # scan→groupBy chain, `part` so every `_pid` consumer reads ONE
    # materialized bucket assignment (see the comment there)
    ).persist()
    part = vw.repartitionByRange(F.col("_v")).withColumn(
        "_pid", F.spark_partition_id()
    ).persist()
    w_local = Window.partitionBy("_pid").orderBy("_v")
    local = part.withColumn("_lcum", F.sum("_w").over(w_local))
    bsums = part.groupBy("_pid").agg(F.sum("_w").alias("_bc"))
    # bounded: one row per range bucket (= shuffle partitions)
    w_off = (
        Window.partitionBy()
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = bsums.select(
        "_pid", F.coalesce(F.sum("_bc").over(w_off), F.lit(0)).alias("_off")
    )
    tot = bsums.agg(F.sum("_bc").cast("long").alias("_W"))
    pre = local.join(offs, "_pid").select(
        "_v", (F.col("_off") + F.col("_lcum")).cast("long").alias("_cum")
    )
    spark = df.sparkSession
    targets = (
        spark.range(1, n_bins)
        .select(F.col("id").cast("long").alias("bin"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.expr(f"(bin * _W + {n_bins - 1}) DIV {n_bins}")
            .cast("long")
            .alias("target_weight"),
        )
    )
    return (
        pre.join(F.broadcast(targets), F.col("_cum") >= F.col("target_weight"))
        .groupBy("bin", "target_weight")
        .agg(F.min("_v").alias("cut"))
    )
