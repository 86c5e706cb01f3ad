"""Table-parity diff — the reference's flagship capability, Spark-native.

The reference computes this with (a) a pandas outer-merge presence diff
(``tools/compare_tool.py:34-42``), (b) ONE Snowflake stored-proc RPC **per
id** for the cell-level diff, hard-capped at 3 ids
(``db-setup.sql:2-50``, ``tools/data_matrix_tool.py:43-65``), and (c) a
metrics table maintained out-of-band (``db-setup.sql:76-102``).

Here the whole thing is one lazy DataFrame lineage that diffs *every* row
of both sides in one distributed job:

1. ``presence_diff``  — full-outer join on the pk → per-row presence flags
   (the hive-only / sf-only sets the metrics table stores as PK arrays).
2. ``cell_diff``      — two-phase value diff designed for wide tables at
   100 TB scale:

   * phase 1: canonical-string row fingerprints (md5) on both sides, inner
     join on pk, keep only rows whose fingerprints differ.  This is the
     reference's own ``md5(concat(...))`` change-detection idea
     (``tools/script_converter_tool.py:169-170``) promoted into the
     physical plan: a 500-column × 10^8-row table never gets unpivoted —
     only the (typically tiny) differing subset does.
   * phase 2: ``stack()`` unpivot of the differing rows → one row per
     ``(pk, column_name)`` with both canonical renderings, filtered to
     unequal pairs — the stored proc's ``[col, hiveVal, sfVal]`` triples
     (``db-setup.sql:17-34``) for all ids at once.

3. ``diff_report``    — group-merge per column into sorted deduped value
   sets, mirroring ``tools/data_matrix_tool.py:69-86``.
4. ``table_metrics``  — one ``dw_data_metrics``-shaped row
   (``db-setup.sql:76-102``) computed from the pair.

Excluded columns (the reference reads them from ``DW.DW_SHADOW_RUN_CONF``
and filters the proc output, ``db-setup.sql:29-33``) are removed from the
compared set *before* fingerprinting, so an excluded-only change neither
shows in the cell diff nor counts as a discrepancy.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdiff.functions.canonical import canonical_columns, row_fingerprint


def _compared_columns(
    hive_df: DataFrame,
    sf_df: DataFrame,
    pk: str,
    exclude_cols: Sequence[str],
) -> list[str]:
    """Columns to diff: common to both sides, minus pk and exclusions
    (case-insensitive, as in the reference's upper-cased conf values)."""
    excl = {c.upper() for c in exclude_cols}
    # case-insensitive intersection: Snowflake-side frames habitually
    # carry upper-cased identifiers, and Spark resolves case-insensitively
    sf_cols = {c.upper() for c in sf_df.columns}
    return [
        c
        for c in hive_df.columns
        if c.upper() != pk.upper()
        and c.upper() in sf_cols
        and c.upper() not in excl
    ]


def presence_diff(hive_df: DataFrame, sf_df: DataFrame, pk: str) -> DataFrame:
    """Rows present on exactly one side: ``(pk_value string, side string)``.

    ``side`` ∈ {'hive_only', 'sf_only'} — the sets the reference surfaces as
    ``HIVE_ONLY_PK_VALUES`` / ``SF_ONLY_PK_VALUES`` (``db-setup.sql:83-87``)
    via its pandas ``indicator=True`` outer merge
    (``tools/compare_tool.py:34-42``).  Implemented as a pk-only full-outer
    join: column pruning keeps the shuffle narrow (pk only), and Catalyst
    is free to pick broadcast when one side is small.
    """
    h = (
        hive_df.select(F.col(pk).cast("string").alias("pk_value"))
        .distinct()
        .withColumn("_h", F.lit(1))
    )
    s = (
        sf_df.select(F.col(pk).cast("string").alias("pk_value"))
        .distinct()
        .withColumn("_s", F.lit(1))
    )
    j = h.join(s, "pk_value", "full_outer")
    return (
        j.filter(F.col("_h").isNull() | F.col("_s").isNull())
        .select(
            "pk_value",
            F.when(F.col("_s").isNull(), F.lit("hive_only"))
            .otherwise(F.lit("sf_only"))
            .alias("side"),
        )
    )


def cell_diff(
    hive_df: DataFrame,
    sf_df: DataFrame,
    pk: str,
    exclude_cols: Sequence[str] = (),
    decimal_scale: int | None = 4,
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
    unique_sides: Sequence[str] = (),
    broadcast_side: str | None = None,
) -> DataFrame:
    """Cell-level diff: ``(pk_value, column_name, hive_value, sf_value)``.

    All values are canonical strings (see ``functions.canonical``) — the
    Spark equivalent of the proc's ``getColumnValueAsString`` comparison
    (``db-setup.sql:19,27``).  Only rows whose md5 row-fingerprints differ
    are unpivoted (scale design, see module docstring).

    SENSITIVITY FLOOR: with the default ``decimal_scale=4`` /
    second-precision ``ts_format``, value differences below 1e-4 and
    sub-second timestamp drift are reported as EQUAL (see
    ``functions.canonical.canonical_col``).  Same-engine pairs can pass
    ``decimal_scale=None`` and a fractional ``ts_format`` to tighten it.

    INCREMENTAL-BATCH KNOBS: ``unique_sides`` names sides
    (``'hive'``/``'sf'``) whose pk is already unique — their duplicate-pk
    min-struct rollup (a full shuffle of that side) is skipped.
    ``broadcast_side`` pins a broadcast hash join on the named side.
    Together they give the plan an incremental diff needs at 100 TB:
    with ``unique_sides=('hive','sf'), broadcast_side='hive'`` (hive =
    the small changed-rows batch) the big side is scanned in place —
    ZERO exchanges — instead of being shuffled per batch, and AQE's
    after-the-shuffle broadcast discovery is not relied upon.  Don't
    broadcast a side that can grow past executor memory (backfills).
    """
    bad = set(unique_sides) - {"hive", "sf"}
    if bad:
        raise ValueError(f"unique_sides must be from ('hive','sf'), got {bad}")
    if broadcast_side not in (None, "hive", "sf"):
        raise ValueError(
            f"broadcast_side must be None, 'hive' or 'sf', got {broadcast_side!r}"
        )
    cols = _compared_columns(hive_df, sf_df, pk, exclude_cols)
    if not cols:
        raise ValueError("no common non-excluded columns to diff")

    def _side(df: DataFrame, fp_name: str, prefix: str, unique: bool) -> DataFrame:
        proj = df.select(
            F.col(pk).cast("string").alias("pk_value"),
            row_fingerprint(df, cols, decimal_scale, ts_format).alias(fp_name),
            *[
                c.alias(f"{prefix}{i}")
                for i, c in enumerate(
                    canonical_columns(df, cols, decimal_scale, ts_format)
                )
            ],
        )
        if unique:
            # caller guarantees one row per pk — no rollup, no shuffle
            return proj
        # one deterministic row per pk (min over the full struct) — same
        # duplicate-pk hardening as table_metrics; co-partitioned with the
        # join key, so AQE plans no extra shuffle
        value_cols = [c for c in proj.columns if c != "pk_value"]
        agg = proj.groupBy("pk_value").agg(
            F.min(F.struct(*value_cols)).alias("_r")
        )
        return agg.select(
            "pk_value", *[F.col(f"_r.{c}").alias(c) for c in value_cols]
        )

    h = _side(hive_df, "_fp", "_h_", "hive" in unique_sides)
    s = _side(sf_df, "_fp_s", "_s_", "sf" in unique_sides)
    if broadcast_side == "hive":
        h = F.broadcast(h)
    elif broadcast_side == "sf":
        s = F.broadcast(s)

    changed = h.join(s, "pk_value", "inner").filter(F.col("_fp") != F.col("_fp_s"))

    # Unpivot only the changed rows: stack(n, name_i, hive_i, sf_i, ...).
    stack_args: list[str] = []
    for i, c in enumerate(cols):
        name_lit = c.replace("'", "''")
        stack_args += [f"'{name_lit}'", f"_h_{i}", f"_s_{i}"]
    stacked = changed.selectExpr(
        "pk_value",
        f"stack({len(cols)}, {', '.join(stack_args)}) AS (column_name, hive_value, sf_value)",
    )
    return stacked.filter(F.col("hive_value") != F.col("sf_value"))


def bucket_summary(
    df: DataFrame,
    pk: str,
    cols: Sequence[str],
    n_buckets: int = 4096,
    decimal_scale: int | None = 4,
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
    distinct_pks: bool = True,
) -> DataFrame:
    """One side's per-bucket summary: ``(bucket, n, checksum[, n_pks])``
    — row count, commutative decimal-sum content checksum, and (batch
    only) exact distinct-pk count.  Pure column expressions, so the same
    lineage runs as a STREAMING aggregation (``distinct_pks=False``;
    distinct aggregation isn't supported on streams) with state bounded
    at ``n_buckets`` rows — see ``streaming.validate``.
    """
    proj = df.select(
        F.col(pk).cast("string").alias("pk_value"),
        row_fingerprint(df, list(cols), decimal_scale, ts_format).alias("_fp"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("pk_value", "_fp").cast("decimal(28,0)")).alias(
            "checksum"
        ),
    ]
    if distinct_pks:
        aggs.append(F.count_distinct(F.col("pk_value")).alias("n_pks"))
    return proj.groupBy(
        F.pmod(F.xxhash64("pk_value"), F.lit(n_buckets)).alias("bucket")
    ).agg(*aggs)


def _bucket_summaries(
    hive_df: DataFrame,
    sf_df: DataFrame,
    pk: str,
    exclude_cols: Sequence[str],
    n_buckets: int,
    decimal_scale: int | None,
    ts_format: str,
) -> DataFrame:
    """Joined per-bucket summaries: ``(bucket, _hn, _hd, _hs, _sn, _sd,
    _ss)`` — row count, distinct-pk count, and commutative content
    checksum per side."""
    cols = _compared_columns(hive_df, sf_df, pk, exclude_cols)

    def side(df: DataFrame, suffix: str) -> DataFrame:
        return bucket_summary(
            df, pk, cols, n_buckets, decimal_scale, ts_format
        ).select(
            "bucket",
            F.col("n").alias(f"_{suffix}n"),
            F.col("n_pks").alias(f"_{suffix}d"),
            F.col("checksum").alias(f"_{suffix}s"),
        )

    return side(hive_df, "h").join(side(sf_df, "s"), "bucket", "full_outer")


def dirty_pk_buckets(
    hive_df: DataFrame,
    sf_df: DataFrame,
    pk: str,
    exclude_cols: Sequence[str] = (),
    n_buckets: int = 4096,
    decimal_scale: int | None = 4,
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """Buckets of pk-hash space whose content checksums differ between
    the sides — the re-validation prefilter for repeated parity runs.

    Each side is reduced to ``n_buckets`` summary rows: per bucket
    (``pmod(xxhash64(pk), n_buckets)``), a row count plus a COMMUTATIVE
    content checksum — the sum of per-row ``xxhash64(pk, fingerprint)``
    accumulated as ``decimal(28,0)`` (so the 38-digit sum result never
    overflows below ~10^10 rows *per bucket*; size ``n_buckets``
    accordingly).  Order-independence makes the checksum partitioning-
    invariant, and the sum (unlike xor) cannot be cancelled by an even
    number of identical duplicate rows — the dup-pk case the rest of the
    diff family hardens against.

    A bucket whose (count, checksum) pair matches on both sides holds
    identical content with probability 1 - 2^-64-ish; only mismatching
    buckets need the wide re-diff.  The shuffle this job carries is
    ``n_buckets`` summary rows per side — the wide columns never move.
    """
    j = _bucket_summaries(
        hive_df, sf_df, pk, exclude_cols, n_buckets, decimal_scale, ts_format
    )
    clean = F.col("_hn").eqNullSafe(F.col("_sn")) & F.col("_hs").eqNullSafe(
        F.col("_ss")
    )
    return j.filter(~clean).select("bucket")


def refine_pair(
    hive_df: DataFrame,
    sf_df: DataFrame,
    pk: str,
    exclude_cols: Sequence[str] = (),
    n_buckets: int = 4096,
    decimal_scale: int | None = 4,
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
) -> tuple[DataFrame, DataFrame]:
    """Filter both sides down to the pk-buckets that actually changed.

    ``presence_diff`` / ``cell_diff`` / ``diff_report`` over the refined
    pair produce IDENTICAL output to a full run (every divergent or
    one-sided pk lives in a dirty bucket by construction — q52 pins this
    against the full-diff SQL oracle), but at a low drift rate the wide
    shuffle covers only the dirty slice of the table.

    The dirty bucket ids are collected to the driver (bounded by
    ``n_buckets``, default 4096 ints — configuration-sized) and applied
    as an ``isin`` literal on each side's bucket expression.  Collecting
    beats a semi-join here for two reasons: the filter evaluates at the
    scan with no join stage, and a lazy semi-join would recompute the
    two checksum scans once per consumer, which at 100 TB is two extra
    full passes.  All-clean pairs short-circuit to empty frames.
    """
    dirty = [
        r.bucket
        for r in dirty_pk_buckets(
            hive_df, sf_df, pk, exclude_cols, n_buckets, decimal_scale, ts_format
        ).collect()
    ]
    if not dirty:
        return (hive_df.filter(F.lit(False)), sf_df.filter(F.lit(False)))
    if len(dirty) == n_buckets:
        return (hive_df, sf_df)

    def keep(df: DataFrame) -> DataFrame:
        b = F.pmod(F.xxhash64(F.col(pk).cast("string")), F.lit(n_buckets))
        return df.filter(b.isin(dirty))

    return keep(hive_df), keep(sf_df)


def write_bucket_store(
    df: DataFrame,
    pk: str,
    cols: Sequence[str],
    path: str,
    n_buckets: int = 4096,
    decimal_scale: int | None = 4,
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
) -> None:
    """Persist one side's bucket summary as the pair's checksum store.

    Re-validating a pair where one side is stable (the classic
    hive-snapshot vs live-snowflake setup) should not rescan the stable
    side every run: store its summary once (``n_buckets`` rows — KBs),
    then each run scans ONLY the changed side and compares against the
    store (:func:`dirty_vs_store`).  Parameters (n_buckets, sensitivity)
    must match between writer and reader; they are embedded in the data
    only via the bucket count, so keep them in the pair's config.
    """
    bucket_summary(df, pk, cols, n_buckets, decimal_scale, ts_format).write.mode(
        "overwrite"
    ).parquet(path)


def dirty_vs_store(
    df: DataFrame,
    store: DataFrame | str,
    pk: str,
    cols: Sequence[str],
    n_buckets: int = 4096,
    decimal_scale: int | None = 4,
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """Dirty buckets of ``df`` vs a stored summary — identical answer to
    :func:`dirty_pk_buckets` against the stored side's table (pinned by
    test), at the cost of one scan of ``df`` plus a KB-sized store read.

    The comparison is row-count + checksum (the store's ``n``/
    ``checksum``); the distinct-pk column, when present in the store, is
    ignored here — it only feeds :func:`refined_table_metrics` totals.
    """
    if isinstance(store, str):
        store = df.sparkSession.read.parquet(store)
    mine = bucket_summary(
        df, pk, cols, n_buckets, decimal_scale, ts_format, distinct_pks=False
    )
    ref = store.select(
        "bucket",
        F.col("n").alias("_rn"),
        F.col("checksum").alias("_rs"),
    )
    j = mine.join(ref, "bucket", "full_outer")
    clean = F.col("n").eqNullSafe(F.col("_rn")) & F.col("checksum").eqNullSafe(
        F.col("_rs")
    )
    return j.filter(~clean).select("bucket")


def refined_table_metrics(
    hive_df: DataFrame,
    sf_df: DataFrame,
    pk: str,
    table_name: str,
    exclude_cols: Sequence[str] = (),
    max_pk_values: int | None = None,
    n_buckets: int = 4096,
    decimal_scale: int | None = 4,
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """:func:`table_metrics` for re-validation runs: one bucket-summary
    job yields BOTH the dirty buckets and the per-side totals (distinct
    pks, summed over buckets), so the full-table wide join never runs —
    only dirty buckets are re-joined for the discrepancy fields.  Output
    row identical to :func:`table_metrics` (q53 pins it against the
    full-metrics oracle); an all-clean pair emits the row from the
    summary alone, with no second pass at all.
    """
    summ = _bucket_summaries(
        hive_df, sf_df, pk, exclude_cols, n_buckets, decimal_scale, ts_format
    )
    clean = F.col("_hn").eqNullSafe(F.col("_sn")) & F.col("_hs").eqNullSafe(
        F.col("_ss")
    )
    top = summ.agg(
        F.sum("_hd").alias("ht"),
        F.sum("_sd").alias("st"),
        F.collect_list(F.when(~clean, F.col("bucket"))).alias("dirty"),
    ).collect()[0]
    h_total = int(top.ht or 0)
    s_total = int(top.st or 0)
    dirty = list(top.dirty)

    if not dirty:
        spark = hive_df.sparkSession
        empty_arr = F.array().cast("array<string>")
        return spark.range(1).select(
            F.lit(table_name).alias("table_name"),
            F.lit(pk).alias("primary_column"),
            F.lit(h_total).cast("long").alias("total_record_count_hive"),
            F.lit(s_total).cast("long").alias("total_record_count_sf"),
            F.lit(0).cast("long").alias("row_count_only_in_hive"),
            empty_arr.alias("hive_only_pk_values"),
            F.lit(0).cast("long").alias("row_count_only_in_sf"),
            empty_arr.alias("sf_only_pk_values"),
            F.lit(0).cast("long").alias("row_count_data_discrepancy"),
            empty_arr.alias("data_discrepancy_pk_values"),
            F.current_timestamp().alias("row_created"),
        )

    def keep(df: DataFrame) -> DataFrame:
        b = F.pmod(F.xxhash64(F.col(pk).cast("string")), F.lit(n_buckets))
        return df.filter(b.isin(dirty))

    m = table_metrics(
        keep(hive_df),
        keep(sf_df),
        pk,
        table_name,
        exclude_cols,
        max_pk_values,
        decimal_scale,
        ts_format,
    )
    return m.withColumn(
        "total_record_count_hive", F.lit(h_total).cast("long")
    ).withColumn("total_record_count_sf", F.lit(s_total).cast("long"))


def refined_cell_diff(
    hive_df: DataFrame,
    sf_df: DataFrame,
    pk: str,
    exclude_cols: Sequence[str] = (),
    n_buckets: int = 4096,
    decimal_scale: int | None = 4,
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """:func:`cell_diff` through the checksum prefilter: same rows out,
    but only dirty pk-buckets are fingerprint-joined and unpivoted."""
    h, s = refine_pair(
        hive_df, sf_df, pk, exclude_cols, n_buckets, decimal_scale, ts_format
    )
    return cell_diff(h, s, pk, exclude_cols, decimal_scale, ts_format)


def diff_report(cell_diff_df: DataFrame) -> DataFrame:
    """Group-merge the cell diff per column into sorted deduped sets —
    ``(columnName, hive array, snowflake array, id array)``, the shape
    built by ``tools/data_matrix_tool.py:69-86``.
    """
    return (
        cell_diff_df.groupBy(F.col("column_name").alias("columnName"))
        .agg(
            F.sort_array(F.collect_set("hive_value")).alias("hive"),
            F.sort_array(F.collect_set("sf_value")).alias("snowflake"),
            F.sort_array(F.collect_set("pk_value")).alias("id"),
        )
    )


def table_metrics(
    hive_df: DataFrame,
    sf_df: DataFrame,
    pk: str,
    table_name: str,
    exclude_cols: Sequence[str] = (),
    max_pk_values: int | None = None,
    decimal_scale: int | None = 4,
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """One ``dw_data_metrics``-shaped row (``db-setup.sql:76-102``).

    ``max_pk_values`` caps the PK arrays (the metrics table in production
    holds 375k discrepant PKs in one array cell — at real scale you cap or
    sink the full sets to a side table; ``slice`` after ``sort_array``
    keeps the cap deterministic).

    ``decimal_scale``/``ts_format`` set the comparison's sensitivity
    floor exactly as in :func:`cell_diff`.
    """
    cols = _compared_columns(hive_df, sf_df, pk, exclude_cols)
    if not cols:
        raise ValueError(
            "no common non-excluded columns to diff — refusing to emit a "
            "vacuous all-clear metrics row"
        )

    # dedupe each side to one deterministic fingerprint per pk (min),
    # so ingestion-duplicated pks can't multiply counts through the join
    h = hive_df.select(
        F.col(pk).cast("string").alias("pk_value"),
        row_fingerprint(hive_df, cols, decimal_scale, ts_format).alias("_fp_h"),
    ).groupBy("pk_value").agg(F.min("_fp_h").alias("_fp_h"))
    s = sf_df.select(
        F.col(pk).cast("string").alias("pk_value"),
        row_fingerprint(sf_df, cols, decimal_scale, ts_format).alias("_fp_s"),
    ).groupBy("pk_value").agg(F.min("_fp_s").alias("_fp_s"))
    j = h.join(s, "pk_value", "full_outer")

    def _capped(col):
        arr = F.sort_array(F.collect_list(col))
        return F.slice(arr, 1, max_pk_values) if max_pk_values is not None else arr

    hive_only = F.col("_fp_s").isNull() & F.col("_fp_h").isNotNull()
    sf_only = F.col("_fp_h").isNull() & F.col("_fp_s").isNotNull()
    mismatch = (
        F.col("_fp_h").isNotNull()
        & F.col("_fp_s").isNotNull()
        & (F.col("_fp_h") != F.col("_fp_s"))
    )

    return j.agg(
        F.lit(table_name).alias("table_name"),
        F.lit(pk).alias("primary_column"),
        F.sum(F.col("_fp_h").isNotNull().cast("long")).alias("total_record_count_hive"),
        F.sum(F.col("_fp_s").isNotNull().cast("long")).alias("total_record_count_sf"),
        F.sum(hive_only.cast("long")).alias("row_count_only_in_hive"),
        _capped(F.when(hive_only, F.col("pk_value"))).alias("hive_only_pk_values"),
        F.sum(sf_only.cast("long")).alias("row_count_only_in_sf"),
        _capped(F.when(sf_only, F.col("pk_value"))).alias("sf_only_pk_values"),
        F.sum(mismatch.cast("long")).alias("row_count_data_discrepancy"),
        _capped(F.when(mismatch, F.col("pk_value"))).alias("data_discrepancy_pk_values"),
        F.current_timestamp().alias("row_created"),
    )


def exclude_columns_for(conf_df: DataFrame, table_name: str) -> list[str]:
    """``DW_SHADOW_RUN_CONF`` semantics (``db-setup.sql:29-49``): the
    exclude-list for a table is a comma-separated string column
    ``exclude_columns`` keyed by ``table_name``; missing table → no
    exclusions.  Matching is case/space-insensitive like the rest of the
    reference's table lookups."""
    rows = (
        conf_df.filter(
            F.upper(F.trim(F.col("table_name")))
            == str(table_name).strip().upper()
        )
        .select("exclude_columns")
        .collect()
    )
    if not rows or rows[0][0] is None:
        return []
    return [c.strip() for c in str(rows[0][0]).split(",") if c.strip()]


def pk_skew_report(
    df: DataFrame,
    pk: str,
    sample_fraction: float = 0.01,
    hot_ratio: float = 0.01,
    max_keys: int = 100,
    seed: int = 42,
) -> DataFrame:
    """Pre-flight probe for one diff side: pk values that dominate the
    table, estimated from a seeded sample — ``(pk_value, est_count,
    est_share)``, heaviest first, empty when the side is healthy.

    A non-empty report predicts two failure modes BEFORE the wide diff
    runs: (a) duplicated pks — the min-struct rollup collapses them
    deterministically, but ingestion-duplicated keys almost always mean
    an upstream fault worth surfacing, not silently canonicalizing; and
    (b) a skewed pk shuffle, where one reduce task materializes the hot
    key (AQE's skew-join split helps the join stage but not the rollup
    aggregation).  The probe is one narrow sampled job (pk + count),
    lazy, and configuration-sized (``max_keys`` rows) — cheap enough to
    run before every scheduled validation, same estimator as
    ``workload.detect_hot_keys``."""
    s = df.select(F.col(pk).cast("string").alias("pk_value")).sample(
        fraction=sample_fraction, seed=seed
    )
    counted = s.groupBy("pk_value").agg(F.count(F.lit(1)).alias("est_count"))
    total = s.count()
    if total == 0:
        return counted.withColumn(
            "est_share", F.lit(0.0)
        ).limit(0)
    return (
        counted.withColumn(
            "est_share", F.col("est_count").cast("double") / F.lit(float(total))
        )
        # never flag a sampled singleton — a pk must at least repeat in
        # the sample to be evidence of duplication/skew
        .filter(F.col("est_count") >= max(2.0, hot_ratio * total))
        .orderBy(F.desc("est_count"), F.asc("pk_value"))
        .limit(max_keys)
    )


@dataclass
class TableDiff:
    """Bundle of the three diff views for one table pair."""

    presence: DataFrame
    cells: DataFrame
    report: DataFrame
    metrics: DataFrame


def table_diff(
    hive_df: DataFrame,
    sf_df: DataFrame,
    pk: str,
    table_name: str = "table",
    exclude_cols: Sequence[str] = (),
    decimal_scale: int | None = 4,
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
) -> TableDiff:
    """The full parity validation the reference's ``/process`` route runs
    across three agents and N stored-proc RPCs (SURVEY.md §3.1), as one
    composable lazy lineage."""
    cells = cell_diff(hive_df, sf_df, pk, exclude_cols, decimal_scale, ts_format)
    return TableDiff(
        presence=presence_diff(hive_df, sf_df, pk),
        cells=cells,
        report=diff_report(cells),
        metrics=table_metrics(
            hive_df,
            sf_df,
            pk,
            table_name,
            exclude_cols,
            decimal_scale=decimal_scale,
            ts_format=ts_format,
        ),
    )
