"""Perturb-and-detect tests for the diff operator (the reference's own
test idiom, ``db-setup.sql:53-71``): inject known edits, expect exactly
those back."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkdiff import testkit
from sparkdiff.operators.diff import (
    cell_diff,
    diff_report,
    presence_diff,
    table_metrics,
)
from sparkdiff.session import load_table

from .conftest import SF_DIR_SMALL


def _expected_keys(spark, mod):
    cust = load_table(spark, SF_DIR_SMALL, "customer")
    return {
        r.c_custkey
        for r in cust.filter(F.col("c_custkey") % mod == 0).collect()
    }


def test_presence_diff_exact(spark):
    hive, sf = testkit.hive_sf_pair(spark, SF_DIR_SMALL)
    rows = presence_diff(hive, sf, "c_custkey").collect()
    hive_only = {int(r.pk_value) for r in rows if r.side == "hive_only"}
    sf_only = {int(r.pk_value) for r in rows if r.side == "sf_only"}
    assert hive_only == _expected_keys(spark, 101)
    assert sf_only == {k + 10_000_000 for k in _expected_keys(spark, 103)}


def test_cell_diff_exact_and_exclusion(spark):
    hive, sf = testkit.hive_sf_pair(spark, SF_DIR_SMALL)
    cells = cell_diff(
        hive, sf, "c_custkey", exclude_cols=testkit.EXCLUDE_COLS
    ).collect()
    by_col = {}
    for r in cells:
        by_col.setdefault(r.column_name, set()).add(int(r.pk_value))

    # mutations land on surviving rows only (deleted %101 rows can't diff)
    surviving = lambda mod: {
        k for k in _expected_keys(spark, mod) if k % 101 != 0
    }
    assert by_col.get("c_name", set()) == surviving(97)
    # acctbal mutation is a no-op when the value is already integral
    assert by_col.get("c_acctbal", set()) <= surviving(89)
    assert len(by_col.get("c_acctbal", set())) > 0
    # excluded column must be suppressed even though it was mutated
    assert "c_mktsegment" not in by_col
    # every reported diff really differs
    for r in cells:
        assert r.hive_value != r.sf_value


def test_diff_report_shape(spark):
    hive, sf = testkit.hive_sf_pair(spark, SF_DIR_SMALL)
    rep = diff_report(
        cell_diff(hive, sf, "c_custkey", exclude_cols=testkit.EXCLUDE_COLS)
    ).collect()
    cols = {r.columnName for r in rep}
    assert "c_name" in cols
    for r in rep:
        assert r.hive == sorted(set(r.hive))
        assert r.id == sorted(set(r.id))


def test_load_table_repairs_foreign_sessions(spark):
    """The driver hands queries ITS OWN session (no UTC pin, no
    nanosAsLong): load_table must repair it or events scans throw and
    timestamp canonicals drift."""
    other = spark.newSession()
    other.conf.set("spark.sql.session.timeZone", "America/New_York")
    other.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    df = load_table(other, SF_DIR_SMALL, "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    assert other.conf.get("spark.sql.session.timeZone") == "UTC"
    assert df.count() > 0


def test_load_table_events_both_ts_encodings(spark, tmp_path):
    """The driver has regenerated events.parquet under two physical
    encodings across rounds — TIMESTAMP(NANOS) (read as long under
    nanosAsLong) and TIMESTAMP(MICROS). load_table must yield the same
    UTC timestamp column for both, branching on the actual read schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    micros = [1_700_000_000_000_001, 1_700_000_123_456_789]
    base = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["click", "view"], pa.string()),
        "value": pa.array([1.5, 2.5], pa.float64()),
        "props": pa.array(['{"a":1}', '{"b":2}'], pa.string()),
    }
    for enc, unit, vals in (
        ("nanos", "ns", [m * 1000 for m in micros]),
        ("micros", "us", micros),
    ):
        d = tmp_path / enc
        d.mkdir()
        tbl = pa.table(
            {
                "event_id": base["event_id"],
                "ts": pa.array(vals, pa.timestamp(unit)),
                "user_id": base["user_id"],
                "event_type": base["event_type"],
                "value": base["value"],
                "props": base["props"],
            }
        )
        pq.write_table(tbl, str(d / "events.parquet"))

    results = {}
    for enc in ("nanos", "micros"):
        df = load_table(spark, str(tmp_path / enc), "events")
        assert df.schema["ts"].dataType.simpleString() == "timestamp"
        rows = df.select(
            "event_id", F.unix_micros("ts").alias("us")
        ).collect()
        results[enc] = {r.event_id: r.us for r in rows}
    assert results["nanos"] == results["micros"] == {
        1: micros[0],
        2: micros[1],
    }


def test_exclude_columns_conf_table(spark):
    """DW_SHADOW_RUN_CONF semantics: comma-split, case/space-insensitive
    table match, missing table -> no exclusions."""
    from sparkdiff.operators.diff import exclude_columns_for

    conf = spark.createDataFrame(
        [("CUSTOMER", "ROWMODIFIED, BATCH"), ("ORDERS", None)],
        "table_name string, exclude_columns string",
    )
    assert exclude_columns_for(conf, " customer ") == ["ROWMODIFIED", "BATCH"]
    assert exclude_columns_for(conf, "orders") == []
    assert exclude_columns_for(conf, "missing") == []
    # end-to-end: conf-driven exclusion suppresses the mutated column
    hive, sf = testkit.hive_sf_pair(spark, SF_DIR_SMALL)
    conf2 = spark.createDataFrame(
        [("CUSTOMER", "c_mktsegment")], "table_name string, exclude_columns string"
    )
    cells = cell_diff(
        hive, sf, "c_custkey", exclude_cols=exclude_columns_for(conf2, "CUSTOMER")
    )
    assert "c_mktsegment" not in {r.column_name for r in cells.collect()}


def test_metrics_counts_consistent(spark):
    hive, sf = testkit.hive_sf_pair(spark, SF_DIR_SMALL)
    m = table_metrics(
        hive, sf, "c_custkey", "customer", exclude_cols=testkit.EXCLUDE_COLS
    ).collect()[0]
    assert m.total_record_count_hive == hive.count()
    assert m.total_record_count_sf == sf.count()
    assert m.row_count_only_in_hive == len(_expected_keys(spark, 101))
    assert m.row_count_only_in_sf == len(_expected_keys(spark, 103))
    assert m.row_count_data_discrepancy == len(m.data_discrepancy_pk_values)
    assert m.hive_only_pk_values == sorted(m.hive_only_pk_values)


def test_diff_case_insensitive_sf_columns(spark):
    """Snowflake-side frames habitually carry upper-cased identifiers; the
    diff must resolve compared columns case-insensitively on both sides
    and report identical results to the same-cased pair."""
    hive, sf = testkit.hive_sf_pair(spark, SF_DIR_SMALL)
    sf_upper = sf.select([F.col(c).alias(c.upper()) for c in sf.columns])

    base = cell_diff(hive, sf, "c_custkey", exclude_cols=testkit.EXCLUDE_COLS)
    upper = cell_diff(
        hive, sf_upper, "c_custkey", exclude_cols=testkit.EXCLUDE_COLS
    )
    key = lambda df: sorted(
        (r.pk_value, r.column_name, r.hive_value, r.sf_value)
        for r in df.collect()
    )
    assert key(upper) == key(base)

    m_base = table_metrics(
        hive, sf, "c_custkey", "customer", exclude_cols=testkit.EXCLUDE_COLS
    ).drop("row_created").collect()
    m_upper = table_metrics(
        hive, sf_upper, "c_custkey", "customer", exclude_cols=testkit.EXCLUDE_COLS
    ).drop("row_created").collect()
    assert m_upper == m_base


def test_diff_sensitivity_floor_is_tunable(spark):
    """Default decimal(18,4) canonicalization treats sub-1e-4 drift as
    equal (the documented floor); decimal_scale=None compares the
    engine-native full-precision rendering and flags it — the
    reference's own cited discrepancy class (717.2786 vs
    717.278634433)."""
    h = spark.createDataFrame(
        [(1, 717.2786), (2, 5.0)], "id long, v double"
    )
    s = spark.createDataFrame(
        [(1, 717.278634433), (2, 5.0)], "id long, v double"
    )
    assert cell_diff(h, s, "id").count() == 0  # below the default floor
    tight = cell_diff(h, s, "id", decimal_scale=None).collect()
    assert [(r.pk_value, r.column_name) for r in tight] == [("1", "v")]
    m = table_metrics(h, s, "id", "t", decimal_scale=None).collect()[0]
    assert m.row_count_data_discrepancy == 1

    # sub-second timestamp drift: invisible at second precision,
    # flagged with a fractional ts_format
    ht = spark.sql("SELECT 1 AS id, TIMESTAMP '2024-01-01 00:00:00.25' AS ts")
    st = spark.sql("SELECT 1 AS id, TIMESTAMP '2024-01-01 00:00:00.75' AS ts")
    assert cell_diff(ht, st, "id").count() == 0
    assert (
        cell_diff(ht, st, "id", ts_format="yyyy-MM-dd HH:mm:ss.SSSSSS").count()
        == 1
    )


def test_refined_cell_diff_equals_full(spark):
    """Checksum refinement is lossless: same rows as the full cell diff,
    and the prefilter actually prunes (dirty buckets << n_buckets)."""
    from sparkdiff.operators.diff import dirty_pk_buckets, refined_cell_diff

    hive, sf = testkit.hive_sf_pair(spark, SF_DIR_SMALL)
    full = sorted(
        map(tuple, cell_diff(hive, sf, "c_custkey", testkit.EXCLUDE_COLS).collect())
    )
    refined = sorted(
        map(
            tuple,
            refined_cell_diff(hive, sf, "c_custkey", testkit.EXCLUDE_COLS).collect(),
        )
    )
    assert refined == full and full
    n_dirty = dirty_pk_buckets(
        hive, sf, "c_custkey", testkit.EXCLUDE_COLS
    ).count()
    assert 0 < n_dirty < 4096


def test_refine_pair_covers_presence_rows(spark):
    """One-sided pks land in dirty buckets too, so presence_diff over the
    refined pair equals the full presence diff."""
    from sparkdiff.operators.diff import refine_pair

    hive, sf = testkit.hive_sf_pair(spark, SF_DIR_SMALL)
    full = sorted(map(tuple, presence_diff(hive, sf, "c_custkey").collect()))
    h, s = refine_pair(hive, sf, "c_custkey", testkit.EXCLUDE_COLS)
    got = sorted(map(tuple, presence_diff(h, s, "c_custkey").collect()))
    assert got == full and full


def test_refine_pair_identical_sides_short_circuit(spark):
    from sparkdiff.operators.diff import refine_pair

    cust = load_table(spark, SF_DIR_SMALL, "customer")
    h, s = refine_pair(cust, cust, "c_custkey")
    assert h.count() == 0 and s.count() == 0


def test_dirty_buckets_catch_even_count_duplicate_drift(spark):
    """An even number of identical dup-pk rows per side would cancel an
    xor checksum; the decimal-sum checksum must still flag the bucket."""
    from sparkdiff.operators.diff import dirty_pk_buckets

    h = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "z")], "pk int, v string"
    )
    s = spark.createDataFrame(
        [(1, "b"), (1, "b"), (2, "z")], "pk int, v string"
    )
    assert dirty_pk_buckets(h, s, "pk").count() == 1


def test_refined_table_metrics_equals_full(spark):
    from sparkdiff.operators.diff import refined_table_metrics

    hive, sf = testkit.hive_sf_pair(spark, SF_DIR_SMALL)
    cols = [
        "table_name", "primary_column", "total_record_count_hive",
        "total_record_count_sf", "row_count_only_in_hive",
        "hive_only_pk_values", "row_count_only_in_sf",
        "sf_only_pk_values", "row_count_data_discrepancy",
        "data_discrepancy_pk_values",
    ]
    full = table_metrics(
        hive, sf, "c_custkey", "customer", testkit.EXCLUDE_COLS
    ).select(*cols).collect()[0]
    fast = refined_table_metrics(
        hive, sf, "c_custkey", "customer", testkit.EXCLUDE_COLS
    ).select(*cols).collect()[0]
    assert tuple(full) == tuple(fast)


def test_refined_table_metrics_counts_distinct_pks_with_dups(spark):
    """Totals are distinct-pk counts (table_metrics semantics), not raw
    row counts, even when a side carries duplicated pks."""
    from sparkdiff.operators.diff import refined_table_metrics

    h = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "pk int, v string"
    )
    s = spark.createDataFrame([(1, "a"), (3, "c")], "pk int, v string")
    full = table_metrics(h, s, "pk", "t").collect()[0]
    fast = refined_table_metrics(h, s, "pk", "t").collect()[0]
    assert (fast.total_record_count_hive, fast.total_record_count_sf) == (2, 2)
    assert tuple(fast)[:-1] == tuple(full)[:-1]  # all but row_created


def test_refined_table_metrics_clean_pair_skips_rejoin(spark):
    from sparkdiff.operators.diff import refined_table_metrics

    cust = load_table(spark, SF_DIR_SMALL, "customer")
    row = refined_table_metrics(cust, cust, "c_custkey", "customer").collect()[0]
    n = cust.count()
    assert row.total_record_count_hive == n == row.total_record_count_sf
    assert row.row_count_only_in_hive == 0 == row.row_count_data_discrepancy
    assert row.hive_only_pk_values == [] == row.data_discrepancy_pk_values


def test_dirty_vs_store_matches_pairwise_answer(spark, tmp_path):
    """Comparing the changed side against a persisted summary must find
    exactly the buckets the two-sided scan finds."""
    from sparkdiff.operators.diff import (
        _compared_columns,
        dirty_pk_buckets,
        dirty_vs_store,
        write_bucket_store,
    )

    hive, sf = testkit.hive_sf_pair(spark, SF_DIR_SMALL)
    cols = _compared_columns(hive, sf, "c_custkey", testkit.EXCLUDE_COLS)
    store = str(tmp_path / "hive_store")
    write_bucket_store(hive, "c_custkey", cols, store)
    got = {r.bucket for r in dirty_vs_store(sf, store, "c_custkey", cols).collect()}
    want = {
        r.bucket
        for r in dirty_pk_buckets(
            hive, sf, "c_custkey", testkit.EXCLUDE_COLS
        ).collect()
    }
    assert got == want and want


def test_cdc_checksums_retract_to_materialized_table(spark):
    """Signed bucket sums over a CDC log equal the batch summary of the
    table the log materializes to (delete(old)+insert(new) updates)."""
    from sparkdiff.operators.diff import bucket_summary
    from sparkdiff.streaming.validate import streaming_bucket_checksums_cdc

    base = [(i, f"v{i}", "insert") for i in range(1, 101)]
    deletes = [(i, f"v{i}", "delete") for i in range(10, 101, 10)]
    inserts = [(i, f"w{i}", "insert") for i in range(10, 101, 10)]
    log = spark.createDataFrame(
        base + deletes + inserts, "pk int, v string, op string"
    )
    final = spark.createDataFrame(
        [
            (i, f"w{i}" if i % 10 == 0 else f"v{i}")
            for i in range(1, 101)
        ],
        "pk int, v string",
    )
    got = {
        r.bucket: (r.n, r.checksum)
        for r in streaming_bucket_checksums_cdc(
            log, "pk", ["v"], n_buckets=16
        ).collect()
    }
    want = {
        r.bucket: (r.n, r.checksum)
        for r in bucket_summary(
            final, "pk", ["v"], n_buckets=16, distinct_pks=False
        ).collect()
    }
    assert got == want and sum(n for n, _ in got.values()) == 100
