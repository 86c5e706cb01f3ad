"""Property-based pinning of the canonical string renderer (SURVEY §7.4
hard part #1): for random values of every diffable type, Spark's
canonical rendering must equal the DuckDB oracle rendering — otherwise
every oracle-checked diff query is built on sand."""

from __future__ import annotations

import datetime as dt

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from sparkdiff.functions.canonical import canonical_columns, oracle_canonical_sql

# decimal(18,4) range minus headroom: both engines must round, not
# overflow (Spark ANSI-off nulls on overflow, DuckDB errors — out of the
# renderer's contract)
_doubles = st.one_of(
    st.none(),
    st.floats(
        allow_nan=False,
        allow_infinity=False,
        min_value=-1e10,
        max_value=1e10,
        width=64,
    ),
)
_longs = st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62))
_strings = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
        max_size=40,
    ),
)
_bools = st.one_of(st.none(), st.booleans())
_timestamps = st.one_of(
    st.none(),
    st.datetimes(
        min_value=dt.datetime(1975, 1, 1),
        max_value=dt.datetime(2035, 12, 31),
    ),
)

_row = st.tuples(_doubles, _longs, _strings, _bools, _timestamps)

SCHEMA = T.StructType(
    [
        T.StructField("d", T.DoubleType()),
        T.StructField("l", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("t", T.TimestampType()),
    ]
)
DUCK_TYPES = {"d": "double", "l": "bigint", "s": "varchar", "b": "boolean", "t": "timestamp"}


@settings(max_examples=12, deadline=None)
@given(st.lists(_row, min_size=1, max_size=8))
def test_canonical_rendering_matches_duckdb(spark, rows):
    sdf = spark.createDataFrame(rows, SCHEMA)
    got = [tuple(r) for r in sdf.select(canonical_columns(sdf)).collect()]

    # explicit-schema Arrow table: pandas would coerce nullable int64 to
    # float64 and lose precision above 2^53
    import pyarrow as pa

    atable = pa.table(
        {
            "d": pa.array([r[0] for r in rows], pa.float64()),
            "l": pa.array([r[1] for r in rows], pa.int64()),
            "s": pa.array([r[2] for r in rows], pa.string()),
            "b": pa.array([r[3] for r in rows], pa.bool_()),
            "t": pa.array([r[4] for r in rows], pa.timestamp("us")),
        }
    )
    con = duckdb.connect()
    try:
        con.register("pdf", atable)
        exprs = ", ".join(
            f"{oracle_canonical_sql(c, DUCK_TYPES[c])} AS {c}" for c in DUCK_TYPES
        )
        expected = con.execute(f"SELECT {exprs} FROM pdf").fetchall()
    finally:
        con.close()
    assert sorted(got) == sorted(map(tuple, expected))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=10,
        unique=True,
    )
)
def test_md5_token_hash_matches_duckdb(spark, toks):
    """The 60-bit md5 token hash is the primitive every LSH oracle
    (MinHash bands, SimHash votes, passage/gram keys) joins on — the two
    engines must produce identical longs for arbitrary strings."""
    from sparkdiff.operators.dedup import token_hash

    df = spark.createDataFrame([(t,) for t in toks], "t string")
    got = {r.t: r.h for r in df.select("t", token_hash("t", "md5").alias("h")).collect()}
    con = duckdb.connect()
    for t in toks:
        (dh,) = con.execute(
            "SELECT CAST('0x' || substr(md5(?), 1, 15) AS BIGINT)", [t]
        ).fetchone()
        assert got[t] == dh, f"token hash diverged for {t!r}"


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=10, unique=True))
def test_unit_hash_variate_matches_duckdb(spark, keys):
    """The md5 unit variate drives every deterministic sampling oracle
    (q54/q58/q61/q73) — its [0,1) values must agree bit-for-bit."""
    from sparkdiff.operators.sampling import unit_hash

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r.k: r.u for r in df.select("k", unit_hash("k", "sEEd").alias("u")).collect()}
    con = duckdb.connect()
    for k in keys:
        (du,) = con.execute(
            "SELECT (CAST(('0x' || substr(md5(CAST(? AS VARCHAR) || 'sEEd'), 1, 15))"
            " AS BIGINT) % 1000000) / 1000000.0",
            [k],
        ).fetchone()
        assert got[k] == du, f"unit variate diverged for key {k}"


def test_content_checksum_null_positions_injective_and_oracle_exact(spark):
    """ADVICE r6 (medium): content_checksum must be injective across
    NULL positions — ('a', NULL, 'b') vs ('a', 'b', NULL) — and must
    agree bit-for-bit with oracle_content_checksum_sql on NULL-bearing
    rows (the old concat_ws rendering silently skipped NULL columns on
    Spark while the || oracle null-propagated and SUM dropped the row)."""
    from pyspark.sql import functions as F

    from sparkdiff.functions.canonical import (
        content_checksum,
        oracle_content_checksum_sql,
    )

    rows = [
        ("a", None, "b"),
        ("a", "b", None),
        (None, None, None),
        ("x", "y", "z"),
    ]
    df = spark.createDataFrame(rows, "c1 string, c2 string, c3 string")

    # injectivity across NULL positions: the two permuted-NULL rows must
    # produce different single-row digests
    per_row = [
        df.filter(F.col("c3").isNull() if i else F.col("c2").isNull())
        .agg(content_checksum("c1", "c2", "c3").alias("d"))
        .collect()[0]["d"]
        for i in (0, 1)
    ]
    assert per_row[0] != per_row[1], "NULL position must change the digest"

    (spark_sum,) = df.agg(content_checksum("c1", "c2", "c3").alias("d")).collect()[0]
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame(rows, columns=["c1", "c2", "c3"]))
    (duck_sum,) = con.execute(
        f"SELECT {oracle_content_checksum_sql('c1', 'c2', 'c3')} FROM t"
    ).fetchone()
    assert spark_sum == duck_sum, f"{spark_sum} != {duck_sum}"
