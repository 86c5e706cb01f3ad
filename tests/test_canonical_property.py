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
