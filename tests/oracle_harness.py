"""Local emulation of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side by side and compares
row count, sorted column names, and the order-insensitive multiset of
values.  Both sides are fetched THROUGH PANDAS (``toPandas()`` /
``fetchdf()``) — the same path the driver uses — and values are
canonicalized type-sensitively, so dtype coercions that a Python-native
``fetchall()`` would mask (e.g. DuckDB HUGEINT -> float64, turning
``6`` into ``6.0``) fail locally exactly as they fail at the driver.
Floats must be bit-identical, which the queries guarantee by
exact-arithmetic design.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

from sparkdiff.session import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon(v):
    """Type-tagged canonical rendering — int 6 and float 6.0 must differ,
    mirroring the driver's value-hash over the pandas fetch."""
    if isinstance(v, np.generic):
        v = v.item()
    if v is None or v is pd.NaT:
        return ("null", "")
    if isinstance(v, float):
        if math.isnan(v):
            return ("null", "")
        return ("float", repr(v))
    if isinstance(v, bool):
        return ("bool", str(v))
    if isinstance(v, int):
        return ("int", str(v))
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("list", tuple(_canon(x) for x in v))
    if isinstance(v, bytes):
        return ("bytes", v.hex())
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        # DuckDB's pandas fetch renders DATE columns as midnight
        # datetime64[ns]; Spark's toPandas keeps datetime.date.  The
        # driver's hash treats those as equal, so collapse midnight,
        # tz-naive timestamps to their date.
        t = pd.Timestamp(v)
        if t.tz is None and t == t.normalize():
            return ("date", t.date().isoformat())
        return ("ts", t.isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    return (type(v).__name__, str(v))


def _keyed(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [
        tuple(_canon(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(out)


@dataclass
class CompareResult:
    name: str
    ok: bool
    problems: list[str] = field(default_factory=list)


def compare(name: str, spark_df, oracle_sql: str, sf_dir: str) -> CompareResult:
    s_pdf = spark_df.toPandas()
    d_pdf = run_oracle(oracle_sql, sf_dir)

    problems = []
    if sorted(s_pdf.columns) != sorted(d_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(s_pdf.columns)} "
            f"duckdb={sorted(d_pdf.columns)}"
        )
    if len(s_pdf) != len(d_pdf):
        problems.append(
            f"row count differs: spark={len(s_pdf)} duckdb={len(d_pdf)}"
        )
    if not problems:
        ks, kd = _keyed(s_pdf), _keyed(d_pdf)
        if ks != kd:
            diffs = [
                f"  spark={a!r}\n  duck ={b!r}"
                for a, b in zip(ks, kd)
                if a != b
            ][:5]
            problems.append("value mismatch (first 5):\n" + "\n".join(diffs))
    return CompareResult(name, not problems, problems)
