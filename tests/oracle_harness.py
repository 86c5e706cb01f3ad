"""Local emulation of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side by side and compares
row count, sorted column names, and the order-insensitive multiset of
values (columns sorted by name, exact equality — floats must be
bit-identical, which the queries guarantee by exact-arithmetic design).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb

from sparkdiff.session import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _keyed(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=lambda t: repr(t)
    )


@dataclass
class CompareResult:
    name: str
    ok: bool
    problems: list[str] = field(default_factory=list)


def compare(name: str, spark_df, oracle_sql: str, sf_dir: str) -> CompareResult:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = run_oracle(oracle_sql, sf_dir)

    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    if not problems:
        ks, kd = _keyed(s_cols, s_rows), _keyed(d_cols, d_rows)
        if ks != kd:
            diffs = [
                f"  spark={a!r}\n  duck ={b!r}"
                for a, b in zip(ks, kd)
                if a != b
            ][:5]
            problems.append("value mismatch (first 5):\n" + "\n".join(diffs))
    return CompareResult(name, not problems, problems)
