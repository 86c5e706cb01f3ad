"""layout.py: Morton key correctness vs a bit-twiddling reference,
scale16 exactness, and skipping_report's file accounting + the actual
locality claim (z-order prunes BOTH dimensions, linear only one)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkdiff.operators.layout import (
    scale16,
    skipping_report,
    zorder_key2,
)


def _morton_ref(x: int, y: int) -> int:
    z = 0
    for b in range(16):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key2_matches_reference(spark):
    pts = [
        (0, 0), (1, 0), (0, 1), (1, 1), (65535, 65535),
        (65535, 0), (0, 65535), (12345, 54321), (255, 256),
        (32768, 1), (43690, 21845),
    ]
    df = spark.createDataFrame(
        [(x, y) for x, y in pts], "x long, y long"
    ).select("x", "y", zorder_key2(F.col("x"), F.col("y")).alias("z"))
    for r in df.collect():
        assert r.z == _morton_ref(r.x, r.y), (r.x, r.y)


def test_zorder_key2_masks_high_bits(spark):
    # bits above 15 must not leak into the key
    df = spark.createDataFrame(
        [(65536 + 3, 7)], "x long, y long"
    ).select(zorder_key2(F.col("x"), F.col("y")).alias("z"))
    assert df.collect()[0].z == _morton_ref(3, 7)


def test_scale16_exact_and_bounded(spark):
    df = spark.createDataFrame(
        [(v,) for v in (-50, 0, 17, 949, 950)], "v long"
    )
    rng = df.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    out = df.crossJoin(F.broadcast(rng)).select(
        "v", scale16(F.col("v"), F.col("lo"), F.col("hi")).alias("s")
    )
    got = {r.v: r.s for r in out.collect()}
    for v in got:
        assert got[v] == (v + 50) * 65535 // 1000
    assert got[-50] == 0 and got[950] == 65535


def test_scale16_degenerate_span(spark):
    df = spark.createDataFrame([(7,), (7,)], "v long")
    rng = df.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    out = df.crossJoin(F.broadcast(rng)).select(
        scale16(F.col("v"), F.col("lo"), F.col("hi")).alias("s")
    )
    assert [r.s for r in out.collect()] == [0, 0]


def test_skipping_report_rejects_bad_file_size(spark):
    df = spark.range(4).select(F.col("id").alias("a"))
    with pytest.raises(ValueError):
        skipping_report(
            df, {"l": ["a"]}, ["a"], {"p": ("a", 0, 1)}, rows_per_file=0
        )


def test_skipping_report_counts(spark):
    # 100 rows on a 10x10 grid; 10-row files.  Sorting by x makes the
    # x-predicate prune to 1 file; z-order prunes both predicates to
    # <= 4 of 10 files (one quadrant + curve spill).
    rows = [(i % 10, i // 10, i) for i in range(100)]
    df = spark.createDataFrame(rows, "x long, y long, id long").select(
        "x", "y", "id",
        zorder_key2(
            scale16(F.col("x"), F.lit(0), F.lit(9)),
            scale16(F.col("y"), F.lit(0), F.lit(9)),
        ).alias("z"),
    )
    rep = skipping_report(
        df,
        layouts={"linear_x": ["x", "id"], "zorder": ["z", "id"]},
        stat_cols=["x", "y"],
        predicates={"px": ("x", 3, 3), "py": ("y", 7, 7)},
        rows_per_file=10,
    )
    got = {
        (r.layout, r.predicate): (r.n_files, r.files_hit, r.rows_in_hit_files)
        for r in rep.collect()
    }
    assert len(got) == 4
    for k, (n_files, hit, rows_hit) in got.items():
        assert n_files == 10
        assert 1 <= hit <= n_files
        assert rows_hit == hit * 10
    # the locality claim itself:
    assert got[("linear_x", "px")][1] == 1        # perfect on sort col
    assert got[("linear_x", "py")][1] == 10       # useless off sort col
    # z-order prunes BOTH dimensions (a 1-in-10 band never needs the
    # full table), at the cost of the perfect single-column prune
    assert got[("zorder", "px")][1] < 10
    assert got[("zorder", "py")][1] < 10
    assert got[("zorder", "px")][1] + got[("zorder", "py")][1] < 20


def test_skipping_report_conjunction_predicate(spark):
    """A multi-clause predicate is the CONJUNCTION: a file is hit only
    when every clause's range overlaps its stats — so the conjunction
    never hits more files than its weakest clause, and a brute-force
    per-file check agrees exactly."""
    rows = [(i % 10, i // 10, i) for i in range(100)]
    df = spark.createDataFrame(rows, "x long, y long, id long").select(
        "x", "y", "id",
        zorder_key2(
            scale16(F.col("x"), F.lit(0), F.lit(9)),
            scale16(F.col("y"), F.lit(0), F.lit(9)),
        ).alias("z"),
    )
    rep = skipping_report(
        df,
        layouts={"zorder": ["z", "id"]},
        stat_cols=["x", "y"],
        predicates={
            "px": ("x", 3, 3),
            "py": ("y", 7, 7),
            "pboth": [("x", 3, 3), ("y", 7, 7)],
        },
        rows_per_file=10,
    )
    got = {r.predicate: r.files_hit for r in rep.collect()}
    assert got["pboth"] <= min(got["px"], got["py"])

    # brute-force replay: sort by (z, id), chunk by 10, AND the overlaps
    def _morton(x, y):
        sx = (x * 65535) // 9
        sy = (y * 65535) // 9
        def spread(v):
            v &= 0xFFFF
            for sh, m in ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                          (2, 0x33333333), (1, 0x55555555)):
                v = (v | (v << sh)) & m
            return v
        return spread(sx) | (spread(sy) << 1)
    keyed = sorted(rows, key=lambda t: (_morton(t[0], t[1]), t[2]))
    hits = 0
    for f in range(0, 100, 10):
        chunk = keyed[f : f + 10]
        xs = [c[0] for c in chunk]; ys = [c[1] for c in chunk]
        if min(xs) <= 3 <= max(xs) and min(ys) <= 7 <= max(ys):
            hits += 1
    assert got["pboth"] == hits
