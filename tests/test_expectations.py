"""Hand-checkable pins for expectation_report: every check type, both
polarities, exact violation counts from one constructed frame."""

from __future__ import annotations

import pytest

from sparkdiff.operators.expectations import (
    ExpectationGateError,
    accepted_values,
    expectation_gate,
    expectation_report,
    in_range,
    matches_regex,
    not_null,
    unique,
)


def test_expectation_report_hand_checked(spark):
    rows = [
        (1, 10.0, "A", "ok"),
        (1, 55.0, "A", "ok"),      # dup id, out-of-range v
        (2, None, "B", "Bad!"),    # null v, unaccepted flag, regex fail
        (3, 20.0, "A", None),      # null s (regex/accepted pass NULLs)
    ]
    df = spark.createDataFrame(rows, "id int, v double, flag string, s string")
    rep = {
        r.check: r
        for r in expectation_report(
            df,
            [
                not_null("v"),
                in_range("v", 0.0, 50.0),
                accepted_values("flag", ["A"]),
                matches_regex("s", "^[a-z]+$"),
                unique(["id"]),
                unique(["id", "flag"]),
            ],
        ).collect()
    }
    assert all(r.n_rows == 4 for r in rep.values())
    assert rep["not_null(v)"].n_violations == 1
    assert rep["in_range(v,0.0,50.0)"].n_violations == 1  # NULL passes
    assert rep["accepted_values(flag)"].n_violations == 1
    assert rep["matches_regex(s)"].n_violations == 1  # NULL passes
    assert rep["unique(id)"].n_violations == 1
    assert rep["unique(id,flag)"].n_violations == 1
    assert rep["not_null(v)"].ok is False
    ok_only = expectation_report(df, [not_null("id")]).collect()[0]
    assert ok_only.ok is True and ok_only.n_violations == 0


def test_expectation_report_rejects_empty_suite(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        expectation_report(df, [])


def test_expectation_gate_aborts_before_any_curation_stage(spark, tmp_path):
    """Negative path for the fail-fast gate fronting the curation
    rehearsal (round-7 verdict #6): a poisoned corpus — NULLs in the
    required key, out-of-range quality — must abort at stage 0, leave
    the durable gate report naming every failed check, and produce NO
    downstream stage output."""
    poisoned = spark.createDataFrame(
        [
            (1, "fine document", 13),
            (None, "null key", 8),       # not_null(doc_id) violation
            (2, "negative length", -3),  # in_range(n_chars,...) violation
            (3, "dup key", 7),
            (3, "dup key again", 12),    # unique(doc_id) violation
        ],
        "doc_id: long, text: string, n_chars: long",
    )
    checks = [
        not_null("doc_id"),
        not_null("text"),
        in_range("n_chars", 1, 10_000_000),
        unique(["doc_id"]),
    ]
    gate_sink = tmp_path / "s0_gate"
    downstream = tmp_path / "s1_decontaminate"

    with pytest.raises(ExpectationGateError) as ei:
        expectation_gate(poisoned, checks, report_sink=str(gate_sink))
        # the first curation stage — must be unreachable
        poisoned.write.mode("overwrite").parquet(str(downstream))

    assert ei.value.failed == [
        "in_range(n_chars,1,10000000)",
        "not_null(doc_id)",
        "unique(doc_id)",
    ]
    assert not downstream.exists(), "curation ran past a failed gate"
    # the durable report survives the abort as evidence of WHY
    rep = {r.check: r for r in spark.read.parquet(str(gate_sink)).collect()}
    assert rep["not_null(doc_id)"].n_violations == 1
    assert rep["in_range(n_chars,1,10000000)"].n_violations == 1
    # surplus = count(*) - count(distinct): the dup AND the NULL key
    # (countDistinct skips NULLs) both read as surplus rows
    assert rep["unique(doc_id)"].n_violations == 2
    assert rep["not_null(text)"].ok is True

    # positive path: a clean corpus passes through and returns the rows
    clean = poisoned.filter("doc_id IS NOT NULL AND n_chars > 0").dropDuplicates(
        ["doc_id"]
    )
    rows = expectation_gate(clean, checks)
    assert sorted(r.check for r in rows) == sorted(n for n, _t, _f in checks)
    assert all(r.ok for r in rows)
