"""Hand-checkable pins for expectation_report: every check type, both
polarities, exact violation counts from one constructed frame."""

from __future__ import annotations

import pytest

from sparkdiff.operators.expectations import (
    accepted_values,
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
