"""Independent numpy references for the quantile-family queries
(q105 RFM, q109 equi-depth histogram): random synthetic tables drive
the real registered queries; cuts and scores are recomputed with
numpy.percentile (linear interpolation — the same p·(n−1) positional
formula as `operators/quantiles._dist_quantiles`).

The DuckDB oracles already pin bit-equality on the driver's testdata;
these tests check the ALGORITHM against an implementation it shares
nothing with, on data with duplicates, skew, and single-purchase users.
Float cut comparisons use isclose (numpy's `lo + frac·(hi−lo)` and the
engine's `cofrac·lo + frac·hi` can differ in the last bit); integer
outputs (bins, counts, scores) must match exactly — the seeds are
fixed, so a passing comparison is deterministic."""

from __future__ import annotations

import datetime as dt
import math
import random

import numpy as np
import pandas as pd
import pytest

from sparkdiff.queries import QUERIES

SEEDS = [3, 41, 77]


def _write(tmp_path, name: str, pdf: pd.DataFrame) -> str:
    d = tmp_path / "sfq"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(str(d / f"{name}.parquet"), index=False)
    return str(d)


@pytest.mark.parametrize("seed", SEEDS)
def test_equidepth_histogram_matches_numpy(spark, tmp_path, seed):
    rng = random.Random(seed)
    # skewed values with heavy duplication
    vals = [round(rng.lognormvariate(8, 1), 2) for _ in range(2000)]
    vals += [vals[i] for i in range(0, 200)]  # duplicates
    pdf = pd.DataFrame(
        {
            "l_orderkey": range(len(vals)),
            "l_extendedprice": vals,
        }
    )
    sf_dir = _write(tmp_path, "lineitem", pdf)
    got = {
        r["bin"]: (r["n_rows"], r["min_cents"], r["max_cents"])
        for r in QUERIES["q109_equidepth_histogram"](spark, sf_dir)
        .toPandas()
        .to_dict("records")
    }

    arr = np.array(vals, dtype=np.float64)
    cuts = [
        np.percentile(arr, p, method="linear") for p in range(10, 100, 10)
    ]
    want = {}
    for v in vals:
        b = 1 + sum(1 for c in cuts if v > c)
        n, lo, hi = want.get(b, (0, None, None))
        cents = math.floor(v * 100)
        want[b] = (
            n + 1,
            cents if lo is None else min(lo, cents),
            cents if hi is None else max(hi, cents),
        )
    assert set(got) == set(want)
    for b in want:
        assert got[b] == want[b], f"bin {b}: {got[b]} != {want[b]}"
    # equi-depth sanity: no bin holds more than 2x the ideal depth
    n = len(vals)
    assert max(c for c, _, _ in got.values()) <= 2 * (n // 10 + 1)


@pytest.mark.parametrize("seed", SEEDS)
def test_rfm_scores_match_numpy(spark, tmp_path, seed):
    rng = random.Random(seed)
    t0 = dt.datetime(2024, 5, 1)
    rows = []
    for i in range(600):
        uid = rng.randint(0, 49)
        rows.append(
            {
                "event_id": i,
                "ts": t0 + dt.timedelta(minutes=rng.randint(0, 60 * 24 * 60)),
                "user_id": uid * 5,  # q105 samples user_id % 5 == 0
                "event_type": rng.choice(["purchase", "view"]),
                "value": round(rng.uniform(0, 50), 3),
                "props": "{}",
            }
        )
    # a single-purchase user (quantile edge: n observations per metric)
    rows.append(
        {
            "event_id": 10_000,
            "ts": t0,
            "user_id": 997 * 5,
            "event_type": "purchase",
            "value": 1.0,
            "props": "{}",
        }
    )
    pdf = pd.DataFrame(rows)
    sf_dir = _write(tmp_path, "events", pdf)
    res = QUERIES["q105_rfm_segments"](spark, sf_dir).toPandas()

    sel = pdf[pdf.event_type == "purchase"].copy()
    sel["d"] = sel["ts"].dt.normalize()
    d_max = sel["d"].max()
    rfm = sel.groupby("user_id").apply(
        lambda g: pd.Series(
            {
                "recency_d": int((d_max - g["d"].max()).days),
                "freq": len(g),
                "monetary_s": int(
                    sum(math.floor(v * 1024) for v in g["value"])
                ),
            }
        ),
        include_groups=False,
    )
    cuts = {
        m: [np.percentile(rfm[m].to_numpy(dtype=np.float64), p)
            for p in (20, 40, 60, 80)]
        for m in ("recency_d", "freq", "monetary_s")
    }

    def up(v, c):
        return 1 + sum(1 for x in c if v > x)

    def down(v, c):
        return 1 + sum(1 for x in c if v <= x)

    for r in res.to_dict("records"):
        ref = rfm.loc[r["user_id"]]
        assert r["recency_d"] == ref["recency_d"]
        assert r["freq"] == ref["freq"]
        assert r["monetary_s"] == ref["monetary_s"]
        assert r["r_score"] == down(ref["recency_d"], cuts["recency_d"])
        assert r["f_score"] == up(ref["freq"], cuts["freq"])
        assert r["m_score"] == up(ref["monetary_s"], cuts["monetary_s"])
        assert (
            r["segment"]
            == f"R{r['r_score']}F{r['f_score']}M{r['m_score']}"
        )
    assert len(res) == len(rfm)
