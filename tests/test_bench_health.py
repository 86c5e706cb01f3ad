"""The bench artifact must self-qualify (round-6 verdict #1): host
health captured around the run, and >1.5x movers re-timed in isolation.
These tests pin the pure helpers; the wiring is exercised by every real
bench run (BENCH_DETAIL_r07+ carries host_health + retimes fields)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_jiffies, _host_health, _prev_round_medians  # noqa: E402


def test_cpu_jiffies_reads_proc_stat():
    j = _cpu_jiffies()
    assert j is not None, "/proc/stat must be readable on linux"
    assert set(j) == {
        "user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal",
    }
    assert all(v >= 0 for v in j.values())


def test_host_health_delta_percentages():
    before = {"user": 100, "nice": 0, "system": 50, "idle": 800,
              "iowait": 20, "irq": 0, "softirq": 0, "steal": 30}
    after = {"user": 200, "nice": 0, "system": 100, "idle": 1500,
             "iowait": 70, "irq": 0, "softirq": 0, "steal": 130}
    h = _host_health(before, after, 12.34)
    assert h["available"] is True
    # deltas: total=1000, steal=100, iowait=50, idle=700
    assert h["steal_pct"] == 10.0
    assert h["iowait_pct"] == 5.0
    assert h["busy_pct"] == 25.0
    assert h["wall_sec"] == 12.3


def test_host_health_degrades_gracefully_without_proc():
    h = _host_health(None, None, 1.0)
    assert h == {"available": False, "wall_sec": 1.0}


def test_prev_round_medians_picks_latest_before_current(tmp_path):
    for rnd, med in ((5, 1.0), (6, 2.0)):
        with open(tmp_path / f"BENCH_DETAIL_r{rnd:02d}.json", "w") as fh:
            json.dump(
                {"queries_detail": {"q01": {"median": med},
                                    "q02": {"median": None}}}, fh,
            )
    prev_round, meds = _prev_round_medians(str(tmp_path), 7)
    assert prev_round == 6
    assert meds == {"q01": 2.0}  # None medians are dropped
    # current round's own archive must not be its comparison base
    prev_round, meds = _prev_round_medians(str(tmp_path), 6)
    assert prev_round == 5 and meds == {"q01": 1.0}
    # no earlier archive -> empty base, retime pass becomes a no-op
    assert _prev_round_medians(str(tmp_path), 5) == (None, {})


def test_bench_retime_wiring_end_to_end(tmp_path):
    """The full self-qualification loop in a sandboxed artifact dir:
    a fabricated previous-round archive with tiny medians forces every
    measured query to read as a >1.5x mover, so the end-of-run re-time
    pass must fire and brand each with a verdict; host_health must be
    present; the per-round archive must NOT be written by a partial
    (SPARK_GRAFT_BENCH_ONLY) run."""
    import subprocess

    prev = {
        "queries_detail": {
            "q01_pricing_summary": {"median": 0.0001},
            "q46_lineitem_diff": {"median": 0.0001},
        }
    }
    with open(tmp_path / "BENCH_DETAIL_r06.json", "w") as fh:
        json.dump(prev, fh)
    env = dict(
        os.environ,
        SPARKDIFF_BENCH_DIR=str(tmp_path),
        SPARKDIFF_BENCH_ROUND="7",
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_N="1",
        SPARK_GRAFT_BENCH_ONLY="q01_pricing_summary,q46_lineitem_diff",
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    compact = json.loads(proc.stdout.strip().splitlines()[-1])
    assert compact["n_retimed"] == 2
    assert compact["steal_pct"] is not None
    with open(tmp_path / "BENCH_DETAIL.json") as fh:
        detail = json.load(fh)
    assert detail["host_health"]["available"] is True
    assert set(detail["retimes"]) == {
        "q01_pricing_summary", "q46_lineitem_diff",
    }
    for r in detail["retimes"].values():
        assert r["prev_round"] == 6
        assert r["verdict"] == "confirmed"  # vs a fabricated 0.1ms median
        assert r["isolated_median"] > 0
    # partial runs must not write the round archive
    assert not (tmp_path / "BENCH_DETAIL_r07.json").exists()
