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
