"""One-stop data-quality / profiling report: the audits a warehouse
runs before trusting (or training on) a new table drop, composed in
dependency order:

1. **expectation gate** — fail fast on structural poison (NULL keys,
   out-of-range money) before spending any audit compute;
2. **functional dependencies** (q175 machinery) — which key/attribute
   contracts actually hold;
3. **chi-square independence** (q182) — are the two categorical columns
   the FD audit says are non-functional at least independent?
4. **Benford first-digit screen** (q183) — do the money amounts look
   organic or fabricated/synthetic?
5. **k-anonymity / l-diversity** (q180) — can rows be re-identified
   from quasi-identifiers before the data is shared?
6. **join-key skew** (q163 machinery) — which join strategy will the
   table's keys sustain at scale?

Every stage is the exact-integer, value-hash-oracled query machinery —
this example just sequences them and renders the findings.

Run: ``python examples/data_quality_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkdiff.operators.expectations import (
    ExpectationGateError,
    expectation_gate,
    in_range,
    not_null,
    unique,
)
from sparkdiff.operators.profile import skew_report
from sparkdiff.queries import (
    q175_fd_audit,
    q180_k_anonymity,
    q182_chi2_independence,
    q183_benford_audit,
)
from sparkdiff.session import get_spark, load_table


def main(sf_dir: str) -> None:
    spark = get_spark("data-quality-example", cpus=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_table(spark, sf_dir, "orders")
    print("== 1. expectation gate ==")
    try:
        rows = expectation_gate(
            orders,
            [
                not_null("o_orderkey"),
                not_null("o_custkey"),
                in_range("o_totalprice", 0.01, 1_000_000.0),
                unique(["o_orderkey"]),
            ],
        )
    except ExpectationGateError as exc:
        raise SystemExit(f"aborting: {exc}") from exc
    print(f"gate passed: {len(rows)} checks, 0 violations")

    print("== 2. functional dependencies ==")
    for r in sorted(
        q175_fd_audit(spark, sf_dir).collect(), key=lambda r: r.candidate
    ):
        verdict = "HOLDS" if r.holds else f"{r.n_violations} violations"
        print(f"  {r.candidate:34s} groups={r.n_groups:<7d} {verdict}")

    print("== 3. chi-square independence (status x priority) ==")
    cells = q182_chi2_independence(spark, sf_dir).collect()
    chi2_scaled = sum(r.chi2_term_scaled for r in cells)
    worst = max(cells, key=lambda r: r.chi2_term_scaled)
    print(f"  {len(cells)} cells, chi2*1e6 = {chi2_scaled}")
    print(
        f"  largest deviation: status={worst.o_orderstatus!r} "
        f"priority={worst.o_orderpriority!r} obs={worst.obs} "
        f"expected_milli={worst.expected_milli}"
    )

    print("== 4. Benford first-digit screen (o_totalprice) ==")
    digits = sorted(
        q183_benford_audit(spark, sf_dir).collect(), key=lambda r: r.digit
    )
    total_dev = sum(r.dev_pm for r in digits)
    bar = " ".join(f"{r.digit}:{r.share_pm}pm" for r in digits)
    print(f"  shares {bar}")
    print(
        f"  total |share - Benford| = {total_dev} per mille "
        f"({'NOT Benford-like (synthetic/uniform amounts)' if total_dev > 200 else 'plausibly organic'})"
    )

    print("== 5. k-anonymity / l-diversity (customer QI groups) ==")
    groups = q180_k_anonymity(spark, sf_dir).collect()
    risky_k = [g for g in groups if not g.k_anonymous]
    risky_l = [g for g in groups if g.k_anonymous and not g.l_diverse]
    at_risk = sum(g.n_members for g in risky_k)
    print(
        f"  {len(groups)} QI groups; {len(risky_k)} below k=5 "
        f"({at_risk} re-identifiable members); "
        f"{len(risky_l)} k-anonymous but not l-diverse"
    )

    print("== 6. join-key skew (lineitem) ==")
    li = load_table(spark, sf_dir, "lineitem")
    for r in skew_report(
        li, ["l_orderkey", "l_partkey", "l_returnflag"]
    ).collect():
        print(
            f"  {r.key_col:13s} n_keys={r.n_keys:<8d} max={r.max_n:<6d} "
            f"skew_milli={r.skew_milli:<6d} salt={r.salt}"
        )

    print("report complete")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
