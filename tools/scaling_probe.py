"""Empirical scaling probe: run headline queries at sf0.01, sf0.1 and a
synthetic 4x-sf0.1 replica, and report the runtime scaling slope.

The 4x dataset is built in /tmp by unioning sf0.1 with itself four
times under uniform key shifts (every TPC-H key, doc/vec/event/user id
moves by ``replica * 10^9``), so FK joins stay consistent within each
replica and per-key cardinalities (group sizes, dup families, posting
lists) stay bounded — corpus size grows, per-key work does not, which
is exactly the 100 TB regime the operators are designed for.  nation/
region stay single-copy (dimensions).

Interpretation: slope10 = t(sf0.1)/t(sf0.01) against 10x rows,
slope4 = t(4x)/t(sf0.1) against 4x rows.  A plan that survives
scale-up shows slope <= the data ratio (linear or better, the constant
per-query floor makes small-sf ratios look sublinear).  Superlinear
slopes flag quadratic terms.  Note q66/q134 grow their TEST SUITE with
the corpus by spec (suite = every 40th/20th doc), so their matched
output grows ~16x at 4x — the runtime staying ~linear shows the scan,
not the suite size, dominates, which is the design claim.

Run: ``python tools/scaling_probe.py [q46_lineitem_diff q50_quantiles ...]``
Writes nothing outside /tmp; prints one result line per (query, scale).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SRC = "/root/testdata/sf0.1"
SHIFT = 10**9
#: replica count for the synthetic tier (4 default; REPLICAS=16 for the
#: heavy tier) — uniform key shifts per replica keep FKs valid
REPLICAS = int(os.environ.get("REPLICAS", "4"))
#: SHIFT_SOURCES=1 also remaps documents.source per replica
#: (``src_r<k>``), so the SOURCE count grows with the replica count —
#: the axis q147's exact path is quadratic in (vocabulary × sources²).
#: Default keeps sources fixed: corpus grows, source count doesn't.
SHIFT_SOURCES = os.environ.get("SHIFT_SOURCES", "") == "1"
#: SHIFT_NAMES=1 also rewrites customer.c_name with a per-replica
#: DOUBLED tag ('Customer#<rr>#' || original 9-digit key): names stay
#: unique across replicas AND any cross-replica pair differs in two
#: characters, so it cannot enter an ed<=1 join.  The default tier
#: clones every c_name REPLICAS times, which grows q158's ed<=1 pair
#: OUTPUT ~replicas^2 (every clone pairs at distance 0 across
#: replicas) — a fixture artifact, not an operator hazard; this knob
#: probes the regime the operator is designed for (corpus grows,
#: per-name multiplicity doesn't).
SHIFT_NAMES = os.environ.get("SHIFT_NAMES", "") == "1"
DST = (
    f"/tmp/sfprobe_{REPLICAS:02d}"
    + ("_srcs" if SHIFT_SOURCES else "")
    + ("_names" if SHIFT_NAMES else "")
)

#: table -> columns to shift per replica (uniform shift keeps FKs valid)
KEYED = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["nation", "region"]

DEFAULT_QUERIES = [
    "q01_pricing_summary",
    "q46_lineitem_diff",
    "q47_shipping_priority",
    "q50_quantiles",
    "q66_decontamination",
    "q83_ngram_novelty",
    "q104_skyline",
    "q109_equidepth_histogram",
    "q117_revenue_concentration",
    "q125_setsim_prefix_join",
    "q134_exact_contamination",
    "q135_pps_sample",
]


def build_4x() -> str:
    if os.path.isdir(DST) and os.path.exists(os.path.join(DST, "region.parquet")):
        return DST
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t, keys in KEYED.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        parts = []
        for r in range(REPLICAS):
            sel = ", ".join(
                f"({c} + {r * SHIFT}) AS {c}"
                if c in keys
                else (
                    f"(source || '_r{r}') AS source"
                    if SHIFT_SOURCES and t == "documents" and c == "source"
                    else (
                        f"('Customer#{r}{r}#' || lpad(CAST(c_custkey "
                        f"AS VARCHAR), 9, '0')) AS c_name"
                        if SHIFT_NAMES and t == "customer" and c == "c_name"
                        else c
                    )
                )
                for c in cols
            )
            parts.append(f"SELECT {sel} FROM src")
        con.execute(
            f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{t}.parquet'"
        )
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in DIMS:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    con.close()
    return DST


def main(names: list[str]) -> None:
    from sparkdiff.queries import QUERIES
    from sparkdiff.session import get_spark

    four = build_4x()
    spark = get_spark("scaling-probe")
    big = f"{REPLICAS}x"
    scales = [("sf0.01", "/root/testdata/sf0.01"), ("sf0.1", SRC), (big, four)]
    results: dict[str, dict[str, float]] = {}
    for name in names:
        fn = QUERIES[name]
        results[name] = {}
        for label, d in scales:
            runs = []
            for _ in range(3):
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
            med = sorted(runs)[1]
            results[name][label] = med
            print(f"{name} {label} {med:.3f}s", flush=True)
        spark.catalog.clearCache()
    print(
        f"\nquery, t(sf0.01), t(sf0.1), t({big}), slope10 (10x rows), "
        f"slope{REPLICAS} ({REPLICAS}x rows)"
    )
    for name, r in results.items():
        s10 = r["sf0.1"] / r["sf0.01"]
        sN = r[big] / r["sf0.1"]
        print(
            f"{name}, {r['sf0.01']:.3f}, {r['sf0.1']:.3f}, {r[big]:.3f}, "
            f"{s10:.2f}, {sN:.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_QUERIES)
