"""Catalog-at-production-scale: the reference's prod-gcp metadata is 145
tables / ~30k columns (resources/prod-gcp/schema_table.csv,
schema_column.csv).  A generated catalog of the same shape pins lookup
and macro-expansion cost so a metadata-size regression can't hide behind
toy fixtures."""

from __future__ import annotations

import csv
import time

import pytest

from sparkdiff.plans.macro import MacroExpander
from sparkdiff.sources.catalog import SchemaCatalog

N_TABLES = 145
N_COLUMNS = 30_000


@pytest.fixture(scope="module")
def prod_scale_dir(tmp_path_factory):
    """schema_table.csv / schema_column.csv with the reference's headers
    and cardinalities (ragged column counts, all six type ids)."""
    d = tmp_path_factory.mktemp("prod_scale_catalog")
    with open(d / "schema_table.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["table_id", "active", "name"])
        w.writeheader()
        for t in range(N_TABLES):
            w.writerow({"table_id": 1000 + t, "active": 1, "name": f"entity_{t:03d}"})
    with open(d / "schema_column.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["column_id", "name", "type", "tableId"])
        w.writeheader()
        cid = 0
        t = 0
        while cid < N_COLUMNS:
            # ragged sizes 10..400, deterministic
            n_cols = 10 + (t * 37) % 391
            for c in range(min(n_cols, N_COLUMNS - cid)):
                w.writerow(
                    {
                        "column_id": cid,
                        "name": f"c_attr{c:04d}",
                        "type": str(cid % 6),
                        "tableId": 1000 + (t % N_TABLES),
                    }
                )
                cid += 1
            t += 1
    return str(d)


def test_full_catalog_loads_fast_and_complete(prod_scale_dir):
    t0 = time.perf_counter()
    cat = SchemaCatalog.from_csv(prod_scale_dir)
    load_s = time.perf_counter() - t0
    assert load_s < 1.0, f"catalog load took {load_s:.2f}s"
    total = sum(
        len(cat.get_columns_for_table(f"entity_{t:03d}")) for t in range(N_TABLES)
    )
    assert total == N_COLUMNS


def test_macro_expansion_over_full_catalog_under_a_second(prod_scale_dir):
    """Expanding a type-dispatched macro for EVERY table (the worst-case
    '/convert a whole script directory' workload) stays under a second."""
    cat = SchemaCatalog.from_csv(prod_scale_dir)
    exp = MacroExpander(cat)
    script = "\n".join(
        "SELECT ${columns:entity_%03d::S(%%1$s):B(%%1$s):I(%%1$s):D(%%1$s):N(%%1$s)} FROM t" % t
        for t in range(N_TABLES)
    )
    t0 = time.perf_counter()
    out = exp.expand(script)
    took = time.perf_counter() - t0
    assert took < 1.0, f"expansion took {took:.2f}s"
    assert "${columns" not in out
    # spot-check the widest table expanded fully
    widest = max(
        range(N_TABLES),
        key=lambda t: len(cat.get_columns_for_table(f"entity_{t:03d}")),
    )
    n = len(cat.get_columns_for_table(f"entity_{widest:03d}"))
    line = out.splitlines()[widest]
    assert line.count(",") == n - 1


def test_prefix_fallback_at_scale(prod_scale_dir):
    cat = SchemaCatalog.from_csv(prod_scale_dir)
    direct = cat.get_columns_for_table("entity_007")
    for prefix in ("udm_s_", "delta_stage_", "delta_udm_", "udm_sf_"):
        assert cat.get_columns_for_table(prefix + "entity_007") == direct
    with pytest.raises(IOError):
        cat.get_columns_for_table("no_such_table")
