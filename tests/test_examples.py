"""Smoke-run the example pipelines (subprocess — they own their session).

`full` tier (round-9 verdict #2): each test boots its own JVM/session,
~0.5-2 min apiece — the other half of the verify-budget overrun beside
the oracle sweep.  Opt in with `-m full`; the end-of-round verification
runs them."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.full

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str) -> str:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_parity_pipeline_example():
    stdout = _run("parity_pipeline.py")
    assert "tables with discrepancies: ['CUSTOMER']" in stdout
    assert "LastName" in stdout and "RowModified" in stdout


def test_reference_lifecycle_pipeline_example():
    """/process + /convert + suggester as one session (round-9 stretch):
    the full-pair diff flags LINEITEM, the production-shape catalog
    (145 tables / 30k columns) expands + dialect-rewrites the macro
    script, the converted fixture pair executes, and the script diff's
    flagged columns come back as snippets."""
    stdout = _run("reference_lifecycle_pipeline.py")
    assert "tables with discrepancies: ['LINEITEM']" in stdout
    assert "145 tables / 30000 columns" in stdout
    assert "executed script pair: 140 hive rows, 140 sf rows" in stdout
    assert "LastName" in stdout and "RowModified" in stdout
    assert '[response] {"columnName"' in stdout


def test_training_data_pipeline_example():
    stdout = _run("training_data_pipeline.py")
    assert "-> chunks" in stdout
    assert "-> ingest-flagged 20" in stdout  # every perturbed copy caught
    assert "-> budgeted" in stdout


def test_revalidation_pipeline_example():
    stdout = _run("revalidation_pipeline.py")
    assert "dirty buckets:" in stdout
    assert "cell diffs in drifted slice:" in stdout
    assert "mismatch=" in stdout


def test_curation_export_pipeline_example():
    stdout = _run("curation_export_pipeline.py")
    assert "after domain mixing:" in stdout
    assert "windows of 512 tokens" in stdout
    assert "export shards:" in stdout


def test_search_rank_pipeline_example():
    stdout = _run("search_rank_pipeline.py")
    assert "top-7:" in stdout
    assert "per-source insight:" in stdout


def test_event_analytics_pipeline_example():
    stdout = _run("event_analytics_pipeline.py")
    assert "funnel 1_view" in stdout
    assert "attribution:" in stdout
    assert "peak concurrency:" in stdout


def test_staged_revalidation_pipeline_example():
    stdout = _run("staged_revalidation_pipeline.py")
    assert "stage 1 profile drift" in stdout
    assert "stage 2 dist drift l_quantity" in stdout
    assert "stage 3 cell diff: l_extendedprice" in stdout


def test_decontamination_pipeline_example():
    stdout = _run("decontamination_pipeline.py")
    assert "gram-flagged" in stdout and "exact-flagged" in stdout
    assert "-> PPS sample: 100 draws" in stdout


def test_ingest_gate_pipeline_example():
    stdout = _run("ingest_gate_pipeline.py")
    assert "batch 0: near-duplicate pairs flagged = 0" in stdout  # short-circuit
    assert "batch 2: near-duplicate pairs flagged = 5" in stdout  # grown index
    assert "partitioned into 64 buckets" in stdout
    assert "bloom filter persisted" in stdout


def test_record_linkage_pipeline_example():
    stdout = _run("record_linkage_pipeline.py")
    assert "injected dups re-found as matches: 4/4" in stdout  # sf0.001
    assert "-> decision match:" in stdout and "-> decision non_match:" in stdout


def test_corpus_planning_pipeline_example():
    stdout = _run("corpus_planning_pipeline.py")
    assert "== expectation gate ==" in stdout
    assert "== most-overlapping source pairs ==" in stdout
    assert "== novelty burn-down ==" in stdout
    assert "batch 0: 1000pm novel" in stdout  # batch 0 is all-novel by definition


def test_monitoring_pipeline_example():
    stdout = _run("monitoring_pipeline.py")
    assert "all four monitors match their batch twins after the restart" in stdout
    # the suite surfaces the live violation counter (event_type "error"
    # is deliberately not in the accepted set)
    assert "'accepted_values(event_type)': 201" in stdout
    assert "drift monitor: 22 dirty buckets (expected 22" in stdout


def test_data_quality_pipeline_example():
    stdout = _run("data_quality_pipeline.py")
    assert "gate passed: 4 checks, 0 violations" in stdout
    assert "o_orderkey->o_custkey" in stdout and "HOLDS" in stdout
    assert "NOT Benford-like" in stdout  # TPC-H prices are uniform-ish
    assert "report complete" in stdout
