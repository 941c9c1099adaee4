"""The committed plan-audit artifact, asserted.

``scripts/plan_audit.py`` sweeps every registry query's executed plan;
this test pins the global invariants on the committed ``PLAN_AUDIT.json``
so a query added without re-running the audit (count mismatch) or a
plan regression recorded by the audit (cartesian, row-at-a-time Python,
off-allowlist Python stage) fails CI."""

from __future__ import annotations

import json
import os

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AUDIT = os.path.join(REPO, "PLAN_AUDIT.json")


def _doc():
    with open(AUDIT) as f:
        return json.load(f)


def test_audit_artifact_is_fresh():
    doc = _doc()
    assert doc["n_queries"] == len(entrymod.queries()), (
        "PLAN_AUDIT.json is stale — re-run scripts/plan_audit.py"
    )
    assert not doc["errors"]


def test_no_cartesian_products_anywhere():
    assert _doc()["cartesian_products"] == []


def test_no_row_at_a_time_python_anywhere():
    assert _doc()["row_at_a_time_python"] == []


def test_python_stages_only_on_allowlist():
    assert _doc()["python_stages_off_allowlist"] == []


def test_audit_parser_detects_shapes():
    from scripts.plan_audit import audit_one

    plan = (
        "Exchange hashpartitioning\n  CartesianProduct\n"
        "  BatchEvalPython\n  Scan parquet x\n  BroadcastHashJoin\n"
    )
    m = audit_one(plan)
    assert m["exchanges"] == 1 and m["cartesian"] and m["scans"] == 1
    assert m["row_at_a_time_python"] and m["broadcast_joins"] == 1
