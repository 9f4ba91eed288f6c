"""CI gate for physical-plan regressions (VERDICT r5 #8).

Runs the same audit that generates PLANS.md — every registry query
executed at sf0.01 under AQE, its FINAL physical plan pattern-checked
for the three scale-bug shapes (unexpected nested-loop/cartesian join,
unexpected Python evaluation, unexpected single-partition exchange) —
and asserts zero warnings. A plan regression now fails the commit that
introduces it instead of surfacing in the round-close PLANS.md sweep.

sf0.01 (not the sf0.001 smoke fixture) on purpose: broadcast-threshold
and AQE decisions differ with input size, and PLANS.md/the judge audit
at sf0.01 — the gate must look at the same plans.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from plan_audit import run_audit  # noqa: E402

SF_PLAN = "/root/testdata/sf0.01"


def test_every_registry_plan_is_warning_free(spark):
    rows, warnings = run_audit(spark, SF_PLAN)
    # All registered queries must produce an auditable plan (a PLAN
    # ERROR row is recorded as a warning by run_audit).
    assert len(rows) >= 260, f"only {len(rows)} plans audited"
    assert warnings == []
