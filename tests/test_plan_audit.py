"""Registry-wide physical-plan audit as a round-close gate (r7).

tools/plan_audit.py summarizes every registered query's executed plan
and fails on any quadratic join (BroadcastNestedLoopJoin /
CartesianProduct) or row-at-a-time Python node that is not in its
verified documented-exception table — so a non-equi join or slow-path
UDF can't slip into a hot path silently between rounds.

Runs the tool in-process (subprocess would pay a second JVM) against
the sf0.001 smoke dir: plan SHAPES are scale-invariant here — every
flag the audit classifies comes from the logical construction
(crossJoin/broadcast/UDF type), not from row counts. (AQE can pick
broadcast over shuffle joins by size, which is why the audit's
exception classes key on the quadratic/row-python flags only, not on
exchange counts.)
"""

from __future__ import annotations

import os
import sys

import pytest

pytestmark = pytest.mark.slow  # slow lane — see pytest.ini

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from conftest import SF_SMOKE  # noqa: E402


def test_no_undocumented_quadratic_or_row_python(spark, registry):
    import plan_audit

    queries, _ = registry
    bad = {}
    for name in sorted(queries):
        r = plan_audit.audit_one(name, queries[name](spark, SF_SMOKE))
        for f in r["flags"]:
            if (name, f) not in plan_audit.DOCUMENTED:
                bad.setdefault(name, []).append(f)
    assert not bad, (
        "undocumented quadratic join / row-Python in hot path — either "
        f"fix the plan or document it in tools/plan_audit.DOCUMENTED: {bad}"
    )
