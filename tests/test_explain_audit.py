"""Pytest gate for the physical-plan audit (round 14, VERDICT r13 item
8): tools/explain_audit.py was builder-run only, so a plan regression
between rounds would only be caught manually. This runs the SAME CHECKS
/ FORBIDDEN / twin-containment assertions against .explain("formatted")
inside the suite every round."""

import importlib.util
import os
import sys


def _load_audit():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "explain_audit", os.path.join(root, "tools", "explain_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["explain_audit"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_plan_audit_all_checks_pass(spark):
    audit = _load_audit()
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        failures = audit.run_audit(spark, "/root/testdata/sf0.01")
    assert not failures, "\n".join(
        f"{name}: {desc}" for name, desc, _plan in failures
    ) + "\n\nfirst failing plan:\n" + (failures[0][2][:3000] if failures else "")
