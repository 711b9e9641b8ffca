"""Physical-plan regression gate: the headline queries must keep their
scale-critical plan shape (pruned scans, broadcast dims, codegen)."""

from __future__ import annotations


def test_headline_plans_hold(spark, sf_dir):
    from tools.audit_plans import audit

    failures = audit(spark, sf_dir)
    assert not failures, "\n".join(failures)
