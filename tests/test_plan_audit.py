"""Physical-plan regression gate: the headline queries must keep their
scale-critical plan shape (pruned scans, broadcast dims, codegen)."""

from __future__ import annotations


def test_headline_plans_hold(spark, sf_dir):
    from tools.audit_plans import audit

    failures = audit(spark, sf_dir)
    assert not failures, "\n".join(failures)


def test_cc_iteration_plans_hold(spark, sf_dir):
    """The Hash-Min CC loop runs behind a localCheckpoint, invisible to
    the catalog-level gates — its per-iteration plan must keep the loop
    invariants: no corpus scan inside the loop, bounded shuffles per
    iteration, map-side combine on the neighbor-min."""
    from tools.audit_plans import audit_cc

    failures = audit_cc(spark, sf_dir)
    assert not failures, "\n".join(failures)


def test_plugin_fanout_plans_hold(spark):
    """The production ETL fan-out keeps its scale-invariant plan
    properties (pruned staged scans, pushed dispatch filters, bounded
    scan counts, codegen, no cartesians) — and every produced plugin
    table must carry a gate, so a new plugin can't ship ungated."""
    from tools.audit_plans import audit_plugins

    failures = audit_plugins(spark)
    assert not failures, "\n".join(failures)


def test_presence_gates_read_only_the_executed_section():
    """An operator surviving only in the stale '== Initial Plan =='
    section (i.e. re-planned away by AQE at runtime) must NOT satisfy a
    presence or count gate — that silent re-plan is exactly what the
    gates exist to catch."""
    from tools.audit_plans import check_plan

    stale = "SomeOp\n== Initial Plan ==\nTakeOrderedAndProject\n"
    live = "TakeOrderedAndProject\n== Initial Plan ==\nTakeOrderedAndProject\n"

    gate = {"contains": ["TakeOrderedAndProject"]}
    assert any("missing" in f for f in check_plan("q", stale, "", gate))
    assert check_plan("q", live, "", gate) == []

    # a single pre-replan occurrence must not satisfy a >= 2 count gate
    twice = "Exchange\nExchange\n== Initial Plan ==\nExchange\nExchange\n"
    once = "Exchange\n== Initial Plan ==\nExchange\nExchange\n"
    n_gate = {"contains_n": {"Exchange": 2}}
    assert check_plan("q", twice, "", n_gate) == []
    assert any("appears 1x" in f for f in check_plan("q", once, "", n_gate))

    # scan counting likewise ignores the Initial Plan repeats
    scans = (
        "FileScan parquet [a]\n== Initial Plan ==\n"
        "FileScan parquet [a]\nFileScan parquet [a]\n"
    )
    assert check_plan("q", scans, "", {"max_scans": 1}) == []

    # broadcast floors and codegen presence: stale copies don't count
    b_stale = "SomeOp\n== Initial Plan ==\nBroadcastHashJoin\nWholeStageCodegen (1)\n"
    fails = check_plan("q", b_stale, "", {"broadcasts": 1, "codegen": True})
    assert any("broadcast joins" in f for f in fails)
    assert any("WholeStageCodegen" in f for f in fails)

    # forbidden operators are the deliberate exception: the gate asserts
    # broadcast-by-construction, so an SMJ/cartesian in the Initial Plan
    # (converted away only by runtime stats) still fails
    smj_stale = "BroadcastHashJoin\n== Initial Plan ==\nSortMergeJoin\n"
    assert any(
        "SortMergeJoin" in f
        for f in check_plan("q", smj_stale, "", {"no_smj": True})
    )
    cart_stale = "BroadcastHashJoin\n== Initial Plan ==\nCartesianProduct\n"
    assert any(
        "forbidden" in f
        for f in check_plan("q", cart_stale, "", {"contains_not": ["CartesianProduct"]})
    )


def test_max_n_gate_caps_only_the_executed_section():
    """max_n is a per-run cost ceiling: it counts the EXECUTED section
    (what actually ran), so a stale Initial-Plan copy of an operator
    AQE removed must not trip it — the inverse of contains_n's floor."""
    from tools.audit_plans import check_plan

    plan = "Exchange hashpartitioning\n== Initial Plan ==\nExchange hashpartitioning\nExchange hashpartitioning\n"
    gate = {"max_n": {"Exchange hashpartitioning": 1}}
    assert check_plan("q", plan, "", gate) == []
    tight = {"max_n": {"Exchange hashpartitioning": 0}}
    assert any("cap 0" in f for f in check_plan("q", plan, "", tight))


def test_hint_gate_counts_only_broadcast_hints():
    from tools.audit_plans import check_plan

    analyzed = (
        "ResolvedHint (strategy=broadcast)\n"
        "ResolvedHint (strategy=rebalance)\n"
        "ResolvedHint (strategy=broadcast)\n"
    )
    gate = {"max_hint_broadcasts": 1}
    fails = check_plan("q", "plan", analyzed, gate)
    assert any("2 explicit broadcast hints" in f for f in fails)
    assert check_plan("q", "plan", analyzed, {"max_hint_broadcasts": 2}) == []


def test_contains_anywhere_reads_the_full_plan():
    """Operators under a CACHED subplan print only inside the cache's
    nested sections (after the first '== Initial Plan ==' split) —
    `contains_anywhere` must find them there, while `contains` (by
    design) must not."""
    from tools.audit_plans import check_plan

    cached = (
        "InMemoryTableScan\n== Initial Plan ==\n"
        "InMemoryRelation\n  WindowGroupLimit\n"
    )
    assert check_plan("q", cached, "", {"contains_anywhere": ["WindowGroupLimit"]}) == []
    assert any(
        "missing" in f
        for f in check_plan("q", cached, "", {"contains": ["WindowGroupLimit"]})
    )
    assert any(
        "missing" in f
        for f in check_plan("q", "NoSuchOp", "", {"contains_anywhere": ["WindowGroupLimit"]})
    )
