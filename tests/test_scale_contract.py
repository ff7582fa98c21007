"""Registry scale-contract (VERDICT r7 ask #1): every registered query
is either swept at the decade step, audit-tagged (quadratic by
contract, out of HEADLINE), or exempt with a stated rationale — and the
three classifications cannot drift apart, because this test diffs them
against each other and the registry on every run."""

from __future__ import annotations

from bench import HEADLINE, R1_SUBSET
from employee_activity_etl_poc_spark.plans.registry import REGISTRY
from tools.sweep_heavy import (
    AUDIT_EXCLUDED,
    DOCS_LIGHT_QUERIES,
    EVENTS_QUERIES,
    EXEMPT,
    QUERIES,
    RELATIONAL_QUERIES,
)

SWEPT = set(QUERIES) | set(DOCS_LIGHT_QUERIES) | set(EVENTS_QUERIES) | set(
    RELATIONAL_QUERIES
)


def test_audit_tags_match_sweep_exclusions():
    """The sweep's audit-exclusion list IS the registry's audit-tagged
    set — one cannot name a query the other does not."""
    tagged = {n for n, q in REGISTRY.items() if "audit" in q.tags}
    assert tagged == set(AUDIT_EXCLUDED), (
        f"registry audit tags {sorted(tagged)} != sweep exclusions "
        f"{sorted(AUDIT_EXCLUDED)}"
    )
    # every exclusion carries a rationale naming at least one twin
    for name, why in AUDIT_EXCLUDED.items():
        assert "twin" in why, f"{name}: exclusion rationale must name twins"


def test_no_audit_query_in_headline_or_sweeps():
    """Audit forms are bounded-corpus queries: they must not be in the
    bench HEADLINE (whose entries must survive the next decade by
    construction) nor in any sweep list. R1_SUBSET is exempt — it is the
    frozen BENCH_r01 comparison set, not a scale claim."""
    for name in AUDIT_EXCLUDED:
        assert name not in HEADLINE, f"{name} is audit-tagged but in HEADLINE"
        assert name not in SWEPT, f"{name} is audit-tagged but swept"
    # the frozen r1 list still contains error_in_signup_window on purpose
    assert "error_in_signup_window" in R1_SUBSET


def test_every_query_is_classified():
    """Complete partition: swept ∪ audit ∪ exempt covers the registry,
    with no overlaps and no stale names."""
    all_named = SWEPT | set(AUDIT_EXCLUDED) | set(EXEMPT)
    registry = set(REGISTRY)
    missing = registry - all_named
    stale = all_named - registry
    assert not missing, f"unclassified queries (add to a sweep list): {sorted(missing)}"
    assert not stale, f"classified names not in registry: {sorted(stale)}"
    assert not (SWEPT & set(AUDIT_EXCLUDED))
    assert not (SWEPT & set(EXEMPT))
    assert not (set(AUDIT_EXCLUDED) & set(EXEMPT))
    for name, why in EXEMPT.items():
        assert len(why) > 20, f"{name}: exemption needs a real rationale"


def test_headline_queries_are_swept():
    """Every HEADLINE entry has decade-sweep coverage or a documented
    size-free exemption (the 'no headline scale-killers' rule, enforced
    rather than asserted) — an EXEMPT query's cost does not scale with
    the fixture, so it cannot be a scale-killer by construction."""
    not_swept = [q for q in HEADLINE if q not in SWEPT and q not in EXEMPT]
    assert not not_swept, f"HEADLINE entries without sweep coverage: {not_swept}"
