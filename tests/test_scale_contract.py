"""Registry scale-contract (VERDICT r7 ask #1): every registered query
is either swept at the decade step, audit-tagged (quadratic by
contract, out of HEADLINE), or exempt with a stated rationale — and the
three classifications cannot drift apart, because this test diffs them
against each other and the registry on every run."""

from __future__ import annotations

from bench import HEADLINE, R1_SUBSET
from employee_activity_etl_poc_spark.plans.registry import REGISTRY
from tools.query_deps import registry_deps
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


def test_sweep_lists_match_detected_table_deps():
    """Each sweep list measures its queries against a fixture scaled on
    PARTICULAR tables (tools/query_deps source introspection, r8 advice:
    wire it in, not just cite it):

    - QUERIES / DOCS_LIGHT sweep against a documents+embeddings-only big
      fixture, so a query there that also reads events would silently
      under-measure — its detected set must be ⊆ {documents, embeddings}
      and non-empty.
    - EVENTS_QUERIES must read events (dims like customer are fine).
    - EXEMPT entries whose rationale says 'reads no fixture table' must
      truly detect zero loads.

    Queries with no detectable load literal load via helpers; they are
    'unknown' per query_deps' contract and are skipped, not guessed.
    """
    deps = registry_deps()
    for name in list(QUERIES) + list(DOCS_LIGHT_QUERIES):
        tabs = deps[name]
        assert tabs, f"{name}: docs-sweep query with no detectable load"
        assert tabs <= {"documents", "embeddings"}, (
            f"{name} is in the docs/embeddings sweep but reads {sorted(tabs)}"
        )
    for name in EVENTS_QUERIES:
        tabs = deps[name]
        if tabs:  # unknown (helper-loaded) is skipped, per query_deps
            assert "events" in tabs, (
                f"{name} is in the events sweep but reads {sorted(tabs)}"
            )
            assert not (tabs & {"documents", "embeddings"}), (
                f"{name} mixes docs/embeddings into the events sweep"
            )
    for name, why in EXEMPT.items():
        if "reads no fixture table" in why:
            assert not deps[name], (
                f"{name} is exempt as fixture-free but reads "
                f"{sorted(deps[name])}"
            )


def test_headline_queries_are_swept():
    """Every HEADLINE entry has decade-sweep coverage or a documented
    size-free exemption (the 'no headline scale-killers' rule, enforced
    rather than asserted) — an EXEMPT query's cost does not scale with
    the fixture, so it cannot be a scale-killer by construction."""
    not_swept = [q for q in HEADLINE if q not in SWEPT and q not in EXEMPT]
    assert not not_swept, f"HEADLINE entries without sweep coverage: {not_swept}"
