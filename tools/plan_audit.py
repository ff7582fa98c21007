"""Physical-plan audit over the whole registry.

For every registered query, compiles the executed plan at a given sf_dir
and counts the operators that matter at 100 TB: shuffles (Exchange),
join strategies, Python boundaries, scans. The final plan is compiled,
not run — though a few gate queries do bounded driver-side setup while
BUILDING their plan (collecting broadcast-sized query vectors, writing
the Delta round-trip scratch table), so the audit is cheap, not free.
Writes PLAN_AUDIT.md (a per-query table + totals) and exits non-zero if
any query plans a BroadcastNestedLoopJoin / CartesianProduct without
being explicitly allowlisted — the two operators that silently become
O(n²) disasters at scale.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from employee_activity_etl_poc_spark.plans.registry import REGISTRY  # noqa: E402
from employee_activity_etl_poc_spark.session import get_spark  # noqa: E402

# Queries ALLOWED to plan a nested-loop/cartesian, with why. Exactly the
# set that currently does — additions must justify themselves here.
# Two legal shapes: (a) a ≤ 6-row aggregate/flag side cross-joined onto a
# small result (self-check gates), (b) the documented exact brute-force
# ANN baselines, whose query side is broadcast-sized by contract.
NESTED_LOOP_OK = {
    "event_value_tdigest": "6-row estimate side vs values: rank-error check",
    "event_value_kll": "6-row estimate side vs values: rank-error check",
    "events_theta_distinct_algebra": "1-row sketch aggregates assembled",
    "events_heavy_hitter_users": "1-row total count cross-joined",
    "embedding_ann_lsh": "exact baseline cross join + 1-row recall flag",
    "embedding_ann_ivf": "exact baseline cross join + 1-row recall flag",
    "embedding_pq_topk": "exact baseline + LUT join + 1-row recall flag",
    "embedding_ivfpq_topk": "exact baseline + LUT join + 1-row recall flag",
    "embedding_index_reload_topk": (
        "exact baseline cross join + 1-row recall flag + 1-row "
        "reload-identity flag (fresh-vs-reloaded exceptAll aggregate)"
    ),
    "embedding_topk": "exact baseline: corpus × 10 broadcast queries",
    "text_compression_ratio": "1-row corpus-flag side cross-joined (gate)",
    "dedup_lsh_bucket_stats": "1-row bucket aggregates assembled (2 modes)",
    "dedup_lsh_bucket_stats_sampled": (
        "1-row scaled bucket aggregates assembled (2 modes, eager "
        "monitor on the 1/4 sample)"
    ),
    "embedding_pq_index_reload_topk": (
        "exact baseline cross join + 1-row recall flag + 1-row "
        "reload-identity flag (fresh-vs-reloaded exceptAll aggregate)"
    ),
}

COUNTERS = {
    "exchanges": re.compile(r"Exchange (hash|range|SinglePartition)"),
    "bhj": re.compile(r"BroadcastHashJoin"),
    "smj": re.compile(r"SortMergeJoin"),
    "shj": re.compile(r"ShuffledHashJoin"),
    "bnlj_cartesian": re.compile(r"BroadcastNestedLoopJoin|CartesianProduct"),
    "python": re.compile(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"),
    "scans": re.compile(r"FileScan parquet|Scan ExistingRDD"),
    "codegen_spans": re.compile(r"\*\(\d+\)"),
}


def strip_cached_subplans(plan: str) -> str:
    """Remove the plan text nested under InMemoryRelation nodes before
    counting. ``executedPlan().toString()`` prints the CACHED plan inside
    every InMemoryTableScan reference, but that subtree executes once at
    materialization, not once per reference — counting its FileScans/
    exchanges N times misreports a persisted frame as scan-heavy (it is
    the opposite: persistence is what REMOVES the repeated scans). Each
    cached subtree is kept exactly once (its first occurrence) so the
    materialization cost still shows, and InMemoryTableScan itself stays
    countable as the reference marker."""
    out: list[str] = []
    skip_indent: int | None = None
    seen_cached: set[str] = set()
    keeping_first = False
    for line in plan.splitlines():
        indent = len(line) - len(line.lstrip(" :+-"))
        if skip_indent is not None:
            if indent > skip_indent:
                if keeping_first:
                    out.append(line)
                continue
            skip_indent = None
            keeping_first = False
        if "InMemoryRelation" in line:
            # expr ids (#123L) are re-numbered per cache REFERENCE and the
            # tree's branch art (':' columns) differs per position, while
            # the relation is one and the same — normalize both away or
            # every reference looks like a distinct first occurrence
            key = re.sub(r"#\d+", "", line.lstrip(" :+-"))
            skip_indent = indent
            keeping_first = key not in seen_cached
            seen_cached.add(key)
            out.append(line)
            continue
        out.append(line)
    return "\n".join(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit")
    rows = []
    violations = []
    for name, q in REGISTRY.items():
        try:
            plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # a query that cannot even plan is a bug
            violations.append(f"{name}: PLAN ERROR {e}")
            continue
        plan = strip_cached_subplans(plan)
        counts = {k: len(rx.findall(plan)) for k, rx in COUNTERS.items()}
        rows.append((name, counts))
        if counts["bnlj_cartesian"] and name not in NESTED_LOOP_OK:
            violations.append(
                f"{name}: {counts['bnlj_cartesian']} nested-loop/cartesian "
                "joins, not allowlisted"
            )
    lines = [
        "# PLAN AUDIT — registry-wide physical-plan census",
        "",
        f"Compiled (not executed) against `{sf_dir}`. Columns: shuffles "
        "(Exchange), broadcast-hash / sort-merge / nested-loop+cartesian "
        "joins, Python boundaries (Arrow or row pickling), parquet scans, "
        "whole-stage-codegen spans. Nested-loop entries are only legal on "
        "the documented allowlist in `tools/plan_audit.py` (tiny flag/"
        "estimate sides, exact baselines, bounded-block all-pairs).",
        "",
        "| query | xchg | bhj | smj | shj | bnlj | py | scans | wsc |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    tot = dict.fromkeys(COUNTERS, 0)
    for name, c in sorted(rows):
        for k in tot:
            tot[k] += c[k]
        note = " ⚠" if c["bnlj_cartesian"] and name not in NESTED_LOOP_OK else ""
        lines.append(
            f"| {name}{note} | {c['exchanges']} | {c['bhj']} | {c['smj']} | "
            f"{c['shj']} | {c['bnlj_cartesian']} | {c['python']} | "
            f"{c['scans']} | {c['codegen_spans']} |"
        )
    nl_note = (
        "all allowlisted" if not violations
        else f"{len(violations)} VIOLATIONS — see below"
    )
    lines += [
        "",
        f"**Totals over {len(rows)} queries**: {tot['exchanges']} shuffles, "
        f"{tot['bhj']} broadcast-hash vs {tot['smj']} sort-merge vs "
        f"{tot['shj']} shuffled-hash joins, "
        f"{tot['bnlj_cartesian']} nested-loop/cartesian ({nl_note}), "
        f"{tot['python']} Python boundaries, {tot['scans']} scans, "
        f"{tot['codegen_spans']} codegen spans.",
    ]
    if violations:
        lines += ["", "## VIOLATIONS", ""]
        lines += [f"- {v}" for v in violations]
    open("/root/repo/PLAN_AUDIT.md", "w").write("\n".join(lines) + "\n")
    print(f"PLAN_AUDIT.md: {len(rows)} queries")
    for v in violations:
        print(f"VIOLATION {v}")
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
