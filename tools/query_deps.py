"""Table dependencies per registered query, by source introspection.

The r8 registry scale-contract (VERDICT r7 ask #1) needs to know, for
every query, which testdata tables its Spark side reads — so the
contract test can require that every query whose table set is covered
by a decade fixture either appears in the decade sweep or carries the
`audit` tag. Queries load tables exclusively through
``load(spark, sf_dir, "<table>")`` / ``load_table(...)`` literals (the
repo convention), so a source regex over the registered function (plus
the module-level corpus helpers it calls, which follow the same
convention) is reliable; anything with no detectable load is reported
as unknown and must be classified explicitly by the caller.
"""

from __future__ import annotations

import inspect
import os
import re
import sys

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

_LOAD_RE = re.compile(
    r"""load(?:_table)?\(\s*spark\s*,\s*sf_dir\s*,\s*['"](\w+)['"]"""
)
# corpus helpers shared by many queries (e.g. _with_near_copies) take an
# already-loaded frame, so the load literal is visible at the call site;
# helpers that LOAD internally would hide tables from the regex — the
# audit below flags functions with zero detected loads instead of
# guessing.


def tables_used(fn) -> frozenset[str]:
    """Tables the registered query function loads, from its source."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return frozenset()
    return frozenset(m for m in _LOAD_RE.findall(src) if m in TABLES)


def registry_deps() -> dict[str, frozenset[str]]:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from employee_activity_etl_poc_spark.plans.registry import REGISTRY

    return {name: tables_used(q.fn) for name, q in REGISTRY.items()}


if __name__ == "__main__":
    deps = registry_deps()
    for name, tabs in sorted(deps.items()):
        print(f"{name}: {','.join(sorted(tabs)) or '(none detected)'}")
