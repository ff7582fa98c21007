"""In-suite replica of the driver's correctness gate (VERDICT r4 #8).

``pytest -m oracle_sweep`` runs EVERY registry query against its DuckDB
oracle at sf0.01 in one shot — row count, schema shape, and value hash —
so "all 118 green" is a test the suite enforces each round, not a
manual claim. The per-query FAST_SUBSET checks in
``test_entry_contract.py`` stay as the quick sf0.001 smoke; this is the
full gate.
"""

from __future__ import annotations

import pytest

from tools.check_oracle import run_sweep

SF_GATE = "/root/testdata/sf0.01"


@pytest.mark.oracle_sweep
def test_full_registry_oracle_sweep(spark):
    failures = run_sweep(spark, SF_GATE)
    assert failures == 0
