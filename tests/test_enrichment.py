"""Commute-enrichment tests (SURVEY §7 step 8): injected client, mapInPandas
plumbing, text parsing — no real external API anywhere."""

from __future__ import annotations

from pyspark.sql import functions as F

from employee_activity_etl_poc_spark.operators.enrichment import (
    TRANSPORT_TO_API_MODE,
    FakeCommuteClient,
    derive_commute_metrics,
    fetch_commutes,
)
from employee_activity_etl_poc_spark.sources.generator import synthetic_employees


def test_fake_client_deterministic_and_failing():
    c = FakeCommuteClient()
    a = c.directions("3 rue X, Ville 1", "office", "driving", "typical")
    b = c.directions("3 rue X, Ville 1", "office", "driving", "typical")
    assert a == b and a is not None
    assert a[0].endswith(" km") and "min" in a[1]
    # some origin in a small scan fails (1-in-20 md5 bucket)
    fails = [
        c.directions(f"{i} rue Y", "office", "walking", "typical") is None
        for i in range(100)
    ]
    assert any(fails) and not all(fails)


def test_fetch_commutes_shape_and_modes(spark):
    emps = synthetic_employees(spark, 40)
    raw = fetch_commutes(emps, FakeCommuteClient)
    rows = raw.collect()
    assert len(rows) == 40
    expected_mode = {
        r["employee_id"]: TRANSPORT_TO_API_MODE[r["transport_mode"]]
        for r in emps.collect()
    }
    for r in rows:
        assert r["api_mode"] == expected_mode[r["employee_id"]]
        if r["commute_success"]:
            assert r["distance_text_typical"].endswith(" km")
            assert r["distance_text_typical"] == r["distance_text_rush"]
        else:
            assert r["duration_text_rush"] is None


def test_derive_commute_metrics_parses_api_text(spark):
    emps = synthetic_employees(spark, 60)
    out = derive_commute_metrics(fetch_commutes(emps, FakeCommuteClient)).collect()
    ok = [r for r in out if r["commute_success"]]
    assert ok
    for r in ok:
        # parsed km matches the raw text number
        assert abs(r["distance_km_typical"] - float(r["distance_text_typical"].split()[0])) < 1e-9
        assert len(r["duration_hhmmss_typical"]) == 8
        # rush hour is never faster (driving/transit slower, others equal)
        assert r["duration_hhmmss_rush"] >= r["duration_hhmmss_typical"]
    for r in out:
        if not r["commute_success"]:
            assert r["distance_km_typical"] is None
            assert r["duration_hhmmss_rush"] is None


def test_rush_slowdown_only_motorized(spark):
    emps = synthetic_employees(spark, 100)
    out = derive_commute_metrics(fetch_commutes(emps, FakeCommuteClient))
    walk_bike = out.where(
        F.col("commute_success") & F.col("api_mode").isin("walking", "bicycling")
    )
    assert walk_bike.count() > 0
    assert (
        walk_bike.where(
            F.col("duration_hhmmss_rush") != F.col("duration_hhmmss_typical")
        ).count()
        == 0
    )


def test_throwing_client_yields_failure_rows_not_dead_tasks(spark):
    """A client that raises for some addresses must produce
    commute_success=False rows, never kill the job."""

    class FlakyClient(FakeCommuteClient):
        def directions(self, origin, destination, mode, scenario):
            if origin.startswith("1"):  # a poisoned subset of addresses
                raise TimeoutError("api timeout")
            return super().directions(origin, destination, mode, scenario)

    emps = synthetic_employees(spark, 60)
    out = fetch_commutes(emps, FlakyClient).collect()
    assert len(out) == 60
    poisoned = {
        r["employee_id"]
        for r in emps.collect()
        if r["home_address"].startswith("1")
    }
    assert poisoned
    for r in out:
        if r["employee_id"] in poisoned:
            assert not r["commute_success"] and r["distance_text_typical"] is None
