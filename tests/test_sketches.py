"""t-digest percentile sketch: rank-error bound vs the exact form,
merge-invariance across partitionings, grouped two-stage form, endpoint
exactness, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from employee_activity_etl_poc_spark.operators import sketches as SK
from employee_activity_etl_poc_spark.sources.readers import load_table

PCTS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


@pytest.fixture(scope="module")
def values(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .select(F.col("value").cast("double").alias("v"))
        .where(F.col("v").isNotNull())
    )


def _rank_error(values_df, est_rows):
    """max over percentiles of |CDF(estimate) - p|."""
    rows = values_df.collect()
    vals = sorted(r["v"] for r in rows)
    n = len(vals)
    import bisect

    worst = 0.0
    for r in est_rows:
        cdf = bisect.bisect_right(vals, r["value"]) / n
        worst = max(worst, abs(cdf - r["pct"]))
    return worst


def test_tdigest_rank_error_bound(spark, values):
    est = SK.tdigest_percentiles(values, "v", PCTS, delta=100.0).collect()
    assert len(est) == len(PCTS)
    assert _rank_error(values, est) <= 0.02


def test_tdigest_endpoints_exact(spark, values):
    bounds = values.agg(F.min("v").alias("mn"), F.max("v").alias("mx")).collect()[0]
    est = {
        r["pct"]: r["value"]
        for r in SK.tdigest_percentiles(values, "v", [0.0, 1.0]).collect()
    }
    assert est[0.0] == bounds["mn"] and est[1.0] == bounds["mx"]


def test_tdigest_merge_invariance_across_partitioning(spark, values):
    """The digest is mergeable: sketching 2 vs 16 partitions of the same
    data lands within the same rank-error envelope (estimates need not be
    bitwise equal — centroid boundaries shift — but both must hold the
    documented bound)."""
    for parts in (2, 16):
        est = SK.tdigest_percentiles(
            values.repartition(parts), "v", PCTS, delta=100.0
        ).collect()
        assert _rank_error(values, est) <= 0.02


def test_tdigest_deterministic(spark, values):
    a = sorted(
        (r["pct"], r["value"])
        for r in SK.tdigest_percentiles(values, "v", PCTS).collect()
    )
    b = sorted(
        (r["pct"], r["value"])
        for r in SK.tdigest_percentiles(values, "v", PCTS).collect()
    )
    assert a == b


def test_tdigest_grouped_matches_exact_within_bound(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.col("value").cast("double").alias("v"))
        .where(F.col("v").isNotNull())
    )
    est = SK.tdigest_percentiles_grouped(
        ev, ["event_type"], "v", [0.5, 0.9], delta=100.0
    ).collect()
    groups = {r["event_type"] for r in est}
    assert groups == {r["event_type"] for r in ev.select("event_type").distinct().collect()}
    import bisect

    by_group: dict[str, list[float]] = {}
    for r in ev.collect():
        by_group.setdefault(r["event_type"], []).append(r["v"])
    for g in by_group:
        by_group[g].sort()
    for r in est:
        vals = by_group[r["event_type"]]
        cdf = bisect.bisect_right(vals, r["value"]) / len(vals)
        assert abs(cdf - r["pct"]) <= 0.02, (r["event_type"], r["pct"])


def test_tdigest_compression_bounds_centroids(spark, values):
    cent = SK.tdigest_partition_sketches(values.repartition(4), "v", delta=50.0)
    counts = [
        r["n"]
        for r in cent.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    # k1 with unit steps yields ~δ/2..δ centroids; allow slack but prove
    # the partition sketch is BOUNDED, not the raw data
    assert all(c <= 2 * 50 for c in counts)
    # and the sketch total weight equals the row count (nothing dropped)
    total_w = cent.agg(F.sum("weight")).collect()[0][0]
    assert total_w == values.count()


def test_tdigest_empty_input(spark):
    empty = spark.createDataFrame([], "v double")
    assert SK.tdigest_percentiles(empty, "v", [0.5]).collect() == []
