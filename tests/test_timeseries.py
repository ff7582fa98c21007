"""Time-series operator edge semantics: as-of tie/tolerance/no-match rules,
range-join bin spanning and end-exclusivity, rollup cascade exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from employee_activity_etl_poc_spark.operators.asof import asof_join_backward
from employee_activity_etl_poc_spark.operators.rangejoin import (
    hypertable_rollup,
    range_join_points_intervals,
)


def _ts_df(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    for c, t in df.dtypes:
        if c.endswith("_s") and t == "string":
            df = df.withColumn(c[:-2], F.col(c).cast("timestamp")).drop(c)
    return df


def test_asof_inclusive_ties_and_no_match(spark):
    left = _ts_df(
        spark,
        [(1, 10, "2024-01-01 10:00:00"), (2, 10, "2024-01-01 09:00:00")],
        "id long, k long, ts_s string",
    )
    right = _ts_df(
        spark,
        [
            (10, "2024-01-01 10:00:00", 7.0),  # exactly at left #1's ts
            (10, "2024-01-01 09:30:00", 5.0),
        ],
        "k long, ts_s string, v double",
    )
    out = {
        r["id"]: (r["v_asof"], str(r["ts_asof"]))
        for r in asof_join_backward(left, right, "k", "ts", ["v"]).collect()
    }
    # inclusive: the 10:00 right row matches the 10:00 left row
    assert out[1] == (7.0, "2024-01-01 10:00:00")
    # left row before every right row -> nulls
    assert out[2] == (None, "None")


def test_asof_tolerance_nulls_stale_matches(spark):
    left = _ts_df(spark, [(1, 1, "2024-01-01 12:00:00")], "id long, k long, ts_s string")
    right = _ts_df(spark, [(1, "2024-01-01 10:00:00", 3.0)], "k long, ts_s string, v double")
    loose = asof_join_backward(left, right, "k", "ts", ["v"]).collect()[0]
    assert loose["v_asof"] == 3.0
    tight = asof_join_backward(
        left, right, "k", "ts", ["v"], tolerance_seconds=3600
    ).collect()[0]
    assert tight["v_asof"] is None and tight["ts_asof"] is None


def test_asof_keys_are_isolated(spark):
    left = _ts_df(spark, [(1, 1, "2024-01-01 12:00:00")], "id long, k long, ts_s string")
    right = _ts_df(
        spark, [(2, "2024-01-01 11:00:00", 9.0)], "k long, ts_s string, v double"
    )
    out = asof_join_backward(left, right, "k", "ts", ["v"]).collect()[0]
    assert out["v_asof"] is None  # other key's rows never leak


def test_range_join_spanning_and_exclusive_end(spark):
    intervals = _ts_df(
        spark,
        # 3-day interval spans multiple 1-day bins
        [(100, "2024-01-01 12:00:00", "2024-01-04 12:00:00")],
        "iid long, s_s string, e_s string",
    ).withColumnsRenamed({"s": "start", "e": "end"})
    points = _ts_df(
        spark,
        [
            (1, "2024-01-03 00:00:00"),  # inside, different bin than start
            (2, "2024-01-04 12:00:00"),  # == end -> excluded (exclusive)
            (3, "2024-01-01 12:00:00"),  # == start -> included (inclusive)
            (4, "2024-01-10 00:00:00"),  # outside
        ],
        "pid long, p_s string",
    )
    out = range_join_points_intervals(
        points, intervals, "p", "start", "end", bin_seconds=86400
    )
    assert sorted(r["pid"] for r in out.collect()) == [1, 3]
    # no duplicate pairs despite the interval covering several bins
    assert out.count() == out.select("pid", "iid").distinct().count()


def test_sliced_range_join_subset_of_global(spark, sf_dir):
    """The r7 at-scale gate variant: the hour-sliced range join must be
    a deterministic SUBSET of the global audit join — pairs whose
    signup AND error both fall in kept hours — never new pairs."""
    from employee_activity_etl_poc_spark.plans.registry import REGISTRY

    full = {
        (r["signup_id"], r["error_id"])
        for r in REGISTRY["error_in_signup_window"].fn(spark, sf_dir).collect()
    }
    sliced = [
        (r["signup_id"], r["error_id"])
        for r in REGISTRY["error_in_signup_window_sliced"].fn(spark, sf_dir).collect()
    ]
    assert set(sliced) <= full
    assert len(sliced) == len(set(sliced))  # binned rewrite: no dup pairs
    # determinism: identical re-run (the slice is keyed, not sampled RNG)
    again = [
        (r["signup_id"], r["error_id"])
        for r in REGISTRY["error_in_signup_window_sliced"].fn(spark, sf_dir).collect()
    ]
    assert sorted(again) == sorted(sliced)


def test_hypertable_cascade_matches_direct(spark, sf_dir):
    from employee_activity_etl_poc_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    tiers = hypertable_rollup(ev, "ts", ["event_type"], "value", ["1 hour", "1 day"])
    cascade = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["total"], 6))
        for r in tiers["1 day"].collect()
    }
    direct = {
        (r["w"]["start"], r["event_type"]): (r["n"], round(r["total"], 6))
        for r in ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert cascade == direct


def test_resample_gapfill_known_gaps(spark):
    """3 events in hours 0, 0, 3 -> grid of 4 buckets; gap hours carry
    n=0 and the forward-filled total; leading data intact."""
    from pyspark.sql import functions as F

    from employee_activity_etl_poc_spark.operators.resample import resample_gapfill

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 5.0),
            (1, "2024-01-01 00:50:00", 7.0),
            (1, "2024-01-01 03:20:00", 11.0),
        ],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["bucket_us"]: (r["n"], r["total"], r["total_ffill"])
        for r in resample_gapfill(df, "ts", ["user_id"], "value").collect()
    }
    base = 1704067200 * 1_000_000  # 2024-01-01 00:00 UTC
    hour = 3_600_000_000
    assert set(out) == {base, base + hour, base + 2 * hour, base + 3 * hour}
    assert out[base] == (2, 12.0, 12.0)
    assert out[base + hour] == (0, None, 12.0)       # gap: ffilled
    assert out[base + 2 * hour] == (0, None, 12.0)   # gap: ffilled
    assert out[base + 3 * hour] == (1, 11.0, 11.0)
