"""Tests for the relational operator layer (SURVEY §2.2-2.6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from employee_activity_etl_poc_spark.operators import relational as R


def test_enrich_left_no_duplicate_columns(spark):
    fact = spark.createDataFrame([(1, "x"), (2, "y")], "k long, name string")
    dim = spark.createDataFrame([(1, "d1")], "k long, name string")
    out = R.enrich_left(fact, dim, "k")
    # P3 made structurally impossible: collision suffixed, key never doubled
    assert out.columns == ["k", "name", "name_dim"]
    rows = {r["k"]: r["name_dim"] for r in out.collect()}
    assert rows == {1: "d1", 2: None}


def test_anti_and_semi(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    right = spark.createDataFrame([(2,), (3,)], "k long")
    assert [r["k"] for r in R.anti_join(left, right, "k").collect()] == [1]
    assert sorted(r["k"] for r in R.semi_join(left, right, "k").collect()) == [2, 3]


def test_topk_global_and_per_group(spark):
    df = spark.createDataFrame(
        [(g, i) for g in ("a", "b") for i in range(10)], "g string, i long"
    )
    top = R.topk_global(df, [F.col("i").desc(), F.col("g")], 3)
    assert [(r["g"], r["i"]) for r in top.collect()] == [("a", 9), ("b", 9), ("a", 8)]
    per = R.topk_per_group(df, ["g"], [F.col("i").desc()], 2)
    assert sorted((r["g"], r["i"]) for r in per.collect()) == [
        ("a", 8), ("a", 9), ("b", 8), ("b", 9),
    ]


def test_assign_contiguous_ids(spark):
    df = spark.createDataFrame([("c",), ("a",), ("b",)], "v string")
    out = R.assign_contiguous_ids(df, [F.col("v")])
    assert {(r["v"], r["row_id"]) for r in out.collect()} == {("a", 1), ("b", 2), ("c", 3)}


def test_union_fragments_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "k long, extra string")
    b = spark.createDataFrame([(2,)], "k long")
    out = R.union_fragments([a, b])
    rows = {r["k"]: r["extra"] for r in out.collect()}
    assert rows == {1: "x", 2: None}


def test_key_difference(spark):
    a = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    b = spark.createDataFrame([(2,)], "k long")
    assert sorted(r["k"] for r in R.key_difference(a, b, "k").collect()) == [1, 3]


def test_high_watermark_filter(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-02-01 00:00:00")], "id long, s string"
    ).withColumn("ts", F.col("s").cast("timestamp"))
    out = R.high_watermark_filter(df, "ts", "2024-01-15 00:00:00")
    assert [r["id"] for r in out.collect()] == [2]
    assert R.max_watermark(df, "ts").month == 2


def test_approx_count_distinct_error_bound(spark, sf_dir):
    """The 100 TB form of countDistinct (HLL, mergeable, constant memory —
    SCALE.md's prescription) stays within its documented rsd of the exact
    count on the fixture; the correctness gate keeps the exact form only
    because the oracle must hash-match."""
    from pyspark.sql import functions as F

    from employee_activity_etl_poc_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.06


def test_snapshot_diff_changes(spark):
    """snapshot_diff: added/removed/changed classification, per-column
    change lists, null-safe compares (NULL->NULL is not a change;
    NULL->value is)."""
    from employee_activity_etl_poc_spark.operators.relational import snapshot_diff
    from pyspark.sql import functions as F

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, t string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "X", 31.0), (5, "e", 50.0)],
        "id long, t string, v double",
    )
    got = {
        r["id"]: (r["change"], list(r["changed_cols"]))
        for r in snapshot_diff(old, new, ["id"]).collect()
    }
    # 1 unchanged, 2 unchanged (NULL==NULL null-safely)
    assert got == {
        3: ("changed", ["t", "v"]),
        4: ("removed", []),
        5: ("added", []),
    }
    # NULL -> value IS a change
    new2 = spark.createDataFrame([(2, "b", 99.0)], "id long, t string, v double")
    got2 = {
        r["id"]: (r["change"], list(r["changed_cols"]))
        for r in snapshot_diff(
            old.where(F.col("id") == 2), new2, ["id"]
        ).collect()
    }
    assert got2 == {2: ("changed", ["v"])}
