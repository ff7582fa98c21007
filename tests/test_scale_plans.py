"""Plan-level scale assertions: the physical plans must have the properties
SCALE.md claims (pushdown, broadcast, no shuffle for bucketed joins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from employee_activity_etl_poc_spark.operators.relational import merge_upsert
from employee_activity_etl_poc_spark.plans.registry import REGISTRY


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_watermark_filter_pushed_to_raw_scan(spark, sf_dir):
    df = REGISTRY["events_after_watermark"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "GreaterThan(ts," in plan  # raw int64 predicate reached the scan


def test_dim_joins_are_broadcast(spark, sf_dir):
    for q in ("brand_volume", "revenue_by_segment", "regional_supplier_volume"):
        plan = _plan(REGISTRY[q].fn(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, q
        assert "SortMergeJoin" not in plan, q


def test_scan_is_column_pruned(spark, sf_dir):
    plan = _plan(REGISTRY["pricing_summary"].fn(spark, sf_dir))
    scan_line = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    assert "l_comment" not in scan_line  # widest column not read


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Pre-bucketing both sides on the join key deletes the exchange — the
    SCALE.md prescription for repeated fact-fact joins."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path / 'wh'}'")
    spark.range(1000).withColumn("v", F.col("id") % 7).write.bucketBy(
        8, "id"
    ).sortBy("id").saveAsTable("bktdb.b_fact")
    spark.range(500).withColumn("d", F.col("id") % 3).write.bucketBy(
        8, "id"
    ).sortBy("id").saveAsTable("bktdb.b_dim")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bktdb.b_fact").join(spark.table("bktdb.b_dim"), "id")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # bucketing replaced it
        assert joined.count() == 500
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP DATABASE IF EXISTS bktdb CASCADE")


def test_merge_upsert_update_and_insert(spark):
    existing = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "v", "x"]
    )
    incoming = spark.createDataFrame([(2, "B", 99), (4, "d", 40)], ["id", "v", "x"])
    out = sorted(
        (r["id"], r["v"], r["x"]) for r in merge_upsert(existing, incoming, "id").collect()
    )
    assert out == [(1, "a", 10), (2, "B", 99), (3, "c", 30), (4, "d", 40)]


def test_partitioned_gold_read_prunes_partitions(spark, tmp_path):
    """Reading one gold_processing_date must scan only that partition —
    the pruning the reference's date column existed for but never got."""
    from employee_activity_etl_poc_spark.plans.gold_jobs import run_full_refresh
    from employee_activity_etl_poc_spark.sources.generator import (
        synthetic_activities,
        synthetic_employees,
    )

    from employee_activity_etl_poc_spark.plans.gold_jobs import enrich_activities
    from employee_activity_etl_poc_spark.sources.sinks import write_delta

    acts = synthetic_activities(spark, 30, n_employees=10).withColumn(
        "processing_ts", F.lit("2024-06-01 00:00:00").cast("timestamp")
    )
    hr = synthetic_employees(spark, 10)
    sports = hr.select("employee_id", F.lit("Oui").alias("practices_sport"))
    # two runs with different injected "now" -> two date partitions
    run_full_refresh(
        acts, sports, hr, str(tmp_path / "g"),
        now=F.lit("2024-06-01 12:00:00").cast("timestamp"),
    )
    day2 = enrich_activities(
        acts, sports, hr, now=F.lit("2024-06-02 12:00:00").cast("timestamp")
    )
    write_delta(
        day2, str(tmp_path / "g"), mode="append",
        partition_by=["gold_processing_date"],
    )

    df = spark.read.parquet(str(tmp_path / "g")).where(
        F.col("gold_processing_date") == "2024-06-02"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2024-06-02" in plan
    assert df.count() == 30


def test_round3_plans_have_scale_shapes(spark, sf_dir):
    """Round-3 additions keep the claimed plan properties."""
    # DF-pruning: frequent-shingle set joins as a broadcast (anti) join,
    # never a shuffled sort-merge against the corpus
    plan = _plan(REGISTRY["dedup_minhash_df_pruned"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # mixture fractions (|strata| rows) broadcast onto the corpus
    plan = _plan(REGISTRY["token_budget_mixture"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # trailing RANGE window: the user_id predicate reaches the scan
    plan = _plan(REGISTRY["events_trailing_hour_sum"].fn(spark, sf_dir))
    assert "LessThan(user_id,10)" in plan.replace(" ", "").replace("\n", "")
    # SCD2: one window pass, no self-join
    plan = _plan(REGISTRY["cdc_scd2_history"].fn(spark, sf_dir))
    assert "Join" not in plan


def test_round4_plans_have_scale_shapes(spark, sf_dir):
    """Round-4 additions keep the claimed plan properties."""
    # bloom probe: membership tests are plain Filter before the semi-join
    # (no Python eval), and the semi-join against the distinct build keys
    # broadcasts — the probe never sort-merge-shuffles
    plan = _plan(REGISTRY["events_bloom_pruned_building"].fn(spark, sf_dir))
    assert "shiftright" in plan and "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan
    # per-domain cap: the over-cap group list rides broadcast on BOTH the
    # anti (tail passthrough) and semi (head ranking) branches
    plan = _plan(REGISTRY["documents_domain_cap"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "LeftAnti" in plan and "LeftSemi" in plan
    # CMS estimates: the sketch side (<= d*w rows) broadcasts onto the
    # probe hashes, never a shuffled join
    plan = _plan(REGISTRY["events_user_cms_counts"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
