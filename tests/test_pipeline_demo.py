"""End-to-end pipeline demo: every layer of the reference's lifecycle
produced, persisted, and consistent with the generator's ground truth."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from employee_activity_etl_poc_spark.plans.pipeline_demo import run_end_to_end
from employee_activity_etl_poc_spark.sources.generator import synthetic_activities


def test_pipeline_end_to_end(spark, tmp_path):
    art = run_end_to_end(spark, str(tmp_path), n_activities=200, n_employees=20)

    # bronze: every generated activity landed exactly once
    truth = synthetic_activities(spark, 200, 20)
    assert art.bronze.count() == 200
    assert art.bronze.select("activity_id").distinct().count() == 200
    b = {r["activity_id"]: r["sport_type"] for r in art.bronze.collect()}
    t = {r["activity_id"]: r["sport_type"] for r in truth.collect()}
    assert b == t

    # gold: enrichment columns + partitioned layout + CSV mirror on disk
    for c in ("practices_sport", "transport_mode", "salary", "gold_processing_date"):
        assert c in art.gold.columns
    assert art.gold.count() == 200
    part_dirs = [
        d for d in os.listdir(art.paths["gold"]) if d.startswith("gold_processing_date=")
    ]
    assert part_dirs
    csv_back = (
        spark.read.option("header", "true").csv(art.paths["gold_csv"])
    )
    assert csv_back.count() == 200

    # KPIs: one row, internally consistent with the qualification inputs
    kpi_row = art.kpis.collect()[0]
    per_emp = truth.groupBy("employee_id").count()
    n_qualified = per_emp.where(F.col("count") > 5).count()
    assert kpi_row["total_wellness_days"] == 5 * n_qualified
    assert kpi_row["total_prime_sportive"] >= 0.0

    # notifications: compressed backlog (summary + newest 5)
    assert len(art.messages_sent) == 6
    assert "195" in art.messages_sent[0]  # skipped count in the summary
    assert all("a fait" in m for m in art.messages_sent[1:])
