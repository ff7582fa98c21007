"""Stateful streaming operator tests: per-key state accumulates across
micro-batches AND across query restarts (checkpointed state store)."""

from __future__ import annotations

from pyspark.sql import functions as F

from employee_activity_etl_poc_spark.sources.generator import (
    synthetic_activities,
    to_cdc_json,
)
from employee_activity_etl_poc_spark.streaming import (
    file_cdc_stream,
    parse_cdc_envelope,
    run_to_completion,
)
from employee_activity_etl_poc_spark.streaming.stateful import (
    running_activity_profile,
)


def test_running_profile_accumulates_across_restarts(spark, tmp_path):
    src = tmp_path / "topic"
    sink = tmp_path / "profiles"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    acts = synthetic_activities(spark, 30, n_employees=3).cache()
    first = acts.where(F.col("activity_id") <= 18)
    second = acts.where(F.col("activity_id") > 18)

    def write_batch(df, name):
        lines = [r["value"] for r in to_cdc_json(df).collect()]
        (src / name).write_text("\n".join(lines) + "\n")

    def run_once():
        stream = parse_cdc_envelope(file_cdc_stream(spark, str(src)))
        q = (
            running_activity_profile(stream)
            .writeStream.foreachBatch(
                # update-mode output: the file sink is append-only, so the
                # refreshed profile rows land via foreachBatch (in prod this
                # is a Delta MERGE keyed on employee_id)
                lambda batch, _id: batch.write.mode("append").parquet(str(sink))
            )
            .outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        run_to_completion(q)

    write_batch(first, "b0.json")
    run_once()
    out1 = spark.read.parquet(str(sink))
    # latest profile per employee reflects the first 18 activities
    latest1 = {
        r["employee_id"]: r["n_activities"]
        for r in out1.groupBy("employee_id")
        .agg(F.max("n_activities").alias("n_activities"))
        .collect()
    }
    expected1 = {
        r["employee_id"]: r["n"]
        for r in first.groupBy("employee_id").agg(F.count("*").alias("n")).collect()
    }
    assert latest1 == expected1

    # restart with more data: state restored from checkpoint, counts continue
    write_batch(second, "b1.json")
    run_once()
    out2 = spark.read.parquet(str(sink))
    latest2 = {
        r["employee_id"]: r["n_activities"]
        for r in out2.groupBy("employee_id")
        .agg(F.max("n_activities").alias("n_activities"))
        .collect()
    }
    expected_total = {
        r["employee_id"]: r["n"]
        for r in acts.groupBy("employee_id").agg(F.count("*").alias("n")).collect()
    }
    assert latest2 == expected_total

    # duration bookkeeping matches the batch computation
    total_dur = (
        out2.groupBy("employee_id")
        .agg(F.max("total_duration_s").alias("d"))
        .agg(F.sum("d"))
        .collect()[0][0]
    )
    batch_dur = acts.select(
        F.sum(
            (F.unix_micros("end_ts") - F.unix_micros("start_ts")) / 1_000_000
        ).cast("long")
    ).collect()[0][0]
    assert total_dur == batch_dur
