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


def test_idle_sessions_close_on_timeout(spark, tmp_path):
    import time

    from employee_activity_etl_poc_spark.streaming.stateful import (
        idle_closing_sessions,
    )

    src = tmp_path / "topic"
    sink = tmp_path / "sessions"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    acts = synthetic_activities(spark, 12, n_employees=2).cache()
    emp_a = acts.where(F.col("employee_id") == 1)
    emp_b = acts.where(F.col("employee_id") == 2)
    assert emp_a.count() > 0 and emp_b.count() > 0

    def write_batch(df, name):
        lines = [r["value"] for r in to_cdc_json(df).collect()]
        (src / name).write_text("\n".join(lines) + "\n")

    def run_once():
        stream = parse_cdc_envelope(file_cdc_stream(spark, str(src)))
        q = (
            idle_closing_sessions(stream, timeout_ms=200)
            .writeStream.foreachBatch(
                lambda b, _id: b.write.mode("append").parquet(str(sink))
            )
            .outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        # ProcessingTimeTimeout keeps availableNow queries alive (pending
        # timers count as work), so don't wait the full default timeout —
        # a few seconds is enough for the data batches + one timer sweep
        run_to_completion(q, timeout_s=10)

    write_batch(emp_a, "b0.json")
    run_once()
    rows1 = spark.read.parquet(str(sink)).collect()
    # the open session row is emitted with the full batch count; the
    # timeout may already fire in a trailing micro-batch of the same run
    assert (1, False) in {(r["employee_id"], r["closed"]) for r in rows1}
    assert all(r["n_activities"] == emp_a.count() for r in rows1)

    time.sleep(1.0)  # let employee 1's 200ms idle timeout lapse
    write_batch(emp_b, "b1.json")  # any new batch triggers timeout sweep
    run_once()
    rows = spark.read.parquet(str(sink)).collect()
    closed_a = [r for r in rows if r["closed"] and r["employee_id"] == 1]
    # exactly ONE closed session for the idle key, with the complete count,
    # and its state is gone (no rows for employee 1 after the close)
    assert len(closed_a) == 1
    assert closed_a[0]["n_activities"] == emp_a.count()
    open_b = [r for r in rows if r["employee_id"] == 2 and not r["closed"]]
    assert open_b and open_b[0]["n_activities"] == emp_b.count()
