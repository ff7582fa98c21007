"""The reference's COMPLETE lifecycle (SURVEY §3.1-3.3) as one composable,
locally-runnable pipeline — what a user of the reference actually runs,
end to end:

  generate activities (S15)            [stands in for the Postgres OLTP]
    → Debezium-style JSON to a topic dir (S1 stand-in)
    → streaming bronze ingest: parse, dedup, checkpointed sink (§3.1)
    → gold enrichment: broadcast dims, metadata stamps, partitioned write
      + CSV mirror (§3.2)
    → wellness KPIs (A7-A9) + per-mode commute analytics
    → notification messages through the backlog-compressing sink (§3.3)

Every stage is one of the tested operators; this module only composes
them. Returns the artifacts so tests (and users) can assert each layer.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import kpi
from ..plans.gold_jobs import run_full_refresh
from ..sources.generator import (
    synthetic_activities,
    synthetic_employees,
    to_cdc_json,
)
from ..sources.sinks import write_csv
from ..streaming import (
    activity_message,
    bronze_ingest,
    file_cdc_stream,
    make_notifier,
    parse_cdc_envelope,
    run_to_completion,
)


@dataclass
class PipelineArtifacts:
    bronze: DataFrame
    gold: DataFrame
    kpis: DataFrame
    messages_sent: list[str]
    paths: dict[str, str]


def run_end_to_end(
    spark: SparkSession,
    workdir: str,
    n_activities: int = 500,
    n_employees: int = 40,
    notifier_send=None,
) -> PipelineArtifacts:
    paths = {
        name: os.path.join(workdir, name)
        for name in ("topic", "bronze", "bronze_ckpt", "gold", "gold_csv")
    }
    os.makedirs(paths["topic"], exist_ok=True)

    # §3.1 source side: OLTP inserts become CDC envelopes on the "topic"
    acts = synthetic_activities(spark, n_activities, n_employees)
    wire = to_cdc_json(acts)
    lines = [r["value"] for r in wire.collect()]
    with open(os.path.join(paths["topic"], "backlog.json"), "w") as fh:
        fh.write("\n".join(lines) + "\n")

    # §3.1 bronze: stream -> parse -> watermarked dedup -> exactly-once sink
    stream = parse_cdc_envelope(file_cdc_stream(spark, paths["topic"]))
    run_to_completion(
        bronze_ingest(
            stream,
            paths["bronze"],
            paths["bronze_ckpt"],
            watermark=("start_ts", "400 days"),
        )
    )
    bronze = spark.read.parquet(paths["bronze"])

    # §3.2 gold: broadcast-dim enrichment, metadata, partitioned write
    hr = synthetic_employees(spark, n_employees)
    sports = hr.select(
        "employee_id",
        F.when(F.col("employee_id") % 3 == 0, "Non").otherwise("Oui").alias(
            "practices_sport"
        ),
    )
    gold = run_full_refresh(bronze, sports, hr, paths["gold"])
    write_csv(gold.drop("gold_processing_ts"), paths["gold_csv"])  # S8 mirror

    # BI layer: qualification + the three DAX KPIs
    counts = kpi.summarize_per_entity(gold, ["employee_id"])
    qual = kpi.with_qualification_flags(
        hr.join(F.broadcast(counts), "employee_id", "left").withColumn(
            "total_line_count", F.coalesce("total_line_count", F.lit(0))
        ),
        F.lower(F.trim("transport_mode")).isin(
            "marche/running", "vélo/trottinette/autres"
        ),
    )
    kpis = kpi.wellness_totals(qual)

    # §3.3 notifications: batch-0 backlog compression over the bronze rows
    sent: list[str] = []
    notifier = make_notifier(notifier_send or sent.append, max_buffer_size=5)
    notifier(bronze.select("start_ts", activity_message().alias("message")), 0)

    return PipelineArtifacts(bronze, gold, kpis, sent, paths)
