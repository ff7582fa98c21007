"""The medallion gold jobs as composable pipelines (SURVEY §3.2, §7 step 5).

Reference shape (``gold/bronzeToGold.py:44-231`` full refresh,
``gold/bronzeToGold2.py:68-236`` incremental): read bronze Delta → join the
two XLSX dims → type standardization → stamp gold metadata → write gold
Delta (+ full CSV mirror), with the incremental variant filtering bronze on
a hand-read high-watermark.

Here each job is a pure ``DataFrame -> DataFrame`` transform plus a thin
writer, so the same transform serves:
- full refresh      (batch overwrite),
- incremental batch (watermark-filtered append),
- streaming         (``incremental_foreach_batch`` with AvailableNow — the
  checkpoint replaces the watermark entirely, ST6).

Gold tables are partitioned by ``gold_processing_date`` — the column the
reference created for exactly this purpose (``gold/bronzeToGold.py:183``)
but never used for pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import scalars as S
from ..operators.relational import enrich_left, high_watermark_filter, max_watermark
from ..sources.sinks import write_delta


def enrich_activities(
    bronze: DataFrame,
    sports_dim: DataFrame,
    hr_dim: DataFrame,
    now: Column | None = None,
) -> DataFrame:
    """The gold transform: bronze ⟕ sports dim ⟕ HR dim + gold metadata.

    Both dims broadcast (J1/J2 — the fact side never shuffles); collision
    columns are suffixed by ``enrich_left``, replacing the reference's
    manual duplicate-column dedup (P2/P3). ``now`` injectable for
    deterministic tests."""
    ts = now if now is not None else F.current_timestamp()
    out = enrich_left(bronze, sports_dim, "employee_id")
    out = enrich_left(out, hr_dim, "employee_id")
    return out.withColumns(
        {
            "gold_processing_ts": ts,
            "gold_processing_date": S.format_ts(ts, "yyyy-MM-dd"),
        }
    )


def run_full_refresh(
    bronze: DataFrame,
    sports_dim: DataFrame,
    hr_dim: DataFrame,
    gold_path: str,
    now: Column | None = None,
) -> DataFrame:
    """Full rebuild (S4 overwrite), partitioned for downstream pruning."""
    gold = enrich_activities(bronze, sports_dim, hr_dim, now=now)
    write_delta(
        gold, gold_path, mode="overwrite", partition_by=["gold_processing_date"]
    )
    return gold


def run_incremental(
    spark_read_gold: DataFrame | None,
    bronze: DataFrame,
    sports_dim: DataFrame,
    hr_dim: DataFrame,
    gold_path: str,
    now: Column | None = None,
) -> DataFrame:
    """Watermark-filtered incremental append (the bronzeToGold2 mode).

    The watermark read is a single-column aggregate on the gold table (the
    reference loaded the entire table for one max — ``gold/bronzeToGold2.
    py:43-45``); the bronze filter pushes into the scan. The structurally
    better mode — no watermark at all — is the streaming form in
    ``streaming/ingest.py::incremental_foreach_batch``; this batch form
    exists for parity and for engines without a checkpoint dir."""
    fresh = bronze
    if spark_read_gold is not None:
        wm = max_watermark(spark_read_gold, "processing_ts")
        if wm is not None:
            fresh = high_watermark_filter(bronze, "processing_ts", wm)
    gold = enrich_activities(fresh, sports_dim, hr_dim, now=now)
    write_delta(
        gold,
        gold_path,
        mode="append",
        merge_schema=True,
        partition_by=["gold_processing_date"],
    )
    return gold
