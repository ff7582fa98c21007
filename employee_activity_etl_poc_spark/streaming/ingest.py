"""Streaming ingest + incremental gold (SURVEY §2.1 S3/S5, §2.8 ST1-ST7).

Bronze: the reference's count-or-idle flush loop with an in-memory dedup set
(``bronze/redPandaToDeltaLake.py:135-211`` — ST1/ST4; the set is lost on
restart, so replays duplicate into Delta) becomes one ``writeStream`` with a
real checkpoint (ST3: the reference left ``checkpointLocation: ""`` at
``bronze/consume_data2.py:45``) and watermarked ``dropDuplicates`` — the
restart-duplication bug is structurally gone: source offsets and sink commits
live in the same checkpoint, so every row lands exactly once.

Gold: the reference re-reads the ENTIRE gold table to compute one max
timestamp, then the entire bronze to filter on it (``gold/bronzeToGold2.py:
38-110`` — ST6). ``Trigger.AvailableNow`` streaming from the bronze files is
the idiomatic replacement: the checkpoint IS the high-watermark, only new
files are read, and the job still terminates like a batch job.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_stream(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    output_mode: str = "append",
    available_now: bool = True,
    processing_time: str | None = None,
    partition_by: list[str] | None = None,
) -> StreamingQuery:
    """S3/ST2/ST3: append sink with checkpoint.

    ``fmt="delta"`` on clusters with the Delta jar (exactly-once via the
    Delta log); the parquet file sink gives the same guarantee through its
    ``_spark_metadata`` commit log. ``available_now=True`` = drain backlog
    then stop (the batch-like mode every test and backfill uses);
    ``processing_time`` = long-running micro-batch cadence (the reference's
    5-minute trigger, ``spark_consumer/spark_consumer.py:36``).
    """
    writer = (
        df.writeStream.format(fmt)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .option("path", path)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def bronze_ingest(
    parsed: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    dedup_key: str = "activity_id",
    watermark: tuple[str, str] = ("start_ts", "30 days"),
    **trigger_kwargs,
) -> StreamingQuery:
    """ST4 fixed: watermarked per-key dedup, then exactly-once append.

    ``withWatermark + dropDuplicates`` keeps only bounded state (keys within
    the lateness horizon) on the executors — the scale-safe version of the
    reference's unbounded, restart-lossy ``processed_ids`` set
    (``redPandaToDeltaLake.py:134,179-181``).

    ``within_watermark=True`` switches to Spark 3.5+'s
    ``dropDuplicatesWithinWatermark``: duplicates are collapsed even when
    their EVENT TIMES differ (re-sends commonly re-stamp timestamps —
    classic ``dropDuplicates`` treats those as distinct rows when the ts
    column is part of identity, and keeps state keyed on first-seen event
    time). State is still bounded by the watermark delay; the first
    arrival wins.
    """
    deduped = parsed.withWatermark(*watermark)
    deduped = (
        deduped.dropDuplicatesWithinWatermark([dedup_key])
        if trigger_kwargs.pop("within_watermark", False)
        else deduped.dropDuplicates([dedup_key])
    )
    return write_stream(deduped, path, checkpoint, fmt=fmt, **trigger_kwargs)


def incremental_foreach_batch(
    source: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    sink: Callable[[DataFrame, int], None],
    checkpoint: str,
    available_now: bool = True,
    processing_time: str | None = None,
) -> StreamingQuery:
    """ST6: incremental job runner — ``transform`` is the same pure
    DataFrame->DataFrame function the batch pipeline uses (joins with dims,
    derived columns, ...); ``sink`` commits each micro-batch (table append,
    JDBC upsert via S11, CSV mirror via S8...). The checkpoint replaces the
    hand-rolled high-watermark column scan (``gold/bronzeToGold2.py:38-50``).
    """
    writer = source.writeStream.foreachBatch(
        lambda batch_df, batch_id: sink(transform(batch_df), batch_id)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def run_to_completion(query: StreamingQuery, timeout_s: float = 120.0) -> None:
    """ST7: drain an availableNow query and stop cleanly. The reference
    needed SIGINT handlers + a manual residual flush (``redPandaToDeltaLake.
    py:67-70,213-216``); with checkpointed sinks stop() loses nothing."""
    try:
        if not query.awaitTermination(timeout_s):
            query.stop()
    finally:
        if query.isActive:  # pragma: no cover - defensive
            query.stop()
