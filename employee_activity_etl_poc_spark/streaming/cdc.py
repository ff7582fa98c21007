"""CDC envelope parsing + streaming sources (SURVEY §2.1 S1/S2, §2.2 P1,
§2.8 ST8).

The reference consumes Debezium JSON envelopes from Redpanda with a Python
poll loop and per-message dict munging (``bronze/redPandaToDeltaLake.py:
114-211``); its own Spark prototype sketches the declarative version at
``bronze/consume_data2.py:24-39``. Here that prototype becomes the real
path: one ``from_json`` projection works identically on a batch DataFrame
(tests, backfills) and a streaming one (Kafka/file source) — the parse is a
pure column transform, so the streaming/batch split costs nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import CDC_ENVELOPE

# Debezium op codes (bronze/redPandaToDeltaLake.py:92, slack_notifier.py:110):
# c=insert, u=update, d=delete, r=snapshot read.
OP_INSERT = "c"


def parse_cdc_envelope(
    df: DataFrame,
    value_col: str = "value",
    ops: tuple[str, ...] = (OP_INSERT,),
    processing_ts: Column | None = None,
) -> DataFrame:
    """P1/ST8/F1: envelope -> canonical bronze rows.

    ``from_json(value)`` -> keep ``payload.op`` in ``ops`` (insert-only by
    default, the tombstone/update skip at ``redPandaToDeltaLake.py:90-93``)
    -> project ``payload.after.*`` -> µs-epoch longs to timestamps
    (``timestamp_micros``; exact, UTC — the deliberate divergence from the
    reference's machine-local ``datetime.fromtimestamp``) -> stamp
    ``processing_ts`` (``redPandaToDeltaLake.py:86``).

    ``processing_ts`` is injectable so tests are deterministic; production
    leaves the default ``current_timestamp()``.
    """
    parsed = df.select(
        F.from_json(F.col(value_col).cast("string"), CDC_ENVELOPE).alias("env")
    )
    return (
        parsed.where(F.col("env.payload.op").isin(*ops))
        .select("env.payload.after.*")
        .select(
            "activity_id",
            "employee_id",
            F.timestamp_micros(F.col("start_us")).alias("start_ts"),
            "sport_type",
            "distance_m",
            F.timestamp_micros(F.col("end_us")).alias("end_ts"),
            "comment",
            (
                processing_ts if processing_ts is not None else F.current_timestamp()
            ).alias("processing_ts"),
        )
    )


def parse_cdc_with_quarantine(
    df: DataFrame,
    value_col: str = "value",
    ops: tuple[str, ...] = (OP_INSERT,),
    processing_ts: Column | None = None,
) -> DataFrame:
    """Envelope parse that KEEPS malformed input instead of silently
    dropping it: rows where ``from_json`` fails (or the payload lacks an
    ``after``) come back with ``quarantined=true`` and the raw bytes in
    ``raw_value`` — route them to a dead-letter sink and alert, the
    standard production posture. (The reference logged-and-skipped,
    ``bronze/redPandaToDeltaLake.py:88-93``; ``parse_cdc_envelope`` keeps
    that lean shape for trusted topics.)

    One added column, same single-pass plan; the good-row output is
    identical to ``parse_cdc_envelope``'s.
    """
    raw = F.col(value_col).cast("string")
    parsed = df.select(
        raw.alias("raw_value"),
        F.from_json(raw, CDC_ENVELOPE).alias("env"),
    )
    bad = F.col("env").isNull() | F.col("env.payload.after").isNull()
    wanted_op = F.col("env.payload.op").isin(*ops)
    return (
        parsed.where(bad | wanted_op)
        .select(
            "env.payload.after.*",
            bad.alias("quarantined"),
            F.when(bad, F.col("raw_value")).alias("raw_value"),
        )
        .select(
            "activity_id",
            "employee_id",
            F.timestamp_micros(F.col("start_us")).alias("start_ts"),
            "sport_type",
            "distance_m",
            F.timestamp_micros(F.col("end_us")).alias("end_ts"),
            "comment",
            (
                processing_ts if processing_ts is not None else F.current_timestamp()
            ).alias("processing_ts"),
            "quarantined",
            "raw_value",
        )
    )


def apply_cdc_batch(
    snapshot: DataFrame | None,
    changes: DataFrame,
    key: str = "activity_id",
    seq_col: str = "seq",
) -> DataFrame:
    """Fold a micro-batch of CDC changes (op ∈ c/u/d + full row images)
    into a table snapshot — the operator the reference never built (it
    processed inserts only and ignored updates/deletes, ``slack_bot/
    slack_notifier.py:110-111``).

    Per key, only the HIGHEST-``seq_col`` change in the batch wins (Kafka
    partitions preserve per-key order; ``seq`` is the offset or a
    monotonically increasing change id). Then: delete drops the key,
    insert/update upserts the ``after`` image. Runs identically as a batch
    backfill or inside ``foreachBatch`` (where the sink does Delta MERGE).

    ``changes`` columns: ``op``, ``seq_col``, and the row image columns.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    upserts = latest.where(F.col("op") != "d").drop("op", seq_col)
    if snapshot is None:
        return upserts
    # rows untouched by this batch survive; deleted keys drop implicitly
    # (anti-joined away from the snapshot, filtered out of the upserts)
    survivors = snapshot.join(latest.select(key), key, "left_anti")
    return survivors.unionByName(upserts)


def scd2_history(
    changes: DataFrame,
    key: str = "activity_id",
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a CDC change log:
    every insert/update opens a version valid over
    ``[valid_from, valid_to)``; the next change on the key (including a
    delete) closes it; the open version carries ``valid_to = NULL`` and
    ``is_current = true``. Deletes close the prior version without opening
    one — a deleted key simply has no current row.

    The whole history is ONE window pass (lead over the per-key change
    order) — no iteration, no self-join; at 100 TB the shuffle is the
    per-key sort Spark needs anyway, and AQE handles key skew. Intervals
    are in ``seq_col`` units (offset or change-id); join a fact to its
    as-of dimension version with ``fact.seq >= valid_from AND (valid_to
    IS NULL OR fact.seq < valid_to)`` — the bin-bucketed range join
    (``operators/rangejoin.py``) is the scale path for that probe.

    The reference never versioned its dimensions (gold overwrote history,
    ``gold/bronzeToGold.py:204``); this is the standard warehouse answer.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(seq_col).asc())
    nxt = F.lead(seq_col).over(w)
    return (
        changes.withColumn("valid_to", nxt)
        .where(F.col(op_col) != "d")
        .select(
            *[c for c in changes.columns if c not in (op_col, seq_col)],
            F.col(seq_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S1/S2: Kafka/Redpanda streaming source.

    Replaces the reference's KafkaConsumer poll loop (``redPandaToDeltaLake.
    py:114-121``) and its manual seek-to-beginning replay (``:25-46``) —
    ``startingOffsets=earliest`` + a fresh checkpoint dir IS the replay
    path; offsets live in the checkpoint, not in a broker consumer group,
    which is what makes the Delta/parquet sink exactly-once (ST4 fix).

    ``maxOffsetsPerTrigger`` subsumes the BATCH_SIZE=10 count trigger (ST1)
    as a per-micro-batch rate cap. Needs the spark-sql-kafka package on the
    cluster; unit tests use :func:`file_cdc_stream` instead.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def file_cdc_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based stand-in source for the Kafka topic (SURVEY §7 step 6):
    each text file is a batch of envelope JSON lines, yielding the same
    ``value: string`` column the Kafka source produces. Used by tests and
    by replay-from-archive backfills (topics are routinely mirrored to
    object storage at scale — this source IS that replay path)."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.format("text").load(path)
