"""Slack-style notification sink (SURVEY §2.1 S14, §2.8 ST5, §2.5 W3).

The reference's slack bot consumes the CDC topic, formats a French
motivational message per activity, and on startup compresses the backlog:
announce it, emit only the LAST ``max_buffer_size=5`` messages with pacing,
note how many were skipped (``slack_bot/slack_notifier.py:107-149,
184-286``).

Spark-first shape: message TEXT is built as pure column expressions (F11-F14
— the per-row Python formatting deleted); the side effect is a
``foreachBatch`` sink with batch-0 backlog compression. Delivery is
inherently at-least-once (a webhook can't participate in the checkpoint
transaction — documented divergence; the Delta/parquet sink is the
exactly-once system of record).
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import scalars as S

# sport code/name -> emoji, slack_bot/config.json sport_emojis
SPORT_EMOJIS = {
    "Vélo": "🚴",
    "Course à pied": "🏃",
    "Marche": "🚶",
    "Natation": "🏊",
    "Escalade": "🧗",
    "Tennis": "🎾",
}


def activity_message(full_name: Column | None = None) -> Column:
    """F11-F14: the notification text as ONE column expression over canonical
    bronze rows (``format_slack_message``, ``slack_notifier.py:107-149``):
    emoji + sport label, human French duration, distance label, optional
    comment suffix."""
    label = S.map_code("sport_type", S.SPORT_CODE_NAMES, "activité sportive")
    # full names already canonical (generator) pass through; single-letter
    # CDC codes map through the code dim
    label = F.when(F.col("sport_type").isin(*S.SPORT_CODE_NAMES.values()), F.col("sport_type")).otherwise(label)
    emoji = S.map_code(label, SPORT_EMOJIS, "💪")
    who = full_name if full_name is not None else F.concat(
        F.lit("Employé "), F.col("employee_id").cast("string")
    )
    dur = S.human_duration_fr(S.elapsed_seconds("start_ts", "end_ts"))
    dist = F.when(
        F.col("distance_m").isNotNull(),
        F.concat(F.lit(" ("), S.distance_label(F.col("distance_m")), F.lit(")")),
    ).otherwise(F.lit(""))
    cmt = F.when(
        F.col("comment").isNotNull() & (F.col("comment") != ""),
        F.concat(F.lit(' — "'), F.col("comment"), F.lit('"')),
    ).otherwise(F.lit(""))
    return F.concat(
        emoji,
        F.lit(" "),
        who,
        F.lit(" a fait "),
        label,
        F.lit(" pendant "),
        dur,
        dist,
        F.lit(" 👏"),
        cmt,
    )


def make_notifier(
    send: Callable[[str], None],
    max_buffer_size: int = 5,
    delay_s: float = 0.0,
    order_col: str = "start_ts",
    message_col: str = "message",
) -> Callable[[DataFrame, int], None]:
    """ST5/W3: foreachBatch handler with startup-backlog compression.

    Batch 0 is the accumulated backlog (earliest offsets): announce the
    skipped count, then send only the newest ``max_buffer_size`` messages
    (top-k by ``order_col`` — the reference's ``buffered_messages[-5:]``),
    paced ``delay_s`` apart. Every later batch is live traffic: send all.

    ``send`` is the injected side-effect client (Slack webhook in prod, a
    recording fake in tests — external APIs never run in tests, SURVEY §7
    risk register).
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        df = batch_df.select(F.col(order_col).alias("_ord"), F.col(message_col))
        if batch_id == 0:
            total = df.count()
            rows = df.orderBy(F.col("_ord").desc()).limit(max_buffer_size).collect()
            rows.reverse()  # oldest of the tail first, as the reference emits
            skipped = total - len(rows)
            if skipped > 0:
                send(
                    f"⏭️ Rattrapage: {skipped} activité(s) plus ancienne(s) non "
                    f"notifiée(s), voici les {len(rows)} dernières:"
                )
            for i, row in enumerate(rows):
                if i and delay_s:
                    time.sleep(delay_s)
                send(row[message_col])
            return
        # live path: toLocalIterator streams one partition at a time to
        # the driver (ordering preserved from the sort) — an unthrottled
        # backlog batch never materializes whole in driver memory, while
        # the paced per-message sends proceed exactly as before
        first = True
        for row in df.orderBy("_ord").toLocalIterator():
            if not first and delay_s:
                time.sleep(delay_s)
            first = False
            send(row[message_col])

    return handle
