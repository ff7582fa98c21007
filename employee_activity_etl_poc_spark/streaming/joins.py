"""Stream-stream joins (watermarked, bounded state).

The reference joins only stream-to-static (dims read once per batch,
``gold/bronzeToGold2.py:126-145``); its CDC stream never meets another
stream. This module is the engine's streaming-era extension: correlate two
live streams — e.g. click→purchase attribution, activity→notification
receipts — without landing either to storage first.

Scale contract: an unbounded stream-stream join would buffer both sides
forever. The interval join bounds state on BOTH sides: each watermark
bounds how late its side can arrive, and the interval condition bounds how
long a row can still find partners — Spark evicts a buffered left row once
``watermark(right) > left_ts + upper``, so state is
O(rate × (watermark + interval)), independent of stream lifetime. Both
sides shuffle on the equi-key; the range condition is evaluated within the
key's state store, never as a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    upper: str = "1 hour",
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join right-side rows occurring in ``[left_ts, left_ts + upper]``
    with the same ``key`` — streaming attribution (purchase within
    ``upper`` of a click). Works identically on batch DataFrames (no-op
    watermarks), which is how the oracle tests it.

    ``how='leftOuter'`` additionally emits unmatched left rows (with null
    right columns) once the right watermark proves no partner can arrive —
    the "click that never converted" row. Outer emission REQUIRES both
    watermarks and the time bound (Spark analysis error otherwise).

    Column naming: right's key and ts — and ANY right column whose name
    also exists on the left (e.g. both sides carrying a non-key ``value``)
    — are aliased ``r_<name>`` pre-join, so the output schema is stable
    and collision-free; right-only names pass through unchanged.
    """
    renamed = set(left.columns) | {key, right_ts}
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark).select(
        *[
            F.col(c).alias(f"r_{c}") if c in renamed else F.col(c)
            for c in right.columns
        ]
    )
    cond = (
        (F.col(key) == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}") >= F.col(left_ts))
        & (F.col(f"r_{right_ts}") <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how)
