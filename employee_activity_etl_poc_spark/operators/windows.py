"""Event-time windowed aggregations (tumbling / sliding / session).

The reference has NO event-time windows — its only time notion is arrival
order plus a high-watermark column (SURVEY §2.8). These are the engine's
streaming-era extension: the same expressions work in batch (tested against
the DuckDB oracle) and under ``readStream`` + ``withWatermark`` (bounded
state). All windows are UTC, epoch-aligned — Spark's ``window()`` origin —
so results are engine-portable.

Scale notes: a windowed groupBy shuffles on (window, keys); tumbling gives
each row ONE window (cheapest), a sliding window of length L step S
replicates each row L/S times before the shuffle — keep L/S small or
pre-aggregate to tumbling S then roll up. Session windows need a merge —
Spark handles it natively via ``session_window`` (sort-based within key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Fixed non-overlapping windows: one shuffle, map-side partial agg.
    Output carries window_start/window_end columns."""
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), *keys)
        .agg(*aggs)
        .withColumns({"window_start": F.col("w.start"), "window_end": F.col("w.end")})
        .drop("w")
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Overlapping windows (length ``duration``, step ``slide``): each row
    feeds duration/slide windows. Same output shape as tumbling."""
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("w"), *keys)
        .agg(*aggs)
        .withColumns({"window_start": F.col("w.start"), "window_end": F.col("w.end")})
        .drop("w")
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Gap-based sessions per key: events closer than ``gap`` merge into one
    session; ``window_end`` = last event + gap (Spark ``session_window``
    semantics: a new session starts when the inter-event gap is >= ``gap``).
    """
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(*aggs)
        .withColumns({"session_start": F.col("w.start"), "session_end": F.col("w.end")})
        .drop("w")
    )
