"""Time-series resampling: dense grids from sparse events (gap-fill +
forward-fill) — the operator family behind `resample()` in pandas and
`time_bucket_gapfill` in TimescaleDB, neither of which Spark ships.

Scale shape: one aggregate to buckets, one tiny per-key min/max aggregate,
a `sequence()` explode for the dense grid (rows ∝ key-span/step — bounded
by the caller's key filter, NEVER a cross join), one left join grid×buckets
on (key, bucket), and one ordered window for the fill. Everything shuffles
on the key; no driver-side loops, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def resample_gapfill(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Dense per-key time grid at ``step_seconds`` resolution:

    - ``bucket_us``: grid timestamp (µs epoch, step-aligned),
    - ``n``: rows in the bucket (0 for gaps),
    - ``total``: sum of ``value_col`` in the bucket (null for gaps),
    - ``total_ffill``: forward-filled ``total`` (last non-null bucket
      value carried across gaps; leading gaps stay null).

    The grid spans each key's own [min, max] bucket — keys are never
    extended to a global range (that's a caller decision), so grid size
    is Σ per-key spans, predictable from the data.
    """
    step_us = step_seconds * 1_000_000
    bucket: Column = (F.unix_micros(F.col(ts_col)) / step_us).cast("long") * step_us
    buckets = (
        df.select(*keys, bucket.alias("bucket_us"), F.col(value_col).alias("_v"))
        .groupBy(*keys, "bucket_us")
        .agg(F.count("*").alias("n"), F.sum("_v").alias("total"))
    )
    spans = buckets.groupBy(*keys).agg(
        F.min("bucket_us").alias("_mn"), F.max("bucket_us").alias("_mx")
    )
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.lit(step_us))
        ).alias("bucket_us"),
    )
    joined = grid.join(buckets, [*keys, "bucket_us"], "left").select(
        *keys,
        "bucket_us",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        "total",
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.withColumn(
        "total_ffill", F.last("total", ignorenulls=True).over(w)
    )
