"""Range (interval-containment) join + hypertable-style cascading rollup —
the remaining time-series operators Spark has no primitive for.

**Range join**: match points to intervals (``start <= p < end``) without a
cross product. Naive theta-joins explode at scale (Spark plans them as
BroadcastNestedLoop); the binned rewrite turns containment into an
equi-join: intervals explode over the fixed-width bins they cover, points
land in exactly one bin, the join key is the bin id, and the exact
predicate filters within bins. Cost: |intervals| × avg_bins_covered +
|points|, shuffled on bin — pick the bin width near the typical interval
length so avg_bins_covered stays ~1-2.

**Hypertable rollup**: the continuous-aggregate cascade (raw → hour → day)
TimescaleDB-style: each coarser tier aggregates the PREVIOUS tier, not the
raw data — at 100 TB the daily rollup reads 24 rows per key instead of
millions. Only works for algebraic aggregates (sum/count/min/max —
avg = sum/count at the end); exactness is oracle-checked against the
direct-from-raw aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_points_intervals(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_seconds: int,
    extra_key: str | None = None,
) -> DataFrame:
    """All (point, interval) pairs with ``start <= point < end`` (plus an
    optional equi-key), via bin-bucketed equi-join. Output: all point
    columns + all interval columns."""
    p_bin = F.floor(F.unix_micros(F.col(point_ts)) / (bin_seconds * 1_000_000))
    s_bin = F.floor(F.unix_micros(F.col(start_ts)) / (bin_seconds * 1_000_000))
    # end is exclusive: the last covered bin is the one holding end - 1µs
    e_bin = F.floor(
        (F.unix_micros(F.col(end_ts)) - 1) / (bin_seconds * 1_000_000)
    )

    p = points.withColumn("_bin", p_bin)
    i = intervals.withColumn("_bin", F.explode(F.sequence(s_bin, e_bin)))

    keys = ["_bin"] + ([extra_key] if extra_key else [])
    joined = p.join(i, keys).where(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    return joined.drop("_bin")


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    tiers: list[str] = ("1 hour", "1 day"),
) -> dict[str, DataFrame]:
    """Cascading time-bucket rollups: tier N aggregates tier N-1.

    Returns {tier: DataFrame(window_start, *keys, n, total)}. Buckets are
    epoch-aligned (`window()`), so every fine bucket nests exactly in one
    coarse bucket and the cascade is exact for sum/count."""
    out: dict[str, DataFrame] = {}
    current = df.groupBy(F.window(ts_col, tiers[0]).alias("w"), *keys).agg(
        F.count("*").alias("n"), F.sum(value_col).alias("total")
    )
    current = current.select(F.col("w.start").alias("window_start"), *keys, "n", "total")
    out[tiers[0]] = current
    for tier in tiers[1:]:
        current = (
            current.groupBy(F.window("window_start", tier).alias("w"), *keys)
            .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
            .select(F.col("w.start").alias("window_start"), *keys, "n", "total")
        )
        out[tier] = current
    return out
