"""Table profiling — per-column statistics in ONE scan (null rate, distinct
count, min/max, mean where numeric).

The reference eyeballed health via ad-hoc prints (`readSampleDelta.py:
67-71`, `bronzeToGold.py:209-229`); this is the systematic form: one
aggregation row per column, computed in a single pass (every stat is an
aggregate over the same scan — Catalyst fuses them), emitted long-format so
the profile of a 500-column table is 500 rows, not 500 columns.

At 100 TB: swap ``countDistinct`` for ``approx_count_distinct`` (HLL) —
exact distinct on a wide table is the one stat here that doesn't scale;
kept exact for the hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}


def profile_table(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Long-format profile: (column, n, n_null, n_distinct, min_str,
    max_str, mean) — one row per column, one scan total."""
    cols = columns or df.columns
    types = dict(df.dtypes)
    distinct = F.approx_count_distinct if approx else F.countDistinct

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            distinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
            (
                F.avg(c) if types[c].split("(")[0] in _NUMERIC else F.lit(None).cast("double")
            ).alias(f"{c}__mean"),
        ]
    wide = df.agg(*aggs)

    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n"),
                F.col(f"{c}__nulls").alias("n_null"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
                F.round(f"{c}__mean", 4).alias("mean"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


def profile_drift(
    baseline: DataFrame, current: DataFrame, rel_threshold: float = 0.1
) -> DataFrame:
    """Compare two profiles (same long format) and flag drifted columns:
    null-RATE change beyond ``rel_threshold`` (absolute), or mean /
    distinct-count relative change beyond it. The profile(t) vs
    profile(t-1) alert every scheduled pipeline should run after loading.
    """
    b = baseline.select(
        "column",
        (F.col("n_null") / F.col("n")).alias("b_null_rate"),
        F.col("n_distinct").alias("b_distinct"),
        F.col("mean").alias("b_mean"),
    )
    c = current.select(
        "column",
        (F.col("n_null") / F.col("n")).alias("c_null_rate"),
        F.col("n_distinct").alias("c_distinct"),
        F.col("mean").alias("c_mean"),
    )

    def rel(a, bb):
        return F.when(bb == 0, F.when(a == 0, 0.0).otherwise(1.0)).otherwise(
            F.abs(a - bb) / F.abs(bb)
        )

    j = b.join(c, "column", "full")
    return j.select(
        "column",
        F.round(F.abs(F.col("c_null_rate") - F.col("b_null_rate")), 4).alias(
            "null_rate_delta"
        ),
        F.round(rel(F.col("c_distinct"), F.col("b_distinct")), 4).alias(
            "distinct_rel_change"
        ),
        F.round(rel(F.col("c_mean"), F.col("b_mean")), 4).alias("mean_rel_change"),
    ).withColumn(
        "drifted",
        (F.col("null_rate_delta") > rel_threshold)
        | (F.col("distinct_rel_change") > rel_threshold)
        | F.coalesce(F.col("mean_rel_change") > rel_threshold, F.lit(False)),
    )
