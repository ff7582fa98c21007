"""As-of join — the canonical time-series operator Spark lacks as a
primitive, built from one shuffle + one sorted window pass.

For every left row, attach the latest right row with the same key and
``right.ts <= left.ts`` (backward direction; inclusive). The classic
implementations either broadcast the right side (dies at scale) or
per-key ``applyInPandas`` with ``merge_asof`` (Python in the hot path).
This one is pure JVM:

1. tag and union both sides (right rows carry their payload, left rows
   carry nulls in those slots);
2. one window per payload column: ``last(col, ignorenulls=True)`` over
   (key, ordered by ts, with right-before-left tie order) — each left row
   sees the most recent right payload at or before its timestamp;
3. keep only left rows.

Cost: ONE shuffle on the key + an in-partition sort — the same price as a
plain equi-join of the two tables, independent of time skew. An optional
``tolerance`` bounds how stale the match may be (nulls beyond it), which
also bounds how long a right row stays relevant.

The right side must be unique per (key, ts) — pre-aggregate duplicates
first, otherwise "the" row at a timestamp is ambiguous (DuckDB's ASOF has
the same requirement for deterministic output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    payload_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward (<=) as-of join; payload columns arrive as ``<col>_asof``
    plus ``<ts_col>_asof`` (the matched right timestamp, null if no match).
    """
    l_tag = left.withColumn("_side", F.lit(1))
    for c in payload_cols:
        l_tag = l_tag.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    l_tag = l_tag.withColumn("__r_ts", F.lit(None).cast("timestamp"))

    r_tag = right.select(
        F.col(key),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"__r_{c}") for c in payload_cols],
        F.col(ts_col).alias("__r_ts"),
    )
    left_cols = [c for c in left.columns]
    u = l_tag.select(
        *left_cols, "_side", *[f"__r_{c}" for c in payload_cols], "__r_ts"
    ).unionByName(r_tag, allowMissingColumns=True)

    # right rows (side 0) sort before left rows (side 1) at equal ts ->
    # a right row exactly at left.ts IS visible (inclusive semantics)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u
    for c in [*[f"__r_{c}" for c in payload_cols], "__r_ts"]:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))

    out = filled.where(F.col("_side") == 1).drop("_side")
    if tolerance_seconds is not None:
        stale = (
            F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("__r_ts"))
        ) > tolerance_seconds * 1_000_000
        for c in [*[f"__r_{c}" for c in payload_cols], "__r_ts"]:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
    renames = {f"__r_{c}": f"{c}_asof" for c in payload_cols}
    renames["__r_ts"] = f"{ts_col}_asof"
    return out.withColumnsRenamed(renames)
