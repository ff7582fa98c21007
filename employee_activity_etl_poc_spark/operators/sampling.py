"""Deterministic sampling & dataset splitting (training-data pipelines).

``df.sample``/``sampleBy`` are partition-order-dependent (Bernoulli over a
per-partition RNG stream): results change under repartitioning and can't be
replayed by another engine. These operators hash a KEY instead — a row is
in the sample iff ``u(salt, key) < fraction`` — giving samples that are:

- partition-invariant and repartition-stable,
- reproducible anywhere md5 exists (the DuckDB oracle replays them),
- consistent across tables (same key+salt → same bucket everywhere, so a
  document and all its chunks land on the same side of a split — the
  leakage-safety property naive random splits lose).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sources.generator import uniform


def keyed_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic ~``fraction`` sample by key hash."""
    return df.where(uniform(salt, F.col(key_col)) < fraction)


def stratified_keyed_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float],
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic fractions (``sampleBy`` without the RNG):
    strata absent from ``fractions`` are dropped."""
    u = uniform(salt, F.col(key_col))
    cond = F.lit(False)
    for stratum, frac in fractions.items():
        cond = cond | ((F.col(strata_col) == stratum) & (u < frac))
    return df.where(cond)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` column ('train'/'val'/'test') from the key hash:
    u < val → val, u < val+test → test, else train. Disjoint, exhaustive,
    stable under any repartitioning, and identical for every row sharing
    the key."""
    u = uniform(salt, F.col(key_col))
    return df.withColumn(
        "split",
        F.when(u < val_fraction, "val")
        .when(u < val_fraction + test_fraction, "test")
        .otherwise("train"),
    )


def split_oracle_case_sql(
    key_expr: str, val_fraction: float = 0.1, test_fraction: float = 0.1,
    salt: str = "split",
) -> str:
    """DuckDB expression replaying :func:`train_val_test_split`."""
    u = (
        f"(CAST('0x' || substr(md5('{salt}|' || {key_expr}::VARCHAR), 1, 8) AS BIGINT)"
        f" / 4294967296.0)"
    )
    return (
        f"CASE WHEN {u} < {val_fraction} THEN 'val' "
        f"WHEN {u} < {val_fraction + test_fraction} THEN 'test' "
        f"ELSE 'train' END"
    )
