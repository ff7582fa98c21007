"""Catalog / DDL helpers — SURVEY §2.1 S13, §2.2 P10.

The reference creates its OLTP table with raw SQL DDL
(``Strava_Data/import_to_postgre.ipynb:60-68``) and guards jobs with
existence / ``_delta_log`` health checks plus a move-aside repair
(``gold/bronzeToGold.py:17-42``, ``gold/bronzeToGold2.py:52-66``). In
Spark the catalog IS the metastore: ``CREATE TABLE ... USING`` registers
schema + location once and every reader/writer agrees on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def create_table_if_not_exists(
    spark: SparkSession,
    name: str,
    schema: T.StructType,
    location: str | None = None,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
) -> None:
    """S13: idempotent DDL (``CREATE TABLE IF NOT EXISTS ... USING fmt``).

    ``fmt="delta"`` on Delta-enabled clusters; external when ``location``
    is given, managed otherwise."""
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    parts = (
        f" PARTITIONED BY ({', '.join(partition_by)})" if partition_by else ""
    )
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({cols}) USING {fmt}{parts}{loc}"
    )


def register_views(spark: SparkSession, tables: dict[str, DataFrame]) -> None:
    """Expose DataFrames to the SQL surface (``spark.sql`` over the same
    plans the DataFrame API builds — one optimizer, two dialects)."""
    for name, df in tables.items():
        df.createOrReplaceTempView(name)


def table_exists(spark: SparkSession, name: str) -> bool:
    """P10 guard."""
    return spark.catalog.tableExists(name)


def is_readable_table(spark: SparkSession, path: str, fmt: str = "parquet") -> bool:
    """P10: health check on a path-based table — replaces the reference's
    manual ``_delta_log`` directory inspection (``gold/bronzeToGold.py:
    17-42``). A failed read = unhealthy; no repair-by-rename (corrupt
    tables are a storage/ops problem, not something a job silently moves
    aside)."""
    try:
        spark.read.format(fmt).load(path).schema
        return True
    except Exception:
        return False
