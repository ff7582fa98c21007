"""DDL/catalog (S13/P10) and upsert-new (J5) tests."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from employee_activity_etl_poc_spark.operators.relational import upsert_new
from employee_activity_etl_poc_spark.sources.catalog import (
    create_table_if_not_exists,
    is_readable_table,
    register_views,
    table_exists,
)


def test_create_table_if_not_exists_idempotent(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    create_table_if_not_exists(
        spark, "t_ddl_test", schema, location=str(tmp_path / "t")
    )
    create_table_if_not_exists(  # second call is a no-op, not an error
        spark, "t_ddl_test", schema, location=str(tmp_path / "t")
    )
    assert table_exists(spark, "t_ddl_test")
    spark.sql("INSERT INTO t_ddl_test VALUES (1, 'a')")
    assert spark.table("t_ddl_test").count() == 1
    spark.sql("DROP TABLE t_ddl_test")


def test_register_views_sql_surface(spark):
    df = spark.range(5).withColumn("v", F.col("id") * 2)
    register_views(spark, {"v_test": df})
    assert spark.sql("SELECT sum(v) AS s FROM v_test").collect()[0]["s"] == 20


def test_is_readable_table(spark, tmp_path):
    good = tmp_path / "good"
    spark.range(3).write.parquet(str(good))
    assert is_readable_table(spark, str(good))
    assert not is_readable_table(spark, str(tmp_path / "missing"))


def test_upsert_new_inserts_only_absent_keys(spark):
    existing = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    incoming = spark.createDataFrame([(2, "B"), (3, "c")], ["id", "v"])
    out = upsert_new(existing, incoming, "id").orderBy("id").collect()
    assert [(r["id"], r["v"]) for r in out] == [(1, "a"), (2, "b"), (3, "c")]
