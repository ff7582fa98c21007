"""Unit tests for the scalar column-builder library (SURVEY §2.7 F1-F17)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from employee_activity_etl_poc_spark.functions import scalars as S


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_micros_roundtrip(spark):
    us = 1_706_000_000_123_456
    row = (
        spark.range(1)
        .select(S.micros_to_timestamp(F.lit(us)).alias("ts"))
        .select(S.timestamp_to_micros("ts").alias("us"), F.col("ts"))
        .collect()[0]
    )
    assert row["us"] == us  # F1 is exact to the µs (no second truncation)


def test_format_ts(spark):
    ts = F.lit("2024-03-01 10:20:30").cast("timestamp")
    assert _one(spark, S.format_ts(ts)) == "2024-03-01 10:20:30"
    assert _one(spark, S.format_ts(ts, "yyyy-MM-dd")) == "2024-03-01"


def test_coercion_nulls_on_garbage(spark):
    assert _one(spark, S.coerce_timestamp(F.lit("not a date"))) is None
    assert _one(spark, S.coerce_double(F.lit("12.5"))) == 12.5
    assert _one(spark, S.coerce_double(F.lit("nope"))) is None


def test_elapsed_seconds(spark):
    a = F.lit("2024-01-01 00:00:00").cast("timestamp")
    b = F.lit("2024-01-01 01:30:05").cast("timestamp")
    assert _one(spark, S.elapsed_seconds(a, b)) == 5405


def test_normalize_and_flags(spark):
    assert _one(spark, S.normalize_str(F.lit("  Marche/Running "))) == "marche/running"
    assert _one(spark, S.prime_sportive(F.lit("Marche/running"))) is True
    assert _one(spark, S.prime_sportive(F.lit("Transports en commun"))) is False
    # F8: walking >15km long, bike needs >25km, null distance -> False
    assert _one(spark, S.commute_long(F.lit("Marche/running"), F.lit(16.0))) is True
    assert _one(spark, S.commute_long(F.lit("Vélo/Trottinette/Autres"), F.lit(16.0))) is False
    assert (
        _one(spark, S.commute_long(F.lit("Marche/running"), F.lit(None).cast("double")))
        is False
    )


def test_human_duration_fr(spark):
    assert _one(spark, S.human_duration_fr(F.lit(30))) == "quelques secondes"
    assert _one(spark, S.human_duration_fr(F.lit(3660))) == "1 heure(s) et 1 minute(s)"
    assert (
        _one(spark, S.human_duration_fr(F.lit(90061)))
        == "1 jour(s) et 1 heure(s) et 1 minute(s)"
    )


def test_hhmmss_and_distance_label(spark):
    assert _one(spark, S.hhmmss(F.lit(3725))) == "01:02:05"
    assert _one(spark, S.distance_label(F.lit(850))) == "850 m"
    assert _one(spark, S.distance_label(F.lit(12345))) == "12.3 km"
    # no locale thousands separator past 1000 km (format_string, not
    # format_number)
    assert _one(spark, S.distance_label(F.lit(1234500))) == "1234.5 km"


def test_map_code_default(spark):
    c = S.map_code(F.lit("V"), S.SPORT_CODE_NAMES, "activité sportive")
    assert _one(spark, c) == "Vélo"
    c = S.map_code(F.lit("?"), S.SPORT_CODE_NAMES, "activité sportive")
    assert _one(spark, c) == "activité sportive"


def test_parse_distance_km(spark):
    assert _one(spark, S.parse_distance_km(F.lit("24.6 km"))) == 24.6
    assert _one(spark, S.parse_distance_km(F.lit("300 m"))) == 0.3
    assert abs(_one(spark, S.parse_distance_km(F.lit("1.2 mi"))) - 1.931208) < 1e-9
    assert _one(spark, S.parse_distance_km(F.lit("whatever"))) is None


def test_parse_duration_seconds(spark):
    assert _one(spark, S.parse_duration_seconds(F.lit("5 hours 36 mins"))) == 20160
    assert _one(spark, S.parse_duration_seconds(F.lit("42 mins"))) == 2520
