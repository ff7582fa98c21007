"""Tests for the source layer (CSV sniffing, schema canonicalization)."""

from __future__ import annotations

import os

from employee_activity_etl_poc_spark.schemas import (
    ACTIVITY_ALIASES,
    EMPLOYEE_ALIASES,
    canonicalize,
)
from employee_activity_etl_poc_spark.sources.readers import _sniff_csv, read_csv_sniffed


def test_sniff_semicolon_latin1(tmp_path):
    p = tmp_path / "dim.csv"
    p.write_bytes("id;nom;ville\n1;René;Orléans\n".encode("latin-1"))
    sep, enc = _sniff_csv(str(p))
    assert sep == ";"
    assert enc == "ISO-8859-1"


def test_sniff_bom_comma(tmp_path):
    p = tmp_path / "x.csv"
    p.write_bytes(b"\xef\xbb\xbfa,b\n1,2\n")
    sep, enc = _sniff_csv(str(p))
    assert sep == ","
    assert enc == "UTF-8"


def test_read_csv_sniffed_roundtrip(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("id;val\n1;aa\n2;bb\n")
    df = read_csv_sniffed(spark, str(p))
    assert sorted((r["id"], r["val"]) for r in df.collect()) == [(1, "aa"), (2, "bb")]


def test_canonicalize_activity_dialects(spark):
    # generator dialect
    df = spark.createDataFrame([(1, 2)], ["ID", "ID_salarie"])
    assert canonicalize(df, ACTIVITY_ALIASES).columns == ["activity_id", "employee_id"]
    # validator dialect (accents)
    df = spark.createDataFrame([(1, 100)], ["ID_salarié", "Distance"])
    assert canonicalize(df, ACTIVITY_ALIASES).columns == ["employee_id", "distance_m"]
    # xlsx dialect (spaces)
    df = spark.createDataFrame([(1, "Nom")], ["ID salarié", "Nom"])
    assert canonicalize(df, EMPLOYEE_ALIASES).columns == ["employee_id", "last_name"]
    # unknown columns pass through
    df = spark.createDataFrame([(1, "x")], ["ID", "mystery"])
    assert canonicalize(df, ACTIVITY_ALIASES).columns == ["activity_id", "mystery"]
