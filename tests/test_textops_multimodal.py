"""Tests for text-analysis operators and multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from employee_activity_etl_poc_spark.operators import multimodal as M
from employee_activity_etl_poc_spark.operators import textops as TX


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_lang_id(spark):
    assert _one(spark, TX.lang_id(F.lit("the cat sat on a mat in the sun"))) == "en"
    assert _one(spark, TX.lang_id(F.lit("le chat et la souris de un jardin"))) == "fr"
    assert _one(spark, TX.lang_id(F.lit("der hund und die katze und das haus"))) == "de"
    assert _one(spark, TX.lang_id(F.lit("zzz qqq www"))) == "unknown"


def test_token_counts(spark):
    assert _one(spark, TX.n_tokens(F.lit("a b c"))) == 3
    # bpe-ish: letters run, digits run, symbol
    assert _one(spark, TX.bpe_ish_token_count(F.lit("abc 123 x!"))) == 4


def test_quality_score_bounds(spark):
    score = _one(spark, TX.quality_score(F.lit("the cat sat on the mat and it was good")))
    assert 0.0 <= score <= 1.0


def test_fingerprint_stable_and_sensitive(spark):
    a = _one(spark, TX.doc_fingerprint(F.lit("a b c d e")))
    b = _one(spark, TX.doc_fingerprint(F.lit("a b c d e")))
    c = _one(spark, TX.doc_fingerprint(F.lit("a b c d f")))
    assert a == b
    assert len(a) == 32  # md5 hex
    # differing tail shingle usually changes the min — not guaranteed, but
    # both docs share only 2 of 3 shingles; equality would mean min came
    # from a shared shingle, which is fine; just assert determinism + shape
    assert isinstance(c, str)


def test_jaccard(spark):
    j = _one(
        spark,
        TX.jaccard(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            F.array(F.lit("b"), F.lit("c"), F.lit("d")),
        ),
    )
    assert abs(j - 0.5) < 1e-12


def test_media_metadata_stub(spark):
    docs = spark.createDataFrame([(0, "hello"), (1, "worlds!")], "doc_id long, text string")
    out = M.extract_media_metadata(M.attach_payload(docs)).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n_bytes"] == 5 and by_id[0]["fmt"] == "png"
    assert by_id[1]["n_bytes"] == 7 and by_id[1]["fmt"] == "jpeg"
    assert by_id[0]["width"] == 64 + 5 % 577


def test_frame_sample_plan(spark):
    meta = spark.createDataFrame([(1, 25)], "doc_id long, n_frames long")
    frames = [r["frame_idx"] for r in M.frame_sample_plan(meta, every_n=10).collect()]
    assert frames == [0, 10, 20]
