"""Classifier drift lifecycle: built → kept → refreshed across a
drifting corpus (plans/model_lifecycle), the stored score profile, and
the PSI monitor itself."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from employee_activity_etl_poc_spark.operators.model_store import (
    N_PROFILE_BUCKETS,
    load_classifier_artifact,
    save_classifier,
)
from employee_activity_etl_poc_spark.plans.model_lifecycle import (
    psi,
    refresh_classifier_if_drifted,
    score_profile,
)


def _labeled_corpus(spark, good_per_10: int = 5):
    """200 docs over two token distributions; ``good_per_10`` of every
    10 docs are the 'good' distribution (label 1), the rest spam (label
    0). Shrinking ``good_per_10`` models corpus drift: same vocabulary,
    shifted class mixture — a model pinned on the 50/50 corpus scores
    the drifted one with visibly more low-bucket mass."""
    good = "crisp well formed prose with varied useful vocabulary"
    spam = "buy buy buy click click spam spam spam spam win"
    is_good = (F.col("id") % 10 < good_per_10).cast("int")
    return spark.range(200).select(
        F.col("id").alias("doc_id"),
        is_good.alias("label"),
        F.when(is_good == 1, F.concat(F.lit(good + " doc "), F.col("id")))
        .otherwise(F.concat(F.lit(spam + " doc "), F.col("id")))
        .alias("text"),
    )


def test_psi_properties():
    assert psi([10, 20, 30], [10, 20, 30]) == 0.0
    # mass moved across buckets -> strictly positive, more move = bigger
    small = psi([12, 18, 30], [10, 20, 30])
    big = psi([30, 20, 10], [10, 20, 30])
    assert 0 < small < big
    with pytest.raises(ValueError):
        psi([1, 2], [1, 2, 3])


def test_score_profile_shape(spark):
    scored = spark.range(100).select(
        (F.col("id") / 100.0).alias("score")
    )
    prof = score_profile(scored)
    assert len(prof) == N_PROFILE_BUCKETS
    assert prof == [10] * N_PROFILE_BUCKETS
    # score exactly 1.0 folds into the top bucket, no 11th bucket
    edge = score_profile(spark.range(3).select(F.lit(1.0).alias("score")))
    assert edge[-1] == 3 and sum(edge) == 3


def test_refresh_classifier_lifecycle_built_kept_refreshed(spark, tmp_path):
    path = str(tmp_path / "qc_model")
    corpus = _labeled_corpus(spark)
    kw = dict(n_buckets=64, iters=2, psi_bound=0.2)

    r1 = refresh_classifier_if_drifted(
        spark, corpus, "text", "doc_id", F.col("label") == 1, path, **kw
    )
    assert r1["action"] == "built" and r1["n"] == 200
    art = load_classifier_artifact(spark, path)
    assert art["score_profile"] is not None
    assert sum(art["score_profile"]) == 200

    # same corpus snapshot -> kept, PSI exactly 0 (grid-exact scores)
    r2 = refresh_classifier_if_drifted(
        spark, corpus, "text", "doc_id", F.col("label") == 1, path, **kw
    )
    assert r2["action"] == "kept" and r2["psi"] == 0.0
    art_kept = load_classifier_artifact(spark, path)
    assert art_kept["w6"] == art["w6"] and art_kept["b6"] == art["b6"]

    # drifted corpus: the class mixture collapses 50/50 -> 10/90, so the
    # pinned model's score histogram shifts most of its mass to the low
    # buckets -> breach
    drifted = _labeled_corpus(spark, good_per_10=1)
    r3 = refresh_classifier_if_drifted(
        spark, drifted, "text", "doc_id", F.col("label") == 1, path, **kw
    )
    assert r3["action"] == "refreshed" and r3["psi"] > 0.2
    art_new = load_classifier_artifact(spark, path)
    assert art_new["w6"] != art["w6"]  # genuinely retrained
    assert sum(art_new["score_profile"]) == 200

    # and the refreshed artifact is stable on ITS corpus
    r4 = refresh_classifier_if_drifted(
        spark, drifted, "text", "doc_id", F.col("label") == 1, path, **kw
    )
    assert r4["action"] == "kept" and r4["psi"] == 0.0


def test_refresh_rebuilds_pre_profile_artifact(spark, tmp_path):
    """An artifact saved without a score profile can't be monitored —
    one rebuild upgrades it, then the normal kept path takes over."""
    path = str(tmp_path / "old_model")
    corpus = _labeled_corpus(spark)
    save_classifier(spark, path, w6=[0] * 64, b6=0)  # pre-profile artifact
    r = refresh_classifier_if_drifted(
        spark, corpus, "text", "doc_id", F.col("label") == 1, path,
        n_buckets=64, iters=2,
    )
    assert r["action"] == "rebuilt"
    assert load_classifier_artifact(spark, path)["score_profile"] is not None
    r2 = refresh_classifier_if_drifted(
        spark, corpus, "text", "doc_id", F.col("label") == 1, path,
        n_buckets=64, iters=2,
    )
    assert r2["action"] == "kept"


def test_partial_profile_rejected(spark, tmp_path):
    """A profile missing deciles is a truncated/mixed artifact — loud
    rejection, same contract as the weight-count check."""
    from employee_activity_etl_poc_spark.localrel import local_df

    path = str(tmp_path / "torn")
    rows = [(-2, 4), (-1, 0), (-3, 5)] + [(i, 0) for i in range(4)]
    local_df(spark, rows, "b long, w6 long").write.parquet(path)
    with pytest.raises(ValueError, match="partial score profile"):
        load_classifier_artifact(spark, path)


# ---------------------------------------------------------------------------
# Tokenizer drift lifecycle
# ---------------------------------------------------------------------------


def _word_corpus(spark, ascii_per_10: int = 10):
    """200 docs over two character distributions: 'ascii' docs reuse a
    small latin-pair vocabulary the BPE merges fit tightly; the rest
    are consonant-cluster words whose frequent pairs are disjoint.
    Shrinking ``ascii_per_10`` models corpus drift — a merge table
    pinned on the latin corpus tokenizes the drifted one with visibly
    more high-token-count mass (fertility rises)."""
    latin = "thera thera inger inger onder anter thera onder inger anter"
    clusters = "bcdfg hjklm npqrs twxyz bcdfg npqrs hjklm twxyz bcdfg npqrs"
    is_latin = (F.col("id") % 10 < ascii_per_10).cast("int")
    return spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(is_latin == 1, F.lit(latin)).otherwise(F.lit(clusters)).alias("text"),
    )


def test_fertility_profile_shape_and_determinism(spark):
    from employee_activity_etl_poc_spark.operators.model_store import (
        N_FERTILITY_BUCKETS,
    )
    from employee_activity_etl_poc_spark.operators.textops import bpe_merge_table
    from employee_activity_etl_poc_spark.plans.model_lifecycle import (
        fertility_profile,
    )

    corpus = _word_corpus(spark)
    merges = bpe_merge_table(corpus, "text", n_merges=3)
    prof = fertility_profile(corpus, "text", merges)
    assert len(prof) == N_FERTILITY_BUCKETS and sum(prof) > 0
    assert prof == fertility_profile(corpus, "text", merges)  # exact ints


def test_refresh_tokenizer_lifecycle_built_kept_refreshed(spark, tmp_path):
    from employee_activity_etl_poc_spark.operators.model_store import (
        load_tokenizer_artifact,
    )
    from employee_activity_etl_poc_spark.plans.model_lifecycle import (
        refresh_tokenizer_if_drifted,
    )

    path = str(tmp_path / "tok_artifact")
    base = _word_corpus(spark, ascii_per_10=10)
    r1 = refresh_tokenizer_if_drifted(spark, base, "text", path, n_merges=3)
    assert r1["action"] == "built"
    art1 = load_tokenizer_artifact(spark, path)
    assert art1["fertility_profile"] is not None and len(art1["merges"]) == 3

    # same snapshot -> exact-integer histograms coincide -> PSI exactly 0
    r2 = refresh_tokenizer_if_drifted(spark, base, "text", path, n_merges=3)
    assert r2["action"] == "kept" and r2["psi"] == 0.0
    assert load_tokenizer_artifact(spark, path)["merges"] == art1["merges"]

    # drifted corpus: the pinned merges no longer fit -> fertility mass
    # shifts -> PSI breaches -> retrain + staged swap
    drifted = _word_corpus(spark, ascii_per_10=2)
    r3 = refresh_tokenizer_if_drifted(spark, drifted, "text", path, n_merges=3)
    assert r3["action"] == "refreshed" and r3["psi"] > r3["psi_bound"]
    art2 = load_tokenizer_artifact(spark, path)
    assert art2["merges"] != art1["merges"]
    # and the refreshed artifact is stable on its own corpus
    r4 = refresh_tokenizer_if_drifted(spark, drifted, "text", path, n_merges=3)
    assert r4["action"] == "kept" and r4["psi"] == 0.0


def test_refresh_rebuilds_pre_profile_tokenizer(spark, tmp_path):
    from employee_activity_etl_poc_spark.operators.model_store import (
        load_tokenizer_artifact,
        save_tokenizer,
    )
    from employee_activity_etl_poc_spark.operators.textops import bpe_merge_table
    from employee_activity_etl_poc_spark.plans.model_lifecycle import (
        refresh_tokenizer_if_drifted,
    )

    corpus = _word_corpus(spark)
    path = str(tmp_path / "tok_pre_profile")
    save_tokenizer(spark, path, bpe_merge_table(corpus, "text", n_merges=3))
    r = refresh_tokenizer_if_drifted(spark, corpus, "text", path, n_merges=3)
    assert r["action"] == "rebuilt"
    assert load_tokenizer_artifact(spark, path)["fertility_profile"] is not None


def test_partial_fertility_profile_rejected(spark, tmp_path):
    from employee_activity_etl_poc_spark.localrel import local_df
    from employee_activity_etl_poc_spark.operators.model_store import (
        load_tokenizer_artifact,
    )

    bad = str(tmp_path / "tok_partial")
    local_df(
        spark,
        [(-1, "", "", "", 1), (-2, "", "", "", 5), (1, "a", "b", "ab", 2)],
        "rank int, lhs string, rhs string, merged string, pair_count long",
    ).write.mode("overwrite").parquet(bad)
    with pytest.raises(ValueError, match="partial fertility"):
        load_tokenizer_artifact(spark, bad)


# ---------------------------------------------------------------------------
# k-means centroid lifecycle (r12 continuation #2)
# ---------------------------------------------------------------------------


def _vec_corpus(spark, shift: float = 0.0, n: int = 120):
    """n 4-dim vectors in two blobs; ``shift`` moves the second blob —
    drifting occupancy mass between cells under pinned centroids."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            F.when(F.col("id") % 2 == 0, 1.0).otherwise(0.0 + shift),
            F.when(F.col("id") % 2 == 0, 0.0).otherwise(1.0 - shift),
            (F.col("id") % 7).cast("double") / 100.0,
            F.lit(0.0),
        ).alias("embedding"),
    )


def test_centroid_artifact_roundtrip_and_rejections(spark, tmp_path):
    from employee_activity_etl_poc_spark.operators.model_store import (
        load_centroids,
        save_centroids,
    )

    cents = [[1000, 0, 3, 0], [0, 1000, -5, 0]]
    p = str(tmp_path / "cents")
    save_centroids(spark, p, cents, grid=1000, occupancy_profile=[60, 60])
    art = load_centroids(spark, p)
    assert art["centroids"] == cents
    assert art["grid"] == 1000
    assert art["occupancy_profile"] == [60, 60]

    # truncated: drop one centroid row
    rows = spark.read.parquet(p)
    trunc = str(tmp_path / "trunc")
    rows.where(~((F.col("cell") == 1) & (F.col("j") == 3))).write.parquet(trunc)
    with pytest.raises(ValueError, match="truncated|missing"):
        load_centroids(spark, trunc)

    # foreign: a classifier artifact is not a centroid artifact
    foreign = str(tmp_path / "foreign")
    save_classifier(spark, foreign, [1, 2, 3], 4)
    with pytest.raises(ValueError, match="sentinel"):
        load_centroids(spark, foreign)

    # partial profile
    part = str(tmp_path / "part")
    rows.where(~((F.col("cell") == -3) & (F.col("j") == 1))).write.parquet(part)
    with pytest.raises(ValueError, match="partial occupancy"):
        load_centroids(spark, part)


def test_refresh_kmeans_lifecycle_built_kept_refreshed(spark, tmp_path):
    from employee_activity_etl_poc_spark.plans.model_lifecycle import (
        refresh_kmeans_if_drifted,
    )

    p = str(tmp_path / "km")
    r1 = refresh_kmeans_if_drifted(
        spark, _vec_corpus(spark), "vec_id", "embedding", p, k=2, grid=1000
    )
    assert r1["action"] == "built"

    # same snapshot: exact integer occupancy -> PSI exactly 0 -> kept
    r2 = refresh_kmeans_if_drifted(
        spark, _vec_corpus(spark), "vec_id", "embedding", p, k=2, grid=1000
    )
    assert r2["action"] == "kept" and r2["psi"] == 0.0

    # drifted corpus: the second blob moves onto the first -> occupancy
    # mass shifts between cells -> refreshed
    r3 = refresh_kmeans_if_drifted(
        spark, _vec_corpus(spark, shift=0.9), "vec_id", "embedding", p,
        k=2, grid=1000,
    )
    assert r3["action"] == "refreshed" and r3["psi"] > 0.2

    # and the refreshed artifact is kept on its own corpus
    r4 = refresh_kmeans_if_drifted(
        spark, _vec_corpus(spark, shift=0.9), "vec_id", "embedding", p,
        k=2, grid=1000,
    )
    assert r4["action"] == "kept" and r4["psi"] == 0.0


def test_refresh_rebuilds_pre_profile_centroids(spark, tmp_path):
    from employee_activity_etl_poc_spark.operators.model_store import (
        load_centroids,
        save_centroids,
    )
    from employee_activity_etl_poc_spark.plans.model_lifecycle import (
        refresh_kmeans_if_drifted,
    )

    p = str(tmp_path / "km")
    save_centroids(spark, p, [[1000, 0, 0, 0], [0, 1000, 0, 0]], grid=1000)
    r = refresh_kmeans_if_drifted(
        spark, _vec_corpus(spark), "vec_id", "embedding", p, k=2, grid=1000
    )
    assert r["action"] == "rebuilt"
    assert load_centroids(spark, p)["occupancy_profile"] is not None


def test_refresh_kmeans_rejects_cross_grid_scoring(spark, tmp_path):
    from employee_activity_etl_poc_spark.operators.model_store import (
        save_centroids,
    )
    from employee_activity_etl_poc_spark.plans.model_lifecycle import (
        refresh_kmeans_if_drifted,
    )

    p = str(tmp_path / "km")
    save_centroids(
        spark, p, [[1000, 0, 0, 0], [0, 1000, 0, 0]], grid=1000,
        occupancy_profile=[60, 60],
    )
    with pytest.raises(ValueError, match="grid"):
        refresh_kmeans_if_drifted(
            spark, _vec_corpus(spark), "vec_id", "embedding", p, k=2, grid=100
        )
