"""Property-based tests (hypothesis) for the scalar-function library —
round-trips and reference-implementation equivalence over generated inputs.
The reference had no property testing (SURVEY §5); these pin the F12/F13/
F15/F16 semantics far beyond the hand-picked fixtures.

Each property evaluates ALL generated examples in one Spark job (a single
DataFrame), keeping hypothesis's example count decoupled from JVM roundtrip
cost."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from employee_activity_etl_poc_spark.functions import scalars as S

SETTINGS = dict(max_examples=12, deadline=None)


def _eval(spark, values, make_col, in_type="long"):
    """Evaluate ``make_col(col v)`` for every value in one job."""
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    return [r["out"] for r in df.select(make_col(F.col("v")).alias("out")).collect()]


@settings(**SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=60))
def test_hhmmss_roundtrip(spark, seconds):
    outs = _eval(spark, seconds, S.hhmmss)
    for s, out in zip(seconds, outs):
        h, m, sec = out.split(":")
        assert int(h) * 3600 + int(m) * 60 + int(sec) == s
        assert len(m) == 2 and len(sec) == 2 and int(m) < 60 and int(sec) < 60


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=99), st.integers(min_value=0, max_value=59)
        ),
        min_size=1,
        max_size=60,
    )
)
def test_parse_duration_inverts_api_text(spark, pairs):
    texts = [
        (f"{h} hours {m} mins" if h > 0 else f"{m} mins") for h, m in pairs
    ]
    outs = _eval(spark, texts, S.parse_duration_seconds, in_type="string")
    for (h, m), out in zip(pairs, outs):
        assert out == h * 3600 + m * 60


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.001, max_value=9999.9, allow_nan=False),
            st.sampled_from(["km", "m", "mi"]),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_parse_distance_km_units(spark, pairs):
    texts = [f"{round(v, 3)} {u}" for v, u in pairs]
    outs = _eval(spark, texts, S.parse_distance_km, in_type="string")
    for (v, u), out in zip(pairs, outs):
        v = round(v, 3)
        expected = {"km": v, "m": v / 1000.0, "mi": v * S.MILES_TO_KM}[u]
        assert abs(out - expected) < 1e-9


def _human_duration_py(s: int) -> str:
    """Reference implementation (slack_bot/slack_notifier.py:65-79 semantics)."""
    days, hours, minutes = s // 86400, (s % 86400) // 3600, (s % 3600) // 60
    frags = [
        f"{days} jour(s)" if days else None,
        f"{hours} heure(s)" if hours else None,
        f"{minutes} minute(s)" if minutes else None,
    ]
    joined = " et ".join(f for f in frags if f)
    return joined if joined else "quelques secondes"


@settings(**SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=60))
def test_human_duration_fr_matches_reference(spark, seconds):
    outs = _eval(spark, seconds, S.human_duration_fr)
    for s, out in zip(seconds, outs):
        assert out == _human_duration_py(s)


@settings(**SETTINGS)
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=10**7, allow_nan=False),
        min_size=1,
        max_size=60,
    )
)
def test_distance_label_3g_matches_python_format(spark, meters):
    outs = _eval(spark, meters, S.distance_label_3g, in_type="double")
    for m, out in zip(meters, outs):
        expected = f"{m / 1000:.3g} km" if m >= 1000 else f"{m:.3g} m"
        assert out == expected


@settings(**SETTINGS)
@given(st.lists(st.integers(min_value=-(2**52), max_value=2**52), min_size=1, max_size=60))
def test_micros_roundtrip(spark, micros):
    df = spark.createDataFrame([(v,) for v in micros], "v long")
    outs = [
        r["out"]
        for r in df.select(
            S.timestamp_to_micros(S.micros_to_timestamp(F.col("v"))).alias("out")
        ).collect()
    ]
    assert outs == micros


def test_excel_reader_gated_without_openpyxl(spark, tmp_path):
    """S10: without openpyxl the Excel reader must fail with the documented
    NotImplementedError, not an obscure stack."""
    import pytest

    from employee_activity_etl_poc_spark.sources.readers import read_excel_dim

    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl present; gating not exercised")
    except ImportError:
        pass
    p = tmp_path / "dim.xlsx"
    p.write_bytes(b"PK\x03\x04")  # never read: the gate fires first
    with pytest.raises(NotImplementedError, match="openpyxl"):
        read_excel_dim(spark, str(p))


@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),            # key
            st.sampled_from("cud"),       # op
            st.floats(0, 100, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=15, deadline=None)
def test_scd2_intervals_partition_key_history(spark, rows):
    """SCD2 invariants for ANY change log: per key, versions are ordered,
    non-overlapping, chain exactly (valid_to == next valid_from), and at
    most one is_current — zero iff the key's last op is a delete."""
    from employee_activity_etl_poc_spark.streaming.cdc import scd2_history

    changes = spark.createDataFrame(
        [(k, i, op, v) for i, (k, op, v) in enumerate(rows)],
        "k long, seq long, op string, v double",
    )
    hist = scd2_history(changes, "k", "seq").collect()
    by_key: dict = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    last_op = {}
    for i, (k, op, _v) in enumerate(rows):
        last_op[k] = op
    seen_keys = {k for k, op, _ in rows}
    for k in seen_keys:
        versions = sorted(by_key.get(k, []), key=lambda r: r["valid_from"])
        key_changes = sorted(
            (i for i, (kk, op, _v) in enumerate(rows) if kk == k)
        )
        non_deletes = [i for i in key_changes if rows[i][1] != "d"]
        assert len(versions) == len(non_deletes)
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to"] is not None and a["valid_to"] <= b["valid_from"]
        n_current = sum(1 for r in versions if r["is_current"])
        if versions:
            assert n_current == (0 if last_op[k] == "d" else 1)
            assert (versions[-1]["valid_to"] is None) == (last_op[k] != "d")


@given(st.floats(100, 20000), st.dictionaries(
    st.sampled_from(["en", "fr", "de", "es", "zh"]),
    st.floats(0.05, 3.0, allow_nan=False),
    min_size=1, max_size=5,
))
@settings(max_examples=8, deadline=None)
def test_token_budget_mixture_invariants(spark, budget, weights):
    """For any budget/weights: the sample is a subset of the weighted
    strata, fractions are in (0, 1], and every kept row's stratum was
    weighted."""
    from pyspark.sql import functions as F

    from employee_activity_etl_poc_spark.operators.sampling import (
        token_budget_mixture,
    )

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(*[F.lit(s) for s in ["en", "fr", "de", "es", "zh"]]),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("lang"),
        (F.col("id") % 37 + 3).alias("n_tok"),
    )
    out = token_budget_mixture(docs, "doc_id", "lang", "n_tok", budget, weights)
    rows = out.collect()
    assert all(r["lang"] in weights for r in rows)
    assert all(0 < r["sample_fraction"] <= 1.0 for r in rows)
    kept_ids = {r["doc_id"] for r in rows}
    all_ids = {r["doc_id"] for r in docs.collect()}
    assert kept_ids <= all_ids


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(
            # arbitrary non-separator content, incl. unicode and
            # punctuation — tokens may be ANY string without the split
            # char, so struct-vs-string equivalence must not depend on
            # "nice" words
            st.characters(blacklist_characters=" ", blacklist_categories=("Cs",)),
            min_size=1,
            max_size=6,
        ),
        min_size=0,
        max_size=40,
    )
)
def test_repetition_struct_zip_matches_string_reference(spark, toks):
    """The late-r8 struct-zip rewrite's load-bearing claim, as a property:
    distinct n-gram COUNTS over arrays_zip struct views equal distinct
    counts over the joined-string reference for arbitrary token content
    (tokens cannot contain the separator — they are split on it)."""
    from employee_activity_etl_poc_spark.operators.textops import (
        repetition_features,
    )

    text = " ".join(toks)
    df = spark.createDataFrame([(text,)], "text string")
    rep = repetition_features(F.col("text"))
    got = df.select(
        rep["dup_token_frac"].alias("d1"),
        rep["dup_2gram_frac"].alias("d2"),
        rep["dup_3gram_frac"].alias("d3"),
    ).collect()[0]

    # reference: python string n-grams over the SAME split semantics
    # (Spark split on " " yields empty strings around repeats/edges; the
    # generated text has single separators, but text == "" still splits
    # to [""] — mirror exactly)
    words = text.split(" ")
    for k, name in ((1, "d1"), (2, "d2"), (3, "d3")):
        grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
        want = 1.0 - len(set(grams)) / len(grams) if grams else 0.0
        assert got[name] == pytest.approx(want), (k, toks)


def test_poisson_bootstrap_weight_distribution_and_determinism(spark):
    from pyspark.sql import functions as F

    from employee_activity_etl_poc_spark.operators.sampling import (
        poisson_bootstrap_weight,
    )

    df = spark.range(20000).select(
        F.col("id"), F.lit(1).alias("b")
    )
    w = poisson_bootstrap_weight("boot", F.col("id"), F.col("b"))
    agg = df.select(w.alias("w")).groupBy("w").count().collect()
    dist = {r["w"]: r["count"] for r in agg}
    n = 20000
    # Poisson(1): P(0)=P(1)=e^-1~0.368, P(2)~0.184 — loose 3-sigma bands
    assert abs(dist.get(0, 0) / n - 0.368) < 0.02
    assert abs(dist.get(1, 0) / n - 0.368) < 0.02
    assert abs(dist.get(2, 0) / n - 0.184) < 0.02
    # mean weight ~ 1: resample size is unbiased
    mean_w = sum(k * c for k, c in dist.items()) / n
    assert abs(mean_w - 1.0) < 0.02
    # deterministic: same (salt, id, b) -> same weight
    again = {r["w"]: r["count"] for r in df.select(w.alias("w")).groupBy("w").count().collect()}
    assert again == dist


def test_quality_bootstrap_ci_brackets_point_estimate(spark, sf_dir):
    from employee_activity_etl_poc_spark.plans.registry import REGISTRY
    import employee_activity_etl_poc_spark.plans.llm_queries  # noqa: F401

    out = REGISTRY["quality_bootstrap_ci"].fn(spark, sf_dir).collect()
    assert len(out) == 20
    for r in out:
        assert r["ci_lo"] <= r["mean_quality"] <= r["ci_hi"], r
        assert r["ci_hi"] - r["ci_lo"] < 0.2  # bounded-width sanity
