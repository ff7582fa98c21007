"""make_oracle_sample: deterministic sampled-oracle fixture builder.

The sf1-heavy oracle gate (ROADMAP #15) depends on the sample being (a)
deterministic across runs/engines, (b) a genuine subset, (c) keyed the
same way the repo's other md5 samplers are keyed. Cheap to verify on
sf0.001."""

from __future__ import annotations

import os

import duckdb

from tools.make_oracle_sample import HEAVY_ORACLE_QUERIES, make_sample


def _ids(path: str, col: str) -> list[int]:
    return sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT {col} FROM read_parquet('{path}')"
        ).fetchall()
    )


def test_sample_is_deterministic_subset(tmp_path):
    src = "/root/testdata/sf0.001"
    d1, d2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    make_sample(src, d1, k=5)
    make_sample(src, d2, k=5)
    for table, col in (("documents", "doc_id"), ("embeddings", "vec_id")):
        full = _ids(os.path.join(src, f"{table}.parquet"), col)
        s1 = _ids(os.path.join(d1, f"{table}.parquet"), col)
        s2 = _ids(os.path.join(d2, f"{table}.parquet"), col)
        assert s1 == s2  # deterministic
        assert set(s1) <= set(full)  # genuine subset
        assert 0 < len(s1) < len(full)
        # the documented md5 predicate, replayed independently
        expect = [
            i
            for i in full
            if int(
                duckdb.sql(
                    f"SELECT CAST('0x' || substr(md5('orasample|' || '{i}'), 1, 8) AS BIGINT) % 5"
                ).fetchone()[0]
            )
            == 0
        ]
        assert s1 == expect
    # unsampled tables ride along unchanged (hardlink or copy)
    assert os.path.getsize(os.path.join(d1, "region.parquet")) == os.path.getsize(
        os.path.join(src, "region.parquet")
    )


def test_heavy_query_list_is_registered():
    from employee_activity_etl_poc_spark.plans.registry import REGISTRY

    missing = [q for q in HEAVY_ORACLE_QUERIES if q not in REGISTRY]
    assert not missing
    # every heavy query has an oracle — the whole point is gating them
    assert all(REGISTRY[q].oracle is not None for q in HEAVY_ORACLE_QUERIES)
