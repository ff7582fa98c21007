"""Similarity search over embedding columns (BASELINE.json north-star).

Two tiers:

- **Brute-force cosine top-k** — exact; each query vector is broadcast
  against the candidate table, the dot product is a JVM-side
  ``zip_with``/``aggregate`` fold (no Python in the hot path). Cost is
  O(|queries| × |corpus|): correct baseline and fine when |queries| is small.
- **LSH-bucketed top-k** — random-hyperplane signatures (deterministic,
  md5-seeded) put candidates into 2^n_planes buckets; the top-k search runs
  only within the query's bucket (multi-probe = flip one plane bit). At
  100 TB the bucket join replaces the cross product with an equi-join
  shuffle on the signature key.

Vectors are cast to double before any arithmetic so accumulation order and
precision match the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _hash_long


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(df: DataFrame, vec_col: str, out: str = "v") -> DataFrame:
    return df.withColumn(out, F.col(vec_col).cast("array<double>"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    sim_decimals: int = 6,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, sim, rnk).

    Ranking uses the ROUNDED similarity with id tie-break so results are
    stable across engines/precision; self-matches are excluded."""
    from pyspark.sql import Window

    c = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv")
    )
    q = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv")
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("cv"), F.col("qv")), sim_decimals).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return sims.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


def near_duplicate_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.99
) -> DataFrame:
    """Embedding near-dup pairs (a < b, cosine >= threshold). Brute force;
    for scale, bucket with ``hyperplane_signature`` first."""
    a = _as_double(df, vec_col).select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
    b = _as_double(df, vec_col).select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .where(sim >= threshold)
        .select("id_a", "id_b", F.round(sim, 4).alias("sim"))
    )


def hyperplane_signature(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Deterministic random-hyperplane LSH signature (int in [0, 2^n_planes)).

    Plane p's component j is a pseudo-random value in [-1, 1) derived from
    md5(p, j) — reproducible across engines and runs with no RNG state."""
    def plane_component(p: int, j: Column) -> Column:
        h = _hash_long(F.concat(F.lit(f"plane{p}_"), j.cast("string")))
        return (h % 2001 - 1000) / F.lit(1000.0)

    sig = F.lit(0)
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), lambda j: plane_component(p, j)),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj >= 0, F.lit(2 ** p)).otherwise(F.lit(0))
    return sig


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Recall is tunable via n_planes (fewer planes = bigger buckets) and
    multi-probe; the join on ``bucket`` is a plain shuffle equi-join, so the
    pattern scales to corpora where brute force is impossible."""
    from pyspark.sql import Window

    c = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("v").alias("cv"),
        hyperplane_signature(F.col("v"), dim, n_planes).alias("bucket"),
    )
    q = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        hyperplane_signature(F.col("v"), dim, n_planes).alias("bucket"),
    )
    sims = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("cv"), F.col("qv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return sims.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)
