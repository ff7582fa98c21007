"""Skew mitigation — salting rewrites for hot keys (SCALE.md).

AQE's skew-join handling covers sort-merge joins at runtime; these are the
*structural* rewrites for the two places AQE can't help:

- a reduce-side aggregation where one group receives a disproportionate
  share of rows (map-side partial aggregation already bounds this for
  algebraic aggregates — the salted two-stage form is for high-cardinality
  payload aggs like ``collect_list``/exact distinct, or engines/paths where
  partials are unavailable);
- a shuffle join against a dim too big to broadcast whose fact side has
  hot keys: replicate the dim ``n_salt``× and scatter the hot fact rows.

Both rewrites are RESULT-IDENTICAL to their plain forms (the salted agg is
oracle-checked against the unsalted SQL in the registry) — salt only
redistributes rows, never changes semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"

# (partial_expr, merge_expr) builders per supported aggregate
_ALGEBRAIC = {
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation: ``aggs`` maps output name ->
    (function, column) with function in sum/count/min/max/avg.

    Stage 1 groups on (keys, salt) — the hot key's rows spread over
    ``n_salt`` reducers; stage 2 merges the per-salt partials on the real
    keys (tiny input: |keys|×n_salt rows). ``avg`` decomposes into
    sum+count so the merge stays exact. ``("count", "*")`` is the SQL
    ``count(*)`` (rows, nulls included); ``("count", col)`` skips nulls in
    ``col`` — the two differ whenever the column is nullable, so pick the
    one your downstream (or oracle) means.

    Salt is derived from ``monotonically_increasing_id`` — its value is
    partition-dependent, which is irrelevant: ANY row scatter is a valid
    salt; the merge stage erases it.
    """
    salted = df.withColumn(_SALT, F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salt)))

    partials, finals = [], []
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            partials += [
                F.sum(col).alias(f"__{out}_s"),
                F.count(col).alias(f"__{out}_c"),
            ]
            finals.append(
                (F.sum(f"__{out}_s") / F.sum(f"__{out}_c")).alias(out)
            )
        elif fn in _ALGEBRAIC:
            part, merge = _ALGEBRAIC[fn]
            partials.append(part(col).alias(f"__{out}"))
            finals.append(merge(F.col(f"__{out}")).alias(out))
        else:
            raise ValueError(f"unsupported salted aggregate: {fn}")

    stage1 = salted.groupBy(*keys, _SALT).agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def detect_hot_keys(
    df: DataFrame, key: str, sample_fraction: float = 0.05, hot_share: float = 0.01
) -> list:
    """Driver-side hot-key detection: sample the fact table, return keys
    whose sampled share exceeds ``hot_share`` (keys that would dominate a
    reducer). The sample is tiny and the result is a literal list — this
    is metadata, not a data-path shuffle."""
    sampled = df.sample(fraction=sample_fraction, seed=42).groupBy(key).count()
    total = sampled.agg(F.sum("count")).collect()[0][0] or 0
    if not total:
        return []
    return [
        r[key]
        for r in sampled.where(F.col("count") / total > hot_share).collect()
    ]


def hybrid_salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list | None = None,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salt ONLY the hot keys: cold fact rows take the plain equi-join
    (no dim replication), hot rows take the salted path. The dim is
    replicated ``n_salt``× only for its hot-key rows — versus
    :func:`salted_join`'s whole-dim replication.

    ``hot_keys=None`` auto-detects via :func:`detect_hot_keys`.

    Same join-type restriction as :func:`salted_join` (inner/left only) —
    checked up front so auto-detection work isn't wasted on a bad call."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"hybrid_salted_join supports how='inner'/'left' only (got {how!r})"
        )
    if hot_keys is None:
        hot_keys = detect_hot_keys(fact, key)
    if not hot_keys:
        return fact.join(dim, key, how)
    is_hot = F.col(key).isin(hot_keys)
    cold = fact.where(~is_hot).join(dim.where(~is_hot), key, how)
    hot = salted_join(
        fact.where(is_hot), dim.where(is_hot), key, n_salt=n_salt, how=how
    )
    return cold.unionByName(hot)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join for non-broadcastable dims: the dim is
    replicated ``n_salt``× (explode over salt ids), fact rows get a random
    salt, and the join key becomes (key, salt) — a hot fact key now lands
    on ``n_salt`` reducers instead of one.

    Cost: dim shuffle volume × n_salt — use only when a specific fact key
    is hot enough to stall the stage (and prefer ``broadcast`` whenever the
    dim fits).

    Only ``inner``/``left`` are sound: the dim is replicated ``n_salt``×,
    so a right/full join would emit each UNMATCHED dim row once per salt
    replica (n_salt null-padded copies). Guarded rather than silently
    wrong."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only (got {how!r}): "
            "the replicated dim would duplicate unmatched dim rows under "
            "right/full joins"
        )
    salted_fact = fact.withColumn(
        _SALT, F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salt))
    )
    replicated_dim = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return salted_fact.join(replicated_dim, [key, _SALT], how).drop(_SALT)
