"""Relational operators — SURVEY §2.2-2.6 (projections, joins, aggs,
windows, set ops) as composable ``DataFrame -> DataFrame`` functions.

Design stance: small dims are explicitly ``broadcast()`` (the reference's
dims are 161 rows — ``gold/bronzeToGold.py:91-104`` — and at 100 TB fact
scale a broadcast hash join avoids shuffling the fact table entirely);
everything else is left declarative so AQE picks sort-merge vs shuffled-hash
and handles skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..localrel import local_df


def enrich_left(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """J1/J2: left equi-join against a dimension on a shared key.

    The reference merges on differently-named keys then drops the duplicate
    (``gold/bronzeToGold.py:136-147``) and hand-dedups duplicated columns
    (``:165-179``, P3); joining with ``on=key`` makes both problems
    structurally impossible. Dim columns colliding with fact columns are
    suffixed ``_dim`` before the join (the reference's suffix variant,
    ``gold/test.py:161-180``).
    """
    collisions = (set(fact.columns) & set(dim.columns)) - {key}
    for c in collisions:
        dim = dim.withColumnRenamed(c, f"{c}_dim")
    right = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(right, key, "left")


def anti_join(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """J3/J5: rows of ``left`` with no match in ``right``
    (``find_unique_employee.ipynb:88-112,118-128``)."""
    return left.join(right, key, "left_anti")


def semi_join(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """J4: rows of ``left`` with at least one match
    (``find_unique_employee.ipynb:138``)."""
    return left.join(right, key, "left_semi")


def upsert_new(existing: DataFrame, incoming: DataFrame, key: str) -> DataFrame:
    """J5: insert-only upsert — rows of ``incoming`` whose key is absent
    from ``existing``, appended to it (``hr_df[~hr_df.employee_id.isin(
    existing_ids)]``, ``find_unique_employee.ipynb:118-128``).

    This is the batch-DataFrame form; on Delta tables prefer
    ``MERGE WHEN NOT MATCHED THEN INSERT`` (one transactional pass, no
    read-modify-write race)."""
    fresh = incoming.join(existing.select(key), key, "left_anti")
    return existing.unionByName(fresh)


def merge_upsert(existing: DataFrame, incoming: DataFrame, key: str) -> DataFrame:
    """Full upsert semantics (Delta ``MERGE WHEN MATCHED UPDATE / WHEN NOT
    MATCHED INSERT``) as a batch-DataFrame rewrite: incoming rows win on key
    collision, untouched existing rows survive.

    Implemented as incoming ∪ (existing ⟂ incoming-keys) — two narrow
    branches and one anti-join, no full outer join. On Delta tables use the
    native MERGE (transactional, file-pruned); this is the engine-neutral
    batch equivalent, and the shape ``foreachBatch`` sinks use to upsert
    update-mode streaming output."""
    survivors = existing.join(incoming.select(key), key, "left_anti")
    return survivors.unionByName(incoming)


def high_watermark_filter(
    df: DataFrame, ts_col: str, watermark
) -> DataFrame:
    """P4: incremental filter ``ts > watermark``
    (``gold/bronzeToGold2.py:38-50,103-110``).

    Expressed as a plain predicate so it pushes into the parquet/Delta scan
    (file-level skipping on min/max stats) — the reference read the entire
    bronze table and filtered in memory.
    """
    return df.where(F.col(ts_col) > F.lit(watermark))


def max_watermark(df: DataFrame, ts_col: str):
    """A2: current high watermark; a single-column scan, not a full read
    (the reference loaded the whole gold table for this one max,
    ``gold/bronzeToGold2.py:43-45``)."""
    return df.agg(F.max(ts_col).alias("wm")).collect()[0]["wm"]


def topk_global(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """W1: deterministic global top-k (the newest-7 selection,
    ``README.md:70-78``). ``order`` must be a total order for determinism."""
    return df.orderBy(*order).limit(k)


def topk_per_group(
    df: DataFrame, partition: list[str], order: list[Column], k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """W3: top-k per group via row_number (the Slack tail-5 buffer,
    ``slack_bot/slack_notifier.py:206-241``, generalized)."""
    w = Window.partitionBy(*partition).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)


def assign_contiguous_ids(
    df: DataFrame, order: list[Column], id_col: str = "row_id"
) -> DataFrame:
    """W4: contiguous 1..N id assignment (``strava_like_data.ipynb:110``).

    ``row_number`` over a global order — correct but single-partition for the
    window; at 100 TB use ``zipWithIndex``-style two-pass (per-partition
    counts + offset) — kept here as the semantic reference implementation.
    """
    return df.withColumn(id_col, F.row_number().over(Window.orderBy(*order)))


def assign_contiguous_ids_distributed(
    df: DataFrame,
    order: list[Column],
    id_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """W4 at scale: contiguous 1..N ids with NO single-partition window.

    Two-pass zipWithIndex shape: range-partition by the order keys, number
    rows *within* each partition (parallel windows), then add per-partition
    offsets computed from partition counts (a ``num_partitions``-row
    driver-side list — the only non-distributed step, and it's O(partitions)).

    ``order`` must be a TOTAL order: ties may be split across range-
    partition boundaries, so equal keys would get arbitrary relative ids.
    """
    spark = df.sparkSession
    n_parts = num_partitions or df.rdd.getNumPartitions()
    ranged = df.repartitionByRange(n_parts, *order).sortWithinPartitions(*order)
    # PERSIST is load-bearing: repartitionByRange samples its boundaries
    # with an RDD-id-derived seed, so the counts pass and the output pass
    # would otherwise recompute DIFFERENT partitionings and the offsets
    # would not line up with the final partitions.
    with_pid = ranged.withColumn("_pid", F.spark_partition_id()).persist()

    counts = sorted(
        (r["_pid"], r["n"])
        for r in with_pid.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    offset_df = local_df(spark, offsets, "_pid int, _offset long")

    w = Window.partitionBy("_pid").orderBy(*order)
    return (
        with_pid.join(F.broadcast(offset_df), "_pid")
        .withColumn(id_col, (F.row_number().over(w) + F.col("_offset")).cast("long"))
        .drop("_pid", "_offset")
    )


def exact_ntile_distributed(
    df: DataFrame,
    order: list[Column],
    n_tiles: int,
    tile_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``ntile(n)`` semantics with NO single-partition window.

    Same two-pass shape as :func:`assign_contiguous_ids_distributed`
    (range-partition on the order keys, parallel within-partition windows,
    per-partition offsets from an O(partitions) driver-side count list),
    then the SQL ntile bucket formula applied to the global rank: with
    ``total = q·n + r``, the first ``r`` tiles take ``q+1`` rows, the rest
    ``q``. Exactly ntile's row-for-row assignment — equal order keys may
    still straddle tiles, decided by the tie-break columns — but the only
    global structure is the count list, never a global sort on one reducer.

    ``order`` must be a TOTAL order for determinism (same contract as
    ``ntile`` over a tie-broken ORDER BY).
    """
    spark = df.sparkSession
    n_parts = num_partitions or df.rdd.getNumPartitions()
    ranged = df.repartitionByRange(n_parts, *order).sortWithinPartitions(*order)
    # persist: boundary sampling is seeded per-RDD-id; see
    # assign_contiguous_ids_distributed for why both passes must see the
    # SAME partitioning.
    with_pid = ranged.withColumn("_pid", F.spark_partition_id()).persist()

    counts = sorted(
        (r["_pid"], r["n"])
        for r in with_pid.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, total = [], 0
    for pid, n in counts:
        offsets.append((pid, total))
        total += n
    offset_df = local_df(spark, offsets, "_pid int, _offset long")

    q, r = divmod(total, n_tiles)
    cut = r * (q + 1)  # global rank of the last row in the "big" tiles
    w = Window.partitionBy("_pid").orderBy(*order)
    rank = F.row_number().over(w) + F.col("_offset")
    if q == 0:
        # fewer rows than tiles: row k -> tile k (ntile's degenerate case)
        tile = rank
    else:
        tile = F.when(
            rank <= F.lit(cut), F.ceil(rank / F.lit(q + 1))
        ).otherwise(F.lit(r) + F.ceil((rank - F.lit(cut)) / F.lit(q)))
    return (
        with_pid.join(F.broadcast(offset_df), "_pid")
        .withColumn(tile_col, tile.cast("int"))
        .drop("_pid", "_offset")
    )


def union_fragments(parts: list[DataFrame]) -> DataFrame:
    """SO1: union-all by name (``pd.concat`` over parquet fragments,
    ``bronze/readSampleDelta.py:52``)."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def key_difference(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """SO2: distinct keys of ``left`` minus keys of ``right``
    (``find_unique_employee.ipynb:90-92``)."""
    return left.select(key).distinct().exceptAll(right.select(key).distinct())


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Reconcile two snapshots of a keyed table: one row per key that
    differs, with ``change`` ∈ {'added', 'removed', 'changed'} and
    ``changed_cols`` (the sorted names of value columns that differ,
    empty for added/removed).

    The data-engineering audit primitive (validating a migration, a CDC
    re-sync, a backfill): at 100 TB it is ONE full-outer shuffle join on
    the key — co-located and shuffle-free if both snapshots are bucketed
    on it — and every column comparison is a codegen'd null-safe
    equality; unchanged rows are filtered before anything widens.
    Comparison uses ``eqNullSafe``: a NULL→value or value→NULL
    transition counts as a change, NULL→NULL does not."""
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in key_cols]
    o = old.select(
        *[F.col(k).alias(f"_ko_{k}") for k in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_kn_{k}") for k in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"_ko_{k}").eqNullSafe(F.col(f"_kn_{k}"))
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")
    changed_cols = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_ko_{k}"), F.col(f"_kn_{k}")).alias(k)
                for k in key_cols
            ],
            "change",
            F.when(F.col("change") == "changed", changed_cols)
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
    )
