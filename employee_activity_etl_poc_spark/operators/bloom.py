"""Bloom-filter semi-join pruning — shrink the probe side before the
shuffle.

A semi-join of a 100 TB fact table against a selective-but-not-tiny key
set shuffles the whole fact table even though most rows will not match.
The standard fix is a Bloom filter of the build keys pushed down to the
probe scan: no false negatives (never drops a match), a bounded false-
positive rate (the exact join afterwards removes those), and a few KB of
bits instead of the key set itself.

Spark's AQE can inject this automatically for some plans
(``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator
makes the pattern explicit — usable in streaming foreachBatch, across
jobs (build once, reuse the bitmap), and visible in the plan.

Everything stays JVM-side and mergeable:

- build: each key sets ``n_hashes`` bit positions (``xxhash64(key, i)``
  mod bits); positions aggregate to 64-bit words via ``bit_or`` with
  map-side partial aggregation — the shuffle carries ≤ bits/64 rows per
  task no matter how many build rows there are, and word-bitmaps from
  different builds OR together (mergeable, like every sketch here);
- probe: the word array rides as ONE literal array column (bits/64
  longs — 8 KB of plan at the 2^16 default, the broadcast-variable
  analogue); membership is ``n_hashes`` shift-and-mask tests, all
  whole-stage-codegen, no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit_positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """n_hashes deterministic bit positions in [0, n_bits): xxhash64 of
    (key, i) — varying the second column stands in for a seed, which the
    PySpark xxhash64 wrapper does not expose. The key is canonicalized to
    string first: xxhash64 is TYPE-sensitive (int 5 and long 5 hash
    differently), so without canonicalization a probe/build type mismatch
    would silently produce false negatives — breaking the module's core
    contract."""
    return [
        F.pmod(F.xxhash64(key.cast("string"), F.lit(i)), F.lit(n_bits))
        for i in range(n_hashes)
    ]


def bloom_build(
    build: DataFrame, key_col: str, n_bits: int = 1 << 16, n_hashes: int = 3
) -> list[int]:
    """Bloom bitmap of the build side's keys as ``n_bits // 64`` words.

    Distributed OR-merge: (word, mask) rows aggregate with ``bit_or`` —
    partial aggregation makes the shuffle ≤ bits/64 rows per task —
    then only the ≤ bits/64 non-zero words reach the driver. Never
    collects keys."""
    pos = build.where(F.col(key_col).isNotNull()).select(
        F.explode(F.array(*_bit_positions(F.col(key_col), n_bits, n_hashes))).alias(
            "pos"
        )
    )
    words = (
        pos.select(
            F.expr("pos DIV 64").alias("word"),
            F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
        .collect()
    )
    got = {int(r["word"]): int(r["bits"]) for r in words}
    return [got.get(i, 0) for i in range(n_bits // 64)]


def bloom_prune(
    probe: DataFrame,
    key_col: str,
    bitmap: list[int],
    n_hashes: int = 3,
) -> DataFrame:
    """Rows of ``probe`` whose key MIGHT be in the bloom (plus nothing
    that is definitely absent — no false negatives). Membership tests are
    pure column expressions over a literal word array: codegen'd
    shift-and-mask, zero Python per row."""
    n_bits = len(bitmap) * 64
    out = probe.withColumn("_bloom", F.array(*[F.lit(w) for w in bitmap]))
    pos_cols = _bit_positions(F.col(key_col), n_bits, n_hashes)
    for i, pc in enumerate(pos_cols):
        out = out.withColumn(f"_bp{i}", pc)
    cond = " AND ".join(
        f"(shiftright(element_at(_bloom, cast(_bp{i} DIV 64 AS int) + 1), "
        f"cast(_bp{i} % 64 AS int)) & 1) = 1"
        for i in range(n_hashes)
    )
    return out.where(F.expr(cond)).drop(
        "_bloom", *[f"_bp{i}" for i in range(n_hashes)]
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """EXACT semi-join with bloom pre-pruning: the bitmap drops the bulk
    of non-matching probe rows before the shuffle, the real semi-join
    removes the bloom's false positives — output is identical to a plain
    ``left_semi`` (which is what the SQL oracle replays), only the
    shuffle volume changes. The right tool when the build side is too big
    to broadcast raw but its BITS are not."""
    bitmap = bloom_build(build, build_key, n_bits, n_hashes)
    pruned = bloom_prune(probe, probe_key, bitmap, n_hashes)
    keys = build.select(F.col(build_key).alias(probe_key)).distinct()
    return pruned.join(keys, probe_key, "left_semi")
