"""End-to-end LLM training-data ingest pipeline (composition demo).

``plans/pipeline_demo.py`` proves the reference's medallion lifecycle
(§3.1-3.3) composes; this is the analogous proof for the north-star
surface: the per-operator pieces — exact dedup, the INCREMENTAL minhash
signature store, quality/language gating, chunking, deterministic shard
export — compose into the pipeline a user would actually run, batch after
batch, with cross-batch dedup and stable outputs.

Batch lifecycle (run per arrival, e.g. inside ``foreachBatch``):

1. exact-dup drop WITHIN the batch (cheapest first),
2. near-dup drop: sign the batch, band-join against the persisted
   signature STORE ∪ batch (``minhash_incremental_pairs``) — per-batch
   cost O(|batch|), never O(corpus); losers are the pair members with the
   larger id (min-id survivor policy, consistent with exact dedup),
3. quality + language gate (pure column exprs),
4. chunk survivors and export to key-hashed training shards (stable
   across re-runs: a doc re-exported lands in the same shard),
5. append the batch's signatures (including losers' — future dups of a
   dropped doc must still collide with SOMETHING) to the store.

Everything is deterministic: re-running a batch is idempotent, and the
final corpus is independent of how arrivals were batched (tested).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators.textops import chunk_tokens, lang_id, quality_score
from ..sources.sinks import write_training_shards


@dataclass
class IngestBatchResult:
    n_arrived: int
    n_after_exact: int
    n_near_dup_losers: int
    n_after_quality: int


def ingest_document_batch(
    spark: SparkSession,
    batch: DataFrame,
    workdir: str,
    min_quality: float = 0.3,
    keep_langs: tuple[str, ...] = ("en", "fr", "de", "es"),
    n_shards: int = 4,
    jaccard_threshold: float = 0.5,
) -> IngestBatchResult:
    """Run one arrival batch (columns: doc_id, text) through the pipeline.

    ``workdir`` holds the two persistent artifacts between batches:
    ``sigstore/`` (the minhash signature table) and ``shards/`` (the
    training corpus, appended per batch).
    """
    store_path = os.path.join(workdir, "sigstore")
    shards_path = os.path.join(workdir, "shards")

    n_arrived = batch.count()
    deduped = D.drop_exact_duplicates(batch, "text", "doc_id")
    n_after_exact = deduped.count()

    sigs = D.minhash_signature_table(deduped, "text", "doc_id").persist()
    if os.path.isdir(store_path):
        store = spark.read.parquet(store_path)
    else:
        store = sigs.limit(0)
    pairs = D.minhash_incremental_pairs(
        store, sigs, threshold=jaccard_threshold
    )
    # min-id survivor policy: the larger id of every near-dup pair loses
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    survivors = deduped.join(losers, "doc_id", "left_anti")
    n_losers = losers.count()

    gated = (
        survivors.withColumn("quality", quality_score(F.col("text")))
        .withColumn("lang", lang_id(F.col("text")))
        .where(
            (F.col("quality") >= min_quality) & F.col("lang").isin(*keep_langs)
        )
    )
    n_after_quality = gated.count()

    chunks = chunk_tokens(gated, "text", "doc_id").join(
        gated.select("doc_id", "quality", "lang"), "doc_id"
    )
    write_training_shards(
        chunks, shards_path, "doc_id", n_shards=n_shards, mode="append"
    )
    # append ALL batch signatures (survivors AND losers): later copies of
    # a dropped doc must still find a collision partner in the store
    sigs.write.mode("append").parquet(store_path)
    sigs.unpersist()
    return IngestBatchResult(n_arrived, n_after_exact, n_losers, n_after_quality)


def prune_signature_store(
    spark: SparkSession,
    workdir: str,
    keep,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Retention + compaction for the incremental-dedup signature store:
    keep only rows matching ``keep`` (a Column predicate over (doc, hs,
    sig) — e.g. ``F.col("doc") >= horizon_id`` for an id-ordered corpus)
    and rewrite the per-batch parquet fragments into right-sized files
    (write-then-swap via a staging dir, same pattern as
    ``compact_parquet``: readers mid-swap see old or new, never half).

    Retention is a POLICY decision: docs pruned from the store can no
    longer be collision partners, so later copies of them will NOT be
    deduped — prune only past the horizon where re-ingest is impossible
    (or where re-admitting ancient content is acceptable). Returns the
    retained row count."""
    import math
    import shutil

    store_path = os.path.join(workdir, "sigstore")
    kept = spark.read.parquet(store_path).where(keep)
    n = kept.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    staging = store_path + "__pruning"
    kept.repartition(n_files).write.mode("overwrite").parquet(staging)
    backup = store_path + "__pre_prune"
    shutil.move(store_path, backup)
    shutil.move(staging, store_path)
    shutil.rmtree(backup)
    return n


def stream_document_ingest(
    spark: SparkSession,
    source_dir: str,
    workdir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **pipeline_kwargs,
):
    """The same pipeline as a Structured Streaming job: each micro-batch of
    arriving documents (parquet files dropped into ``source_dir``) runs
    :func:`ingest_document_batch` inside ``foreachBatch`` — the signature
    store carries dedup state across batches AND restarts (it lives in
    ``workdir``, not executor memory), and the source checkpoint guarantees
    each file is processed exactly once. Returns the started query."""
    schema = "doc_id long, text string"
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ingest_document_batch(spark, batch_df, workdir, **pipeline_kwargs)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=available_now)
        .start()
    )
