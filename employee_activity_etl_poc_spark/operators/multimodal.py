"""Multimodal column plumbing (BASELINE.json north-star).

Images/audio/video ride through the engine as opaque ``binary`` columns with
typed metadata structs. The Spark-side plumbing — schema, Arrow batching,
``mapInPandas`` signatures, partition sizing — is real and tested; the
actual codec work is stubbed behind ``_decode_stub`` because media libraries
aren't in this container. Swapping the stub for PIL/ffmpeg is a one-function
change that doesn't touch the distributed plan.

Design notes for 100 TB:
- binary payloads inflate row size: keep ``spark.sql.files.maxPartitionBytes``
  modest and NEVER groupBy a payload column — carry (id, payload) through
  narrow transforms only.
- decode runs in ``mapInPandas`` so each Arrow batch amortizes Python
  transfer; batch size is governed by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, n_frames long, fmt string"
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test harness: fabricate a binary payload column from text (UTF-8
    bytes). Real pipelines read payloads from parquet/object storage."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _decode_stub(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic fake decoder: metadata derived purely from byte length.

    STUB — stands in for image decode / audio frame extraction. Replace the
    body with a real codec; the signature (bytes in, metadata out) and the
    surrounding mapInPandas plan stay identical.
    """
    n = len(payload)
    width = 64 + n % 577
    height = 64 + (n * 31) % 577
    n_frames = n // 1024 + 1
    return n, width, height, n_frames


def extract_media_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode pass: (id, payload) -> typed metadata rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(_decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": meta.map(lambda m: m[0]),
                    "width": meta.map(lambda m: m[1]),
                    "height": meta.map(lambda m: m[2]),
                    "n_frames": meta.map(lambda m: m[3]),
                    "fmt": pdf[id_col].map(lambda i: ("png", "jpeg", "wav")[i % 3]),
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, schema=MEDIA_META_SCHEMA)


FRAME_FEATURE_SCHEMA = (
    "doc_id long, frame_idx long, f0 double, f1 double, f2 double, f3 double"
)


def _frame_feature_stub(doc_id: int, frame_idx: int) -> list[float]:
    """Deterministic fake per-frame feature vector (4 dims, [0,1)) from
    md5(doc, frame, dim). STUB — stands in for a CNN/CLIP embedding of the
    decoded frame; the mapInPandas batching, schema, and downstream joins
    are the real, tested plumbing."""
    import hashlib

    return [
        int(hashlib.md5(f"frame|{doc_id}|{frame_idx}|{j}".encode()).hexdigest()[:8], 16)
        / 4294967296.0
        for j in range(4)
    ]


def extract_frame_features(frames: DataFrame) -> DataFrame:
    """Second decode pass: (doc_id, frame_idx) -> feature columns. In a
    real pipeline this pass ALSO receives the payload slice; the fake
    derives features from ids so the DuckDB oracle can replay it."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _frame_feature_stub(d, f)
                for d, f in zip(pdf["doc_id"], pdf["frame_idx"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    **{f"f{j}": [round(v[j], 6) for v in feats] for j in range(4)},
                }
            )

    return frames.select("doc_id", "frame_idx").mapInPandas(
        run, schema=FRAME_FEATURE_SCHEMA
    )


def frame_sample_plan(meta: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan: one output row per sampled frame index.

    Runs entirely JVM-side (sequence + explode); the eventual per-frame
    decode would be another mapInPandas pass over (doc_id, frame_idx).
    """
    return meta.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
