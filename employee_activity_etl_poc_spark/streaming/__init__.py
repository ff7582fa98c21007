"""Structured Streaming layer: CDC parse, bronze ingest, incremental gold,
notification sink (SURVEY §2.8)."""

from .cdc import file_cdc_stream, kafka_stream, parse_cdc_envelope
from .ingest import (
    bronze_ingest,
    incremental_foreach_batch,
    run_to_completion,
    write_stream,
)
from .notify import activity_message, make_notifier

__all__ = [
    "activity_message",
    "bronze_ingest",
    "file_cdc_stream",
    "incremental_foreach_batch",
    "kafka_stream",
    "make_notifier",
    "parse_cdc_envelope",
    "run_to_completion",
    "write_stream",
]
