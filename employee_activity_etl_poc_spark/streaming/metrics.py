"""Streaming observability (the Grafana story for streams).

The reference monitored the pipeline with a Postgres row-count gauge
(``grafana/queries.yaml:1-7``) — blind to lag, throughput, or state size.
Structured Streaming exposes all of that per micro-batch through
``StreamingQuery.recentProgress``; these helpers flatten it into metric
rows a dashboard (or a test) consumes directly.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.streaming import StreamingQuery


def progress_metrics(query: StreamingQuery) -> list[dict[str, Any]]:
    """One flat dict per recent micro-batch: batch id, rows in/processed
    per second, batch duration, and state-store rows/memory when a stateful
    operator is present."""
    out = []
    for p in query.recentProgress:
        state = (p.get("stateOperators") or [{}])[0]
        out.append(
            {
                "batch_id": p.get("batchId"),
                "timestamp": p.get("timestamp"),
                "num_input_rows": p.get("numInputRows"),
                "input_rows_per_second": p.get("inputRowsPerSecond"),
                "processed_rows_per_second": p.get("processedRowsPerSecond"),
                "batch_duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
                "state_rows": state.get("numRowsTotal"),
                "state_memory_bytes": state.get("memoryUsedBytes"),
            }
        )
    return out


def throughput_summary(query: StreamingQuery) -> dict[str, Any]:
    """Aggregate view over recent progress: totals + peak rates — the
    numbers the reference's Grafana board wanted but could not see."""
    rows = progress_metrics(query)
    data = [r for r in rows if r["num_input_rows"]]
    return {
        "n_batches": len(rows),
        "total_input_rows": sum(r["num_input_rows"] or 0 for r in rows),
        "peak_input_rows_per_second": max(
            (r["input_rows_per_second"] or 0.0 for r in rows), default=0.0
        ),
        "mean_batch_duration_ms": (
            sum(r["batch_duration_ms"] or 0 for r in data) / len(data)
            if data
            else None
        ),
        "max_state_rows": max((r["state_rows"] or 0 for r in rows), default=0),
    }
