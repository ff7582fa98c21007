"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference keeps its only state in a Python set that dies on restart
(``bronze/redPandaToDeltaLake.py:134`` — the ST4 bug). Real per-key
streaming state lives in Spark's state store: keyed, checkpointed,
restored on restart, evicted by watermark/timeout.

This module provides the engine's custom-operator template: a per-employee
running activity profile (count / total duration / last seen) updated per
micro-batch — the streaming twin of the A7 SUMMARIZE aggregate. The same
pattern (grouped Arrow batches in, state object per key, rows out) carries
any custom stateful logic the built-in windowed aggs can't express.

Scale notes: state is partitioned by the grouping key across executors;
size it like a shuffle (state store per partition), keep the state struct
narrow, and always set a timeout/watermark policy so abandoned keys evict.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_OUTPUT_SCHEMA = (
    "employee_id long, n_activities long, total_duration_s long, "
    "last_seen timestamp"
)
PROFILE_STATE_SCHEMA = "n long, dur long, last long"


def _update_profile(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Merge this micro-batch's rows for one employee into running state and
    emit the refreshed profile row."""
    n, dur, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in batches:
        n += len(pdf)
        dur += int(
            (
                pdf["end_ts"].astype("int64") - pdf["start_ts"].astype("int64")
            ).sum()
            // 1_000_000_000
        )
        last_us = max(last_us, int(pdf["start_ts"].astype("int64").max() // 1_000))
    state.update((n, dur, last_us))
    yield pd.DataFrame(
        {
            "employee_id": [key[0]],
            "n_activities": [n],
            "total_duration_s": [dur],
            "last_seen": [pd.Timestamp(last_us, unit="us")],
        }
    )


SESSION_OUTPUT_SCHEMA = (
    "employee_id long, n_activities long, closed boolean"
)
SESSION_STATE_SCHEMA = "n long"


def make_idle_session_fn(timeout_ms: int):
    """Per-key activity session that CLOSES on idleness: every batch with
    rows for the key refreshes the count and re-arms a processing-time
    timeout; when the key stays idle past ``timeout_ms``, Spark invokes the
    function once more with ``state.hasTimedOut`` and an empty iterator —
    the session row is emitted as closed and the state evicted.

    This is the timeout/eviction half the running profile doesn't need:
    abandoned keys leave the state store instead of living forever."""

    def fn(key, batches, state):
        import pandas as pd

        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame(
                {"employee_id": [key[0]], "n_activities": [n], "closed": [True]}
            )
            return
        n = state.get[0] if state.exists else 0
        for pdf in batches:
            n += len(pdf)
        state.update((n,))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"employee_id": [key[0]], "n_activities": [n], "closed": [False]}
        )

    return fn


def idle_closing_sessions(parsed: DataFrame, timeout_ms: int = 60_000) -> DataFrame:
    """NOTE: under ``Trigger.AvailableNow`` a query with processing-time
    timeouts does NOT self-terminate — pending timers count as outstanding
    work, so the query keeps scheduling (empty) batches to fire them. Use a
    processing-time trigger for long-running deployment, or stop the
    availableNow query explicitly after a bounded wait (what
    ``run_to_completion(q, timeout_s=...)`` does)."""
    return parsed.groupBy("employee_id").applyInPandasWithState(
        make_idle_session_fn(timeout_ms),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def running_activity_profile(parsed: DataFrame) -> DataFrame:
    """Per-employee running profile over the (streaming) bronze rows.

    Output mode "update": one refreshed row per employee per micro-batch in
    which that employee appeared. State survives restarts via the query
    checkpoint — the structural fix for the reference's in-memory set.
    """
    return parsed.groupBy("employee_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_OUTPUT_SCHEMA,
        stateStructType=PROFILE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
