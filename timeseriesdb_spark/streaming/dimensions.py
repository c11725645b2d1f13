"""Streaming SCD-2 dimension maintenance — the CDC interval build
(operators/funnels.q_scd2) as a custom stateful operator with O(1)
carry state per key.

State carries only the OPEN dimension row: (state, valid_from_us,
version) — three scalars per user regardless of throughput (the
streaming/alerts.py discipline). A type change closes the open
interval and emits it with is_current = 0; the new current row
replaces it in state. Every CLOSED interval is therefore
BIT-IDENTICAL to the batch query's is_current = 0 rows (endpoints
pass through untouched, versions count from the user's true first
change — tests/test_streaming_dimensions.py); the still-open current
row per user lives in state exactly like a warehouse's current
dimension record, closing (and emitting) on the next change whenever
it arrives. Batches must arrive per-key in time order — the
reference's arrival-order ingestion assumption (future_signal.rs:207),
same as alerts/segmenter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

INTERVAL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("state", StringType()),
        StructField("valid_from", TimestampType()),
        StructField("valid_to", TimestampType()),
        StructField("version", IntegerType()),
        StructField("is_current", IntegerType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("cur_state", StringType()),
        StructField("valid_from_us", LongType()),
        StructField("version", LongType()),
    ]
)


def _scd2_kernel(key, pdfs, state):
    import pandas as pd

    (uid,) = key
    cur = list(state.get) if state.exists else None  # [state, vf_us, ver]
    closed: list[tuple] = []

    # One concat + one sort per key per micro-batch: Arrow chunking
    # and post-shuffle row order must not split/merge intervals (the
    # streaming/alerts.py whole-batch rule).
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = (
            pd.concat(chunks, ignore_index=True)
            .sort_values(["ts", "event_id"])
            .reset_index(drop=True)
        )
        us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        types = pdf["event_type"].to_numpy()
        for t_us, et in zip(us, types):
            if cur is None:
                cur = [et, int(t_us), 1]
            elif et != cur[0]:
                closed.append((cur[0], cur[1], int(t_us), cur[2]))
                cur = [et, int(t_us), cur[2] + 1]

    if cur is not None:
        state.update(tuple(cur))

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [uid] * len(closed),
                "state": [s for s, _, _, _ in closed],
                "valid_from": [pd.Timestamp(f * 1000) for _, f, _, _ in closed],
                "valid_to": [pd.Timestamp(t * 1000) for _, _, t, _ in closed],
                "version": [v for _, _, _, v in closed],
                "is_current": [0] * len(closed),
            }
        )


def scd2_stream(events: DataFrame) -> DataFrame:
    """events stream (user_id, event_id, ts, event_type) → stream of
    CLOSED SCD-2 intervals (is_current = 0 rows of the batch build).
    The open current row per user stays in state — query it by
    unioning this sink's intervals with the state-closing change that
    eventually arrives, exactly a warehouse's current-record table."""
    return events.groupBy("user_id").applyInPandasWithState(
        _scd2_kernel,
        outputStructType=INTERVAL_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
