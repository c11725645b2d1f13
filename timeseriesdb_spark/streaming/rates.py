"""Streaming counter-rate — PromQL increase()/rate() deltas as a
stateful operator with O(1) carry state per signal.

The batch form (operators/tsanalytics.q_counter_rate) computes each
row's delta with lag() over the signal's whole history; a stream can't
lag across micro-batches, so state carries ONLY the previous raw value
(one double per signal — the same minimal-carry discipline as
streaming/smoothing.py). The kernel emits PER-ROW rate events
(inc_raw, is_reset) and deliberately does NOT round or aggregate:
inc_raw is the identical IEEE subtraction Spark's lag() would produce,
so any downstream consumer that applies the batch query's own
round→decimal-sum aggregation gets BIT-IDENTICAL per-(signal, day)
increase/resets/span (pinned by tests/test_streaming_rates.py).
Day-boundary deltas land on the later row's day, exactly like the
batch lag-then-group order.

At 100 TB the emitted rate events partial-aggregate per (signal, day)
in the same micro-batch (mergeable integer/decimal partials, the
q_histogram_rollup pattern); state-store size stays #signals × one
double regardless of throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

RATE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("inc_raw", DoubleType()),
        StructField("is_reset", IntegerType()),
    ]
)

STATE_SCHEMA = StructType([StructField("last_value", DoubleType())])


def make_counter_rate():
    """Factory for the stateful delta kernel (closure ships by value —
    executors never import this module)."""

    def rate(key, pdfs, state):
        import numpy as np
        import pandas as pd

        carry = state.get[0] if state.exists else None
        frames = []
        # Concat BEFORE sorting: a key's micro-batch arrives in
        # arbitrary post-shuffle order split into Arrow chunks —
        # per-chunk sorts would compute deltas against the wrong
        # neighbor whenever a key spans chunks (>10k rows default or
        # interleaved multi-partition fetch).
        chunks = [p for p in pdfs if len(p)]
        whole = pd.concat(chunks, ignore_index=True) if chunks else None
        for pdf in [whole] if whole is not None else []:
            pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
            v = pdf["value"].to_numpy(np.float64)
            first = np.nan if carry is None else carry
            prev = np.concatenate(([first], v[:-1]))
            delta = v - prev
            is_reset = delta < 0  # NaN (no previous value) compares False
            inc = np.where(
                np.isnan(delta), 0.0, np.where(is_reset, v, delta)
            )
            carry = float(v[-1])
            frames.append(
                pd.DataFrame(
                    {
                        "user_id": pdf["user_id"],
                        "event_id": pdf["event_id"],
                        "ts": pdf["ts"],
                        "inc_raw": inc,
                        "is_reset": is_reset.astype(np.int32),
                    }
                )
            )
        if carry is not None:
            state.update((carry,))
        if frames:
            yield pd.concat(frames, ignore_index=True)

    return rate


def counter_rate_stream(events: DataFrame) -> DataFrame:
    """events stream (user_id, event_id, ts, value) → stream of per-row
    rate events. Batches must arrive per-signal in time order (the
    reference's arrival-order assumption, future_signal.rs:207)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_counter_rate(),
        outputStructType=RATE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
