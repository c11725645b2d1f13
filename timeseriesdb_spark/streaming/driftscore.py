"""Streamed lossy-drift feature maintenance — the SCORING half of the
reference's recoding daemon as an incremental job.

Reference: the recoding daemon ages segments through lossy tiers
(recoding_daemon.rs:96) and lossyML measures whether the aging changed
downstream model answers (buffer_pool.rs:798-938). The batch q_*_drift
matrix (operators/mlscoring.py) runs that measurement as a re-scan;
this module maintains the PAA-tier SEGMENT FEATURE PARTIALS from the
live stream so the agreement scores are answerable at any moment
without rescanning history — the same partials-per-batch discipline as
maintain_rollup_stream / maintain_hll_register_stream.

Why this merges EXACTLY: the drift features reduce to per-(signal,
segment, chunk) integer sums in 1e-6 units plus min/max/count — every
one associative. Each value is rounded onto the DECIMAL(38,6) grid
BEFORE any sum (the operators/common.py discipline), so a chunk's
per-batch partial longs add up to precisely the one-pass batch long
however the rows were micro-batched; the NON-mergeable steps (the
half-up chunk-mean division, std, labeling) all happen at READ time on
the merged integers. Stream == batch is therefore bit-identical,
pinned by tests/test_streaming_drift.py.

Position assignment is the one stateful step: segment/chunk indices
derive from each signal's global arrival rank, so a carried per-signal
count (O(1) state — the streaming/smoothing.py discipline) assigns
`pos` across micro-batches. Batches must arrive per-signal in time
order (file source staged time-ordered, or a Kafka source partitioned
by signal with in-partition ordering — the reference's arrival-order
assumption, future_signal.rs:207).

State-eviction caveat (deliberate, unlike the segmenter): the position
carry CANNOT be timeout-evicted the way segmenter.py flushes idle
signals — dropping a count restarts a returning signal's positions at
0 and silently re-buckets it. State here is one int64 per signal ever
seen (1B signals ≈ 8 GB across the whole state store — per-executor
share is small), which is acceptable far past 100 TB of events; if the
signal UNIVERSE itself is unbounded, the production lever is to seed
state from a persisted per-signal high-water count (the feature store
already carries max(seg)·SEG_ROWS + partial-chunk n per signal) on
rehydrate, not to evict blindly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

POSITIONED_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("pos", LongType()),
        StructField("value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType([StructField("cnt", LongType())])


def make_positioner():
    """Factory for the stateful position-assignment kernel (closure
    ships by value — executors never import this module). State is one
    long per signal: the count of rows already positioned."""

    def assign(key, pdfs, state):
        import numpy as np
        import pandas as pd

        (uid,) = key
        carry = state.get[0] if state.exists else 0
        chunks = [p for p in pdfs if len(p)]
        # Concat BEFORE sorting (the smoothing.py lesson): a per-chunk
        # sort would interleave positions out of time order whenever a
        # key spans Arrow chunks.
        if chunks:
            whole = pd.concat(chunks, ignore_index=True)
            whole = whole.sort_values(["ts", "event_id"]).reset_index(
                drop=True
            )
            n = len(whole)
            yield pd.DataFrame(
                {
                    "user_id": whole["user_id"],
                    "pos": np.arange(carry, carry + n, dtype=np.int64),
                    "value": whole["value"],
                }
            )
            carry += n
        state.update((carry,))

    return assign


def positioned_stream(events: DataFrame) -> DataFrame:
    """events stream (user_id, event_id, ts, value) → stream of
    (user_id, pos, value) with pos = the signal's global arrival rank
    (row_number over (ts, event_id) — what the batch drift queries
    window for)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_positioner(),
        outputStructType=POSITIONED_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def chunk_feature_partials(positioned: DataFrame) -> DataFrame:
    """Per-(signal, segment, chunk) mergeable feature partials of a
    positioned frame: exact 1e-6-unit integer sums (value and value²
    each rounded onto the DECIMAL(38,6) grid before summing — the
    identical math to mlscoring._chunks_frame), plus min/max/count.
    sum/min/max/count are associative, so partials from ANY row
    partitioning merge to the one-pass chunk row exactly."""
    from timeseriesdb_spark.operators.mlscoring import (
        DEC,
        PAA_CHUNK,
        SEG_ROWS,
        chunk_feature_agg,
    )

    v = F.col("value").cast(DEC).cast("double")
    base = positioned.select(
        "user_id",
        v.alias("v"),
        F.expr(f"pos div {SEG_ROWS}").alias("seg"),
        F.expr(f"pos div {PAA_CHUNK}").alias("chunk"),
    )
    return chunk_feature_agg(base)


def merge_feature_partials(partials: DataFrame) -> DataFrame:
    """Merged chunk rows from any number of batch partials — the
    read-time combine (sum/min/max are associative; the half-up chunk
    mean and everything after happen on the merged integers)."""
    return partials.groupBy("user_id", "seg", "chunk").agg(
        F.sum("s_u").alias("s_u"),
        F.sum("ss_u").alias("ss_u"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        F.sum("n").alias("n"),
    )
