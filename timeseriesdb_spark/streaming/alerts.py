"""Streaming sustained-threshold alerting — the gaps-and-islands
episode detector (operators/tsanalytics.q_sustained_threshold) as a
custom stateful operator with O(1) carry state per signal.

State carries only the OPEN episode, if any: (n, start_us, end_us,
peak) — four scalars per signal regardless of throughput, the same
discipline as streaming/segmenter.py. An episode closes the moment a
non-breaching sample arrives for that signal and is emitted iff it
reached the minimum length; everything about a closed episode is
therefore BIT-IDENTICAL to the batch query (endpoints and peak pass
through untouched — tests/test_streaming_alerts.py). Episodes still
open when the stream pauses stay in state and emit on the sample that
eventually closes them — exactly a real alerting engine's semantics
(an alert that never clears never resolves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

EPISODE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_ts", TimestampType()),
        StructField("end_ts", TimestampType()),
        StructField("n_samples", LongType()),
        StructField("peak_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("peak", DoubleType()),
    ]
)


def make_detector(threshold: float, min_len: int):
    """Factory for the stateful episode kernel (closure ships by
    value — executors never import this module)."""

    def detect(key, pdfs, state):
        import pandas as pd

        (uid,) = key
        open_ep = list(state.get) if state.exists else None  # [n, s, e, pk]
        done: list[tuple] = []

        # Materialize the key's WHOLE micro-batch before sorting:
        # applyInPandasWithState hands a key's rows in arbitrary
        # post-shuffle order, split into Arrow chunks of
        # spark.sql.execution.arrow.maxRecordsPerBatch rows — sorting
        # each chunk independently would silently split/merge episodes
        # whenever a key exceeds one chunk (>10k rows default) or a
        # multi-partition source interleaves fetch order. One concat +
        # one sort restores the global-order contract the island scan
        # needs; memory is bounded by the key's micro-batch slice, the
        # same bound the per-chunk path already implied for state.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        whole = (
            pd.concat(chunks, ignore_index=True) if chunks else None
        )
        for pdf in [whole] if whole is not None else []:
            pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
            flags = (pdf["value"] > threshold).to_numpy()
            us = (pdf["ts"].astype("datetime64[us]").astype("int64")).to_numpy()
            vals = pdf["value"].to_numpy()
            i = 0
            n_rows = len(pdf)
            while i < n_rows:
                j = i
                while j < n_rows and flags[j] == flags[i]:
                    j += 1
                if flags[i]:  # breaching island [i, j)
                    if open_ep is None:
                        open_ep = [j - i, us[i], us[j - 1], vals[i:j].max()]
                    else:
                        open_ep[0] += j - i
                        open_ep[2] = us[j - 1]
                        open_ep[3] = max(open_ep[3], vals[i:j].max())
                else:  # calm island closes any open episode
                    if open_ep is not None:
                        if open_ep[0] >= min_len:
                            done.append(tuple(open_ep))
                        open_ep = None
                i = j

        if open_ep is not None:
            state.update(tuple(open_ep))
        else:
            state.remove()

        if done:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(done),
                    "start_ts": [pd.Timestamp(s * 1000) for _, s, _, _ in done],
                    "end_ts": [pd.Timestamp(e * 1000) for _, _, e, _ in done],
                    "n_samples": [n for n, _, _, _ in done],
                    "peak_value": [pk for _, _, _, pk in done],
                }
            )

    return detect


def alert_stream(
    events: DataFrame, threshold: float, min_len: int
) -> DataFrame:
    """events stream (user_id, event_id, ts, value) → stream of closed
    alert episodes. Batches must arrive per-signal in time order (the
    reference's arrival-order assumption, future_signal.rs:207)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_detector(threshold, min_len),
        outputStructType=EPISODE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
