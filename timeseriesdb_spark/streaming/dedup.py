"""Streaming deduplication — exact dedup (q_dedup_exact) running on
the live ingest path instead of as a batch rescan.

At 100 TB/day the dedup state cannot be unbounded: the watermark
bounds it to the late-data horizon (duplicates arriving within the
horizon are dropped; older state is evicted). That is
`dropDuplicatesWithinWatermark` — at-least-once sources (Kafka
replays, retried file batches) become effectively-once in the store.

Key choice mirrors the batch operator: dedup on content identity
(event_id here; md5(text) for documents), NOT on arrival metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    keys: list[str] | None = None,
    event_time: str = "ts",
    horizon: str = "2 hours",
) -> DataFrame:
    """Drop duplicate rows (same `keys`) arriving within `horizon` of
    each other; state is evicted past the watermark."""
    return stream.withWatermark(event_time, horizon).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )
