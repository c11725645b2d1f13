"""Stream-stream joins — correlation of two live event streams.

The reference has no two-stream operator (its one join is
batch-side, tsbs/mod.rs:29); this is the Spark-native capability that
replaces the "land both streams, join nightly" batch pattern:
attribution (view → purchase within an hour), alert correlation,
request/response pairing.

Both sides carry watermarks; the time-bound join condition lets the
state store evict rows once they can no longer match — state is
O(throughput × window), not O(history). At 100 TB/day that bound is
what makes the join runnable at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner join: each purchase matched to every view by the same
    user within `horizon` BEFORE it (inclusive). Streaming-valid:
    both inputs watermarked, join condition time-bounded on both
    sides."""
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select(
        F.col("p_user").alias("user_id"),
        "view_id",
        "view_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )
