"""salted_join must be row-identical to the plain join — the salt only
changes partitioning, never results.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.functions.skew import salted_join
from timeseriesdb_spark.tables import load_table


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_inner_join_equivalence(spark):
    ev = load_table(spark, SF_DIR, "events").select("user_id", "event_id", "value")
    cust = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    plain = ev.join(cust, "user_id")
    salted = salted_join(ev, cust, "user_id", salt=4)
    cols = ["user_id", "event_id", "value", "c_nationkey"]
    assert _sorted_rows(plain, cols) == _sorted_rows(salted, cols)


def test_salted_left_join_equivalence(spark):
    # skewed left side: every event keyed to ONE hot id plus a tail
    ev = load_table(spark, SF_DIR, "events").select(
        F.when(F.col("event_id") % 10 != 0, F.lit(1))
        .otherwise(F.col("user_id"))
        .alias("k"),
        "event_id",
    )
    dim = spark.createDataFrame(
        [(i, f"n{i}") for i in range(0, 150, 2)], "k long, name string"
    )
    plain = ev.join(dim, "k", "left")
    salted = salted_join(ev, dim, "k", how="left", salt=4)
    cols = ["k", "event_id", "name"]
    assert _sorted_rows(plain, cols) == _sorted_rows(salted, cols)


def test_salted_join_rejects_unsupported(spark):
    ev = load_table(spark, SF_DIR, "events")
    import pytest

    with pytest.raises(ValueError):
        salted_join(ev, ev, "user_id", how="full")
