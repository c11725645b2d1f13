"""Skew-mitigation join helpers.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the
plan-level fallback for the pathological case AQE can't fix: ONE hot
key whose rows exceed a single task's memory on the build side — at
100 TB a handful of hot signals/shingles can hold a stage hostage.

`salted_join`: replicate the (small-ish) right side SALT times and
scatter the left side's hot keys uniformly across the replicas, so
one hot key becomes SALT parallel tasks. Result is row-identical to
the plain join (verified by test) — only the partitioning changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 8


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Equi-join on `key` with the left side salted across `salt`
    buckets. Use when `left` has hot keys and `right` is small enough
    to replicate `salt` times (dimension-scale but above the broadcast
    threshold). Only inner/left joins preserve semantics under
    replication; others raise."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    lkey, skey = f"__{key}_salt", "__salt_id"
    # pmod, not abs(hash) % salt: hash() can return Int32.MIN, whose
    # abs overflows (throws under ANSI; yields a negative bucket that
    # silently drops the row otherwise)
    l_salted = left.withColumn(
        lkey, F.pmod(F.hash(F.col(key), F.monotonically_increasing_id()), F.lit(salt))
    )
    r_salted = right.withColumn(
        skey, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = l_salted.join(
        r_salted,
        (l_salted[key] == r_salted[key]) & (l_salted[lkey] == r_salted[skey]),
        how,
    )
    return joined.drop(lkey, skey).drop(r_salted[key])
