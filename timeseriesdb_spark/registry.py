"""Assembles the full query inventory declared to the driver.

Every operator module exposes ``QUERIES`` (name → callable(spark,
sf_dir) → DataFrame) and ``ORACLES`` (name → DuckDB-runnable SQL).
Queries without an oracle entry are genuinely non-SQL-expressible
(pandas-UDF transforms, streaming) and get the driver's rows-only
check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from timeseriesdb_spark.functions import codecs
from timeseriesdb_spark.operators import (
    aggregates,
    dedup,
    filters,
    joins,
    mlkernels,
    mlscoring,
    multimodal,
    relational,
    similarity,
    text,
    transforms,
    windows,
)

_MODULES = [
    codecs,
    aggregates,
    dedup,
    filters,
    joins,
    mlkernels,
    mlscoring,
    multimodal,
    relational,
    similarity,
    text,
    transforms,
    windows,
]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        if _name in QUERIES:
            raise ValueError(f"duplicate query name: {_name}")
        QUERIES[_name] = _fn
    ORACLES.update(getattr(_m, "ORACLES", {}))

# Every oracle must belong to a declared query.
_orphans = set(ORACLES) - set(QUERIES)
if _orphans:
    raise ValueError(f"oracles without queries: {sorted(_orphans)}")
