#!/usr/bin/env python
"""Per-round benchmark: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing protocol (BASELINE.md "BENCH protocol"): per query, one warm-up
run then median of N_RUNS timed runs, same JVM/session. Results are
fully materialized via the noop sink (all columns computed JVM-side; no
driver collect)."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from timeseriesdb_spark.registry import QUERIES
from timeseriesdb_spark.session import get_spark

N_RUNS = int(os.environ.get("SPARK_TSDB_BENCH_RUNS", "3"))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    spark = get_spark(app_name="spark-tsdb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, float] = {}
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        try:
            materialize(fn(spark, sf_dir))  # warm-up (scan cache, codegen)
            samples = []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                materialize(fn(spark, sf_dir))
                samples.append(time.perf_counter() - t0)
            times[name] = round(statistics.median(samples), 4)
        except Exception as exc:  # a broken query must not sink the bench
            print(f"BENCH ERROR {name}: {exc}", file=sys.stderr)
            times[name] = -1.0
    total = round(sum(t for t in times.values() if t > 0), 4)
    print(
        json.dumps(
            {
                "metric": "sum_median_query_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
