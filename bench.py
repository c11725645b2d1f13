#!/usr/bin/env python
"""Per-round benchmark: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing protocol (BASELINE.md "BENCH protocol"): per query, one warm-up
run then median of N timed runs (N_RUNS, doubled for sub-second queries
whose medians are noise-dominated), same JVM/session. Results are fully
materialized via the noop sink (all columns computed JVM-side; no
driver collect).

Variance instrumentation (so the 2x regression gate is decidable
against run-to-run weather): per-query min/med/max under "stats", and a
"noise" block — the median relative spread across queries plus a
fixed probe query re-timed at the start, middle and end of the run to
expose environment drift WITHIN the run."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from timeseriesdb_spark.registry import QUERIES
from timeseriesdb_spark.session import get_spark

N_RUNS = int(os.environ.get("SPARK_TSDB_BENCH_RUNS", "3"))
SUBSEC_EXTRA = N_RUNS  # sub-second queries: double the sample count
PROBE = "q_count"      # trivial fixed query re-timed through the run


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time_once(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    materialize(fn(spark, sf_dir))
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    spark = get_spark(app_name="spark-tsdb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = sorted(QUERIES)
    times: dict[str, float] = {}
    stats: dict[str, dict[str, float]] = {}
    probe_samples: list[float] = []

    def probe() -> None:
        if PROBE in QUERIES:
            try:
                materialize(QUERIES[PROBE](spark, sf_dir))  # warm
                probe_samples.append(
                    round(_time_once(QUERIES[PROBE], spark, sf_dir), 4)
                )
            except Exception:
                pass

    probe()
    for i, name in enumerate(names):
        fn = QUERIES[name]
        try:
            materialize(fn(spark, sf_dir))  # warm-up (scan cache, codegen)
            samples = [_time_once(fn, spark, sf_dir) for _ in range(N_RUNS)]
            if statistics.median(samples) < 1.0:
                samples += [_time_once(fn, spark, sf_dir) for _ in range(SUBSEC_EXTRA)]
            med = statistics.median(samples)
            times[name] = round(med, 4)
            stats[name] = {
                "min": round(min(samples), 4),
                "med": round(med, 4),
                "max": round(max(samples), 4),
                "spread": round((max(samples) - min(samples)) / med, 3) if med else 0.0,
            }
        except Exception as exc:  # a broken query must not sink the bench
            print(f"BENCH ERROR {name}: {exc}", file=sys.stderr)
            times[name] = -1.0
        if i == len(names) // 2:
            probe()
    probe()

    total = round(sum(t for t in times.values() if t > 0), 4)
    spreads = sorted(s["spread"] for s in stats.values())
    noise = {
        "median_spread": spreads[len(spreads) // 2] if spreads else None,
        "p90_spread": spreads[int(len(spreads) * 0.9)] if spreads else None,
        "probe_query": PROBE,
        "probe_sec": probe_samples,  # start / middle / end of the run
    }
    print(
        json.dumps(
            {
                "metric": "sum_median_query_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "stats": stats,
                "noise": noise,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
