#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with the `noop` sink (full execution, no driver
collect) — the honest way to measure a distributed plan. Each query runs
$SPARK_GRAFT_BENCH_RUNS times (default 5) and reports the per-query
MEDIAN plus a {min,max,runs} spread, so round-over-round deltas are
separable from the ~±10% single-run machine noise documented in SCALE.md:
a regression whose MIN also moved is real; one visible only in median/max
is noise.
"""

from __future__ import annotations

import gc
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tuktu_spark.queries import load_all  # noqa: E402
from tuktu_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark(app_name="tuktu-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    bench_queries = {n: q for n, q in sorted(registry.items()) if q.bench}

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    timings: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    for name, qd in bench_queries.items():
        # GC barrier (JMH practice): without it, alphabetically-late
        # queries pay the GC debt of the ~100 earlier executions — r6
        # root cause: single-task nlp_rbem_polarity read 2.08s in-context
        # vs 0.5s fresh, and untouched q1/q5 drifted 1.5x, all restored
        # by a forced collection. Runs OUTSIDE the timed region.
        gc.collect()
        spark._jvm.System.gc()
        # one UNTIMED warmup execution per query (JMH practice): the first
        # run pays Janino whole-stage-codegen compilation + JIT of the
        # generated classes — measured 8-11 s for nlp_bm25_top in a
        # mid-bench JVM vs ~1.0 s steady state. Medians should compare
        # steady-state plans, not compiler latency.
        qd.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            qd.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)
        # dispersion so noise vs regression is decidable from the artifact
        # alone (r4 verdict #3): a reading whose MIN also moved is real
        spread[name] = {
            "min": round(min(samples), 4),
            "max": round(max(samples), 4),
            "runs": runs,
        }

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
