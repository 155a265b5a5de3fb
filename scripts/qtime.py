#!/usr/bin/env python
"""Time individual registry queries with bench.py's exact protocol
(noop sink, untimed warmup, GC barrier between runs) — the per-query
A/B tool for optimization work. Does NOT replace bench.py (the driver
contract); it exists so a candidate change can be measured in isolation
without paying a full 25-query bench per iteration.

Usage: python scripts/qtime.py [-r RUNS] query [query ...]
       SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored as in bench.py.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tuktu_spark.queries import load_all  # noqa: E402
from tuktu_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-r", "--runs", type=int, default=5)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="tuktu-spark-qtime")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    out = {}
    for name in args.queries:
        qd = registry[name]
        spark.sparkContext.setJobDescription(f"qtime:{name}:warmup")
        gc.collect()
        spark._jvm.System.gc()
        qd.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        samples = []
        for i in range(args.runs):
            gc.collect()
            spark._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"qtime:{name}:run{i}")
            t0 = time.perf_counter()
            qd.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
        out[name] = {
            "median": round(statistics.median(samples), 4),
            "min": round(min(samples), 4),
            "max": round(max(samples), 4),
            "runs": args.runs,
        }
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
