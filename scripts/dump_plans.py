#!/usr/bin/env python
"""Dump .explain("formatted") for named registry queries to files.

Usage: python scripts/dump_plans.py --suffix before --outdir plans/r13 q1 q2 ...
       (default queries: the bench set)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tuktu_spark.queries import load_all  # noqa: E402
from tuktu_spark.session import get_spark  # noqa: E402


def plan_of(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--outdir", default="plans/r13")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="tuktu-spark-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    names = args.queries or sorted(
        n for n, q in registry.items() if q.bench
    )
    os.makedirs(args.outdir, exist_ok=True)
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        path = os.path.join(args.outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(plan_of(df))
        print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
