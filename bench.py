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

from pyspark.sql import functions as F  # noqa: E402

from tuktu_spark.queries import load_all  # noqa: E402
from tuktu_spark.session import get_spark  # noqa: E402


# Harness protocol version. Bump whenever the measurement protocol itself
# changes (r7 verdict #5: BENCH artifacts must be self-describing so
# cross-round comparisons are decidable from the artifacts alone).
#   v1 (r1-r6): median-of-N cold, no warmup, no GC barrier
#   v2 (r7):    untimed warmup + GC barrier per query
#   v3 (r8):    v2 + constant synthetic control query for host-drift
#               normalization + this harness stamp + the GC barrier now
#               runs before EVERY timed run (not only before the warmup):
#               r7's text_ngram_lm_score artifact showed a 16.9 s max in
#               a 2.1-3.2 s spread — a stop-the-world collection of debt
#               accumulated across the previous timed runs (5 LM count
#               broadcasts per run in a shared JVM) landing inside one
#               timed region. Collecting between runs (untimed, JMH
#               practice) keeps each sample a plan cost, not a debt roll.
#   v4 (r11):   v3 + a SECOND, Spark-shaped control (canonical
#               shuffle+agg over generated data) recorded as "control2"
#               alongside the v3 hot-loop control: r10 forensics
#               (SCALE.md) showed the single-hot-loop control swinging
#               0.86x between runs ten minutes apart — NOISIER than the
#               32-way workload it normalizes — because an all-CPU
#               compute loop tracks turbo/contention extremes, while
#               the real queries' cost is scheduler + shuffle + agg
#               shaped. bench_diff prefers control2 when both artifacts
#               carry it; the v3 control stays for comparability with
#               r8-r10 artifacts.
#   v5 (r12):   stdout carries ONE compact line guaranteed to fit the
#               driver's 2000-char tail capture (r11 verdict #1: every
#               driver BENCH artifact through r11 landed "parsed": null
#               because the rich line overflowed the capture and the
#               tail cut off the JSON head). The full-precision rich
#               summary moves to stderr (and $SPARK_GRAFT_BENCH_RICH
#               when set). Spread travels as [min, max] arrays; if the
#               compact line would still overflow, spread is dropped
#               from stdout first — queries/controls never are.
HARNESS_VERSION = 5

# The control is pure Spark — spark.range + hash/agg, zero repo code, zero
# I/O — so its reading moves ONLY with the host (CPU contention, JVM/GC
# state, thermal drift), never with this repo's plans. bench_diff.py divides
# cross-round ratios by the control ratio to separate host drift from real
# plan changes (r7 verdict: q1/q5 min flags vs r5 were undecidable without
# a fixed in-artifact reference).
# ~1 s of work on this class of host: large enough that scheduler jitter
# is a small fraction of the reading (300M read 0.23-0.30 s with a ~30%
# spread; 1B tightens the relative noise), small enough to add only ~6 s
# to the bench.
_CONTROL_ROWS = 1_000_000_000


def _control(spark) -> None:
    (
        spark.range(0, _CONTROL_ROWS, 1, 32)
        .selectExpr(
            "sum(hash(id) % 1024) AS s",
            "count(if(id % 7 = 0, 1, null)) AS c",
            "avg(id * 3 + 1) AS a",
        )
        .write.mode("overwrite")
        .format("noop")
        .save()
    )


# Spark-SHAPED control (harness v4): a canonical scan -> partial agg ->
# shuffle exchange -> final agg pipeline over generated data — the same
# execution anatomy as the bench queries (task scheduling, shuffle write/
# fetch, hash aggregation), unlike the v3 hot loop which is pure
# all-core arithmetic and tracks turbo/contention extremes the queries
# don't see. Row count sized so the reading is ~1 s on this host class:
# large enough that per-task scheduler jitter is a small fraction,
# small enough to add only a few seconds to the bench.
_CONTROL2_ROWS = 200_000_000
_CONTROL2_KEYS = 65_536


def _control_shuffle(spark) -> None:
    (
        spark.range(0, _CONTROL2_ROWS, 1, 32)
        .selectExpr(
            f"id % {_CONTROL2_KEYS} AS k",
            "hash(id) % 1024 AS v",
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("v").alias("s"),
            F.avg("v").alias("a"),
        )
        .write.mode("overwrite")
        .format("noop")
        .save()
    )


# The driver records only the LAST ~2000 characters of bench stdout; a
# line longer than that loses its JSON head to the tail capture and the
# artifact ships "parsed": null (BENCH_r06..r11 all did). Budget kept
# under the capture with margin for the shell newline.
_STDOUT_BUDGET = 1950


def compact_summary(rich: dict) -> str:
    """The ONE stdout line, guaranteed to survive the driver's tail capture.

    Invariants (pinned by tests/test_bench_format.py):
      * len(line) <= _STDOUT_BUDGET, so the 2000-char tail capture holds
        the WHOLE line and ``json.loads(tail)`` succeeds;
      * blocks ordered bulky-first / load-bearing-last (spread, then
        controls, then queries) so even a pathological future overflow
        leaves the medians and drift references in the tail for
        scripts/bench_diff.py's salvage path;
      * on overflow the per-query spread block (the only O(n_queries)
        bulk besides the medians) is dropped from stdout — it still
        lives in the rich stderr line — and ``spread_dropped: true``
        records the omission; queries/controls are never dropped.
      * the budget is RE-CHECKED after the drop (r12 advice: the drop
        used to be the only fallback, so a bench set whose
        controls+medians alone exceed the budget would silently
        regress the artifact to parsed:null again): still over ->
        query/value medians round to 2 decimals (``medians_rounded``
        records it; ~1.2 s vs 1.23 s is plenty for the spread rule);
        over even then -> fail LOUDLY with the actual byte count (the
        rich stderr line has already been emitted, so no measurement
        is lost) instead of printing a line the capture will truncate.
    """
    payload = {
        "metric": rich["metric"],
        "value": rich["value"],
        "unit": rich["unit"],
        "harness": rich["harness"],
        "spread": {
            k: [round(v["min"], 3), round(v["max"], 3)]
            for k, v in rich["spread"].items()
        },
        "control": {
            "median": rich["control"]["median"],
            "rows": rich["control"]["rows"],
        },
        "control2": {
            "median": rich["control2"]["median"],
            "rows": rich["control2"]["rows"],
            "kind": rich["control2"]["kind"],
        },
        "queries": rich["queries"],
        "sf": rich["sf"],
    }
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > _STDOUT_BUDGET:
        del payload["spread"]
        payload["harness"] = {**payload["harness"], "spread_dropped": True}
        line = json.dumps(payload, separators=(",", ":"))
    if len(line) > _STDOUT_BUDGET:
        payload["queries"] = {
            k: round(v, 2) for k, v in payload["queries"].items()
        }
        payload["value"] = round(payload["value"], 2)
        payload["harness"] = {**payload["harness"], "medians_rounded": 2}
        line = json.dumps(payload, separators=(",", ":"))
    if len(line) > _STDOUT_BUDGET:
        raise RuntimeError(
            f"compact bench line is {len(line)} bytes > {_STDOUT_BUDGET} "
            "even after dropping spread and rounding medians — the bench "
            "set outgrew the driver's 2000-char tail capture; shorten "
            "query names or split the set (rich line already on stderr)"
        )
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark(app_name="tuktu-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    bench_queries = {n: q for n, q in sorted(registry.items()) if q.bench}

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))

    # Controls measured FIRST (same protocol as the queries: GC barrier +
    # one untimed warmup, then `runs` timed executions) so every artifact
    # carries same-JVM host-speed references.
    def _measure(fn) -> "list[float]":
        gc.collect()
        spark._jvm.System.gc()
        fn(spark)
        samples = []
        for _ in range(runs):
            gc.collect()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark)
            samples.append(time.perf_counter() - t0)
        return samples

    ctrl_samples = _measure(_control)
    control = {
        "median": round(statistics.median(ctrl_samples), 4),
        "min": round(min(ctrl_samples), 4),
        "max": round(max(ctrl_samples), 4),
        "runs": runs,
        "rows": _CONTROL_ROWS,
    }
    ctrl2_samples = _measure(_control_shuffle)
    control2 = {
        "median": round(statistics.median(ctrl2_samples), 4),
        "min": round(min(ctrl2_samples), 4),
        "max": round(max(ctrl2_samples), 4),
        "runs": runs,
        "rows": _CONTROL2_ROWS,
        "kind": "shuffle_agg",
    }
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
            # between-run GC barrier (harness v3, untimed): debt from the
            # PREVIOUS timed runs must not pay inside this sample
            gc.collect()
            spark._jvm.System.gc()
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
    rich = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "harness": {
            "runs": runs,
            "warmup": 1,
            "gc_barrier": True,
            "version": HARNESS_VERSION,
        },
        "spread": spread,
        "control2": control2,
        "control": control,
        "queries": timings,
        "sf": sf,
    }
    # Full-precision rich summary to stderr (and an optional file) for
    # humans, SCALE.md analyses, and local artifact capture; stdout gets
    # the ONE compact capture-proof line the driver records (harness v5).
    rich_line = json.dumps(rich)
    print(rich_line, file=sys.stderr)
    rich_path = os.environ.get("SPARK_GRAFT_BENCH_RICH")
    if rich_path:
        with open(rich_path, "w", encoding="utf-8") as f:
            f.write(rich_line + "\n")
    print(compact_summary(rich))


if __name__ == "__main__":
    main()
