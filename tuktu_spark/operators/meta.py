"""Meta / control-flow operators (SURVEY.md §2.10) and the UDF escape
hatch (§2.12).

The reference routes datums through sub-pipelines with actor plumbing
(IfThenElseProcessor.scala:27-205, MetaProcessors.scala:349-531). Here a
sub-pipeline is just a list of ``{name, config}`` operator specs composed
into one transform; routing is branch-filter + union — Catalyst sees the
whole thing and optimizes across the branch boundary.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..expressions import predicate_column
from .registry import operator, source


def chain(specs: list[dict]):
    """Compose [{name, config}, ...] into one DataFrame transform."""
    from .registry import make_operator

    ops = [make_operator(s["name"], s.get("config", {})) for s in specs or []]

    def transform(df: DataFrame) -> DataFrame:
        return reduce(lambda d, op: op(d), ops, df)

    return transform


@operator("if_then_else")
def if_then_else(config: dict):
    """IfThenElseProcessor (meta/IfThenElseProcessor.scala:27-205): rows
    matching ``condition`` go through the ``then`` sub-pipeline, the rest
    through ``else``; outputs are unioned by name (missing columns null).

    Scale: both branches share the parent's scan (one pass read); the
    union is a no-shuffle concatenation of branch plans.
    """
    cond_expr = config["condition"]
    then_chain = chain(config.get("then", []))
    else_chain = chain(config.get("else", []))

    def transform(df: DataFrame) -> DataFrame:
        cond = predicate_column(cond_expr)
        t = then_chain(df.filter(cond))
        e = else_chain(df.filter(~cond | cond.isNull()))
        return t.unionByName(e, allowMissingColumns=True)

    return transform


@operator("parallel")
def parallel(config: dict):
    """ParallelProcessor (MetaProcessors.scala:349-428): run N sub-pipelines
    over the same input and merge. ``merge``: "serial" (UNION ALL, the
    SerialMerger) or "zip" (positional zip-join, the SimpleMerger)."""
    pipelines = [chain(p) for p in config["pipelines"]]
    merge = config.get("merge", "serial")

    def transform(df: DataFrame) -> DataFrame:
        outs = [p(df) for p in pipelines]
        if merge == "serial":
            return reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=True), outs
            )
        if merge == "zip":
            from .registry import make_operator

            zipper = make_operator("zip_merge", {"order_by": config["order_by"]})
            return zipper(*outs)
        raise ValueError(f"unknown merge mode {merge!r}")

    return transform


@operator("python_map")
def python_map(config: dict):
    """The Groovy-eval analogue (PacketFilterProcessor's ``Eval.me``,
    BaseProcessors.scala:382; §2.12 UDF surface): evaluate a trusted Python
    expression over columns as an Arrow-vectorized pandas UDF.

    config: {"expr": "x * 2 + y.str.len()", "inputs": ["x", "y"],
             "as": "result", "type": "double"}

    The expression sees each input column as a pandas Series bound to its
    name. This is the explicit plugin/escape-hatch surface — configs are
    trusted code, exactly as in the reference. Arrow batches keep it
    ~10-100x faster than row-at-a-time UDFs; still prefer built-in column
    ops when they can express the logic.
    """
    expr = config["expr"]
    inputs = list(config["inputs"])
    result = config.get("as", "result")
    rtype = config.get("type", "double")

    from pyspark.sql.functions import pandas_udf

    code = compile(expr, "<python_map>", "eval")

    @pandas_udf(rtype)
    def fn(*cols):
        env = dict(zip(inputs, cols))
        import numpy as np
        import pandas as pd

        env.update({"np": np, "pd": pd})
        out = eval(code, {"__builtins__": {}}, env)
        return out if isinstance(out, pd.Series) else pd.Series(out)

    def transform(df: DataFrame) -> DataFrame:
        return df.withColumn(result, fn(*[F.col(c) for c in inputs]))

    return transform


@operator("number_with_probability")
def number_with_probability(config: dict):
    """NumberWithProbabilityProcessor (statistics/ProbabilityProcessors.
    scala:13-42): draw a value from a discrete distribution per row.

    Deterministic mode (``hash_key`` set): the uniform draw is
    md5(key)-derived — reproducible across runs AND engines (the oracle
    can recompute it), which a seeded rand() is not. Otherwise F.rand(seed).

    config: {"outcomes": [v1, ...], "probabilities": [p1, ...],
             "as": "draw", "hash_key": "event_id"}
    """
    outcomes = config["outcomes"]
    probs = config["probabilities"]
    result = config.get("as", "draw")
    hash_key = config.get("hash_key")
    seed = config.get("seed", 42)
    if abs(sum(probs) - 1.0) > 1e-9:
        raise ValueError("probabilities must sum to 1")

    def transform(df: DataFrame) -> DataFrame:
        if hash_key:
            # first 15 md5 hex digits -> uniform in [0,1): u = h / 16^15
            u = F.conv(
                F.substring(F.md5(F.col(hash_key).cast("string")), 1, 15), 16, 10
            ).cast("double") / F.lit(float(16**15))
        else:
            u = F.rand(seed)
        cum = 0.0
        expr = F.lit(outcomes[-1])
        ladder = []
        for v, p in zip(outcomes, probs):
            cum += p
            ladder.append((cum, v))
        # build CASE from the top down so the first matching threshold wins
        expr = F.lit(outcomes[-1])
        for threshold, v in reversed(ladder[:-1]):
            expr = F.when(u < threshold, F.lit(v)).otherwise(expr)
        return df.withColumn(result, expr)

    return transform


@source("flow", "include_flow")
def include_flow(spark, config: dict):
    """ParallelConfigProcessor / GeneratorConfigProcessor
    (MetaProcessors.scala:26-60,433-531): compile another flow file with
    ``#{}`` params and ``%{}`` meta vars (utils.scala metaString: the
    including flow supplies the dispatch-level variable map) and surface
    one of its nodes as this flow's source — sub-flow spawning becomes
    plain DataFrame composition (SURVEY §7.3 hard part 3: compile-time
    inlining for static configs)."""
    from ..flow.compiler import compile_flow

    outputs = compile_flow(
        spark,
        config["path"],
        params=config.get("params", {}),
        meta=config.get("meta", {}),
    )
    node = config.get("node")
    if node is None:
        leaves = [nid for nid in outputs]
        node = leaves[-1]
    return outputs[node]


@operator("signal_barrier")
def signal_barrier(config: dict):
    """SignalBufferProcessor (BufferProcessors.scala:171-252): hold one
    branch until another completes. In Spark's lazy model the barrier is an
    action boundary: materialize the signal branch (count) before returning
    the data branch unchanged. Takes (data, signal) inputs in flow specs."""

    def transform(df: DataFrame, signal: DataFrame | None = None) -> DataFrame:
        if signal is not None:
            signal.count()  # driver-side sequencing, mirrors the actor wait
        return df

    return transform


@operator("count_eof")
def count_eof(config: dict):
    """CountEOFProcessor (BaseProcessors.scala:74-90): log row/packet
    counts when the flow drains. Spark's EOF is the action boundary, so
    this op counts HERE (one extra job over the — usually cached —
    lineage) and logs, then passes the frame through. config: {label}."""
    label = config.get("label", "count_eof")

    def transform(df: DataFrame) -> DataFrame:
        n = df.count()
        parts = df.rdd.getNumPartitions()
        print(f"{label}: {n} rows in {parts} partitions at EOF")
        return df

    return transform


@operator("delay")
def delay(config: dict):
    """DelayProcessor (BaseProcessors.scala:32-68): throttle packet flow.
    Batch mapping: one driver-side sleep per compile (a packet ~ a batch);
    streaming mapping: the micro-batch trigger interval IS the throttle —
    run the sink with trigger(processingTime=delay) (streaming/ops.py
    sinks accept ``trigger``). config: {delay: ms}."""
    delay_ms = int(config.get("delay", 0))

    def transform(df: DataFrame) -> DataFrame:
        if not df.isStreaming and delay_ms > 0:
            import time

            time.sleep(delay_ms / 1000.0)
        return df

    return transform


@operator("python_transform")
def python_transform(config: dict):
    """Whole-DataFrame plugin dispatch — the reference's custom-processor
    seam (users subclass BaseProcessor and reference the class by name in
    the flow config; Dispatcher.scala instantiates it reflectively). Here
    the flow config names a Python callable resolved by import path:

    config: {"module": "my_pkg.transforms", "function": "my_transform",
             "kwargs": {...}}

    The callable must be DataFrame -> DataFrame (extra config via
    ``kwargs``). Configs are trusted code, exactly as in the reference;
    the callable runs driver-side to BUILD lineage, so it composes with
    Catalyst like any built-in operator (prefer pandas_udf/mapInPandas
    inside it for row-level Python)."""
    import importlib

    module = config["module"]
    function = config["function"]
    kwargs = dict(config.get("kwargs", {}))

    def transform(df: DataFrame) -> DataFrame:
        fn = getattr(importlib.import_module(module), function)
        out = fn(df, **kwargs)
        if not isinstance(out, DataFrame):
            raise TypeError(
                f"{module}.{function} must return a DataFrame, got {type(out)}"
            )
        return out

    return transform
