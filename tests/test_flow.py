"""End-to-end flow-spec tests — the analogue of the reference's
BaseFlowTester (test/tuktu/test/flow/BaseFlowTester.scala:99-191): load a
JSON flow config, run the compiled pipeline, compare against expected."""

from __future__ import annotations

import pytest

from tuktu_spark.flow import FlowError, compile_flow, run_flow


def test_vertical_slice(spark, sf_dir):
    """SURVEY.md §7.1: source -> filter (predicate expr) -> groupBy+agg
    expr -> sort -> limit — Tuktu's CSVGenerator -> PacketFilter ->
    AggregateByValue -> Sort -> Take chain."""
    flow = {
        "generators": [
            {
                "id": "src",
                "name": "parquet",
                "config": {"path": f"{sf_dir}/lineitem.parquet"},
                "next": ["filt"],
            }
        ],
        "processors": [
            {
                "id": "filt",
                "name": "filter",
                "config": {"expression": "${l_quantity} > 10 && ${l_returnflag} != 'N'"},
                "next": ["agg"],
            },
            {
                "id": "agg",
                "name": "aggregate_by_value",
                "config": {
                    "group": ["l_returnflag"],
                    "aggregations": {"n": "count()", "qty": "sum(${l_quantity})"},
                },
                "next": ["srt"],
            },
            {"id": "srt", "name": "sort", "config": {"by": [{"field": "qty", "desc": True}]}, "next": ["top"]},
            {"id": "top", "name": "take", "config": {"n": 1}, "next": []},
        ],
    }
    out = run_flow(spark, flow)
    assert list(out) == ["top"]
    row = out["top"].collect()[0]
    assert row["n"] > 0 and row["l_returnflag"] in ("A", "R")


def test_fanout_fanin_union(spark):
    """Diamond DAG: one generator fans out to two filter branches that merge
    (fan-out = shared lineage, fan-in = unionByName; SURVEY.md §1.4)."""
    flow = {
        "generators": [
            {
                "id": "g",
                "name": "inline",
                "config": {"rows": [[1], [2], [3], [4]], "columns": ["v"]},
                "next": ["low", "high"],
            }
        ],
        "processors": [
            {"id": "low", "name": "filter", "config": {"expression": "${v} <= 2"}, "next": ["merge"]},
            {"id": "high", "name": "filter", "config": {"expression": "${v} >= 4"}, "next": ["merge"]},
            {"id": "merge", "name": "union_merge", "config": {}, "next": []},
        ],
    }
    out = run_flow(spark, flow)
    assert sorted(r["v"] for r in out["merge"].collect()) == [1, 2, 4]


def test_join_two_generators(spark):
    flow = {
        "generators": [
            {"id": "facts", "name": "inline",
             "config": {"rows": [[1, 10.0], [2, 20.0]], "columns": ["k", "amount"]},
             "next": ["j"]},
            {"id": "dims", "name": "inline",
             "config": {"rows": [[1, "one"]], "columns": ["k", "label"]},
             "next": ["j"]},
        ],
        "processors": [
            {"id": "j", "name": "join", "config": {"on": ["k"], "how": "left", "broadcast": True}, "next": []}
        ],
    }
    out = run_flow(spark, flow)
    got = {r["k"]: r["label"] for r in out["j"].collect()}
    assert got == {1: "one", 2: None}


def test_config_params_substitution(spark, sf_dir):
    """#{param} config-time substitution (utils.scala:150-162)."""
    flow = {
        "generators": [
            {"id": "g", "name": "parquet", "config": {"path": "#{dir}/orders.parquet"}, "next": ["t"]}
        ],
        "processors": [
            {"id": "t", "name": "take", "config": {"n": "#{n}", "by": ["o_orderkey"]}, "next": []}
        ],
    }
    out = run_flow(spark, flow, params={"dir": sf_dir, "n": 5})
    assert out["t"].count() == 5


def test_dead_node_pruning(spark):
    """Processors unreachable from a generator are never compiled
    (Dispatcher.scala:94-104) — even if they'd error."""
    flow = {
        "generators": [
            {"id": "g", "name": "inline", "config": {"rows": [[1]], "columns": ["v"]}, "next": ["ok"]}
        ],
        "processors": [
            {"id": "ok", "name": "skip", "config": {}, "next": []},
            {"id": "dead", "name": "filter", "config": {"expression": "${missing_col} > 0"}, "next": []},
        ],
    }
    outputs = compile_flow(spark, flow)
    assert "dead" not in outputs and "ok" in outputs


def test_unknown_edge_raises(spark):
    flow = {
        "generators": [
            {"id": "g", "name": "inline", "config": {"rows": [[1]], "columns": ["v"]}, "next": ["nope"]}
        ],
        "processors": [],
    }
    with pytest.raises(FlowError):
        compile_flow(spark, flow)


def test_flow_from_file(spark, tmp_path, sf_dir):
    import json

    cfg = {
        "generators": [
            {"id": "g", "name": "parquet", "config": {"path": f"{sf_dir}/region.parquet"}, "next": ["c"]}
        ],
        "processors": [{"id": "c", "name": "field_filter", "config": {"fields": ["r_name"]}, "next": []}],
    }
    path = tmp_path / "flow.json"
    path.write_text(json.dumps(cfg))
    out = run_flow(spark, str(path))
    assert out["c"].count() == 5


def test_streaming_flow_end_to_end(spark):
    """Unbounded flow: rate_stream generator -> arithmetic -> filter,
    run as a streaming query through the same compiler path."""
    import time

    from tuktu_spark.flow.compiler import run_stream_flow

    flow = {
        "generators": [
            {
                "id": "src",
                "name": "rate_stream",
                "config": {"rows_per_second": 50, "constant": {"tag": "t"}},
                "next": ["calc"],
            }
        ],
        "processors": [
            {
                "id": "calc",
                "name": "arithmetic",
                "config": {"expression": "${value} * 2", "field": "doubled"},
                "next": ["keep"],
            },
            {
                "id": "keep",
                "name": "filter",
                "config": {"expression": "${doubled} >= 0"},
                "next": [],
            },
        ],
    }
    q, name = run_stream_flow(spark, flow, node="keep")
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            q.processAllAvailable()
            if spark.table(name).count() > 0:
                break
            time.sleep(0.5)
        rows = spark.table(name).collect()
        assert rows and all(r["doubled"] == 2 * r["value"] for r in rows)
        assert all(r["tag"] == "t" for r in rows)
    finally:
        q.stop()


def test_example_flows_run(spark, sf_dir):
    """The flows/examples corpus (the reference's configs/flowtests
    analogue) must compile and run end-to-end."""
    import os

    from tuktu_spark.flow import run_flow

    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "flows", "examples")
    out = run_flow(spark, os.path.join(base, "pricing_summary.json"), params={"dir": sf_dir})
    assert out["top"].count() >= 2

    out = run_flow(spark, os.path.join(base, "dedup_documents.json"), params={"dir": sf_dir})
    comp = out["groups"].collect()
    assert comp and all(r["component"] <= r["id"] for r in comp)

    out = run_flow(spark, os.path.join(base, "text_quality_audit.json"), params={"dir": sf_dir})
    rows = {r["predicted_lang"]: r["docs"] for r in out["agg"].collect()}
    assert sum(rows.values()) > 0

    try:
        out = run_flow(
            spark,
            os.path.join(base, "dedup_documents_bucketed.json"),
            params={"dir": sf_dir},
        )
        comp = out["groups"].collect()
        assert comp and all(r["component"] <= r["id"] for r in comp)
    finally:
        spark.sql("DROP TABLE IF EXISTS doc_shingle_index")


def test_cycle_raises(spark):
    flow = {
        "generators": [
            {"id": "g", "name": "inline", "config": {"rows": [[1]], "columns": ["a"]},
             "next": ["p1"]}
        ],
        "processors": [
            {"id": "p1", "name": "identity", "config": {}, "next": ["p2"]},
            {"id": "p2", "name": "identity", "config": {}, "next": ["p1"]},
        ],
    }
    with pytest.raises(FlowError, match="cycle"):
        compile_flow(spark, flow)


def test_unknown_operator_lists_known_names(spark):
    from tuktu_spark.operators.registry import UnknownOperatorError

    flow = {
        "generators": [
            {"id": "g", "name": "inline", "config": {"rows": [[1]], "columns": ["a"]},
             "next": ["p"]}
        ],
        "processors": [{"id": "p", "name": "no_such_op", "config": {}, "next": []}],
    }
    with pytest.raises(UnknownOperatorError, match="no_such_op"):
        compile_flow(spark, flow)


def test_wrong_input_arity_reports_node(spark):
    flow = {
        "generators": [
            {"id": "g", "name": "inline", "config": {"rows": [[1]], "columns": ["a"]},
             "next": ["j"]}
        ],
        # join needs two inputs but only one parent feeds it
        "processors": [{"id": "j", "name": "join", "config": {"on": ["a"]}, "next": []}],
    }
    with pytest.raises(Exception, match="join"):
        compile_flow(spark, flow)


def test_run_flow_param_value_containing_placeholder_text(spark):
    """A substituted parameter VALUE that itself contains literal '#{x}'
    text must NOT be re-matched by a second substitution pass (run_flow
    used to re-run substitution inside compile_flow with empty maps and
    raise 'missing config parameter')."""
    flow = {
        "generators": [
            {"id": "g", "name": "inline",
             "config": {"rows": [[1]], "columns": ["a"]}, "next": ["p"]}
        ],
        "processors": [
            {"id": "p", "name": "add_constant",
             "config": {"field": "note", "value": "#{msg}"}, "next": []}
        ],
    }
    out = run_flow(spark, flow, params={"msg": "see #{docs} for details"})
    (df,) = out.values()
    assert df.first()["note"] == "see #{docs} for details"
