"""Tests for the formerly-partial operators: datum_merge, count_eof,
delay, view_delete, binary_files_sink."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tuktu_spark.operators import make_operator


class TestDatumMerge:
    def test_last_non_null_wins(self, spark):
        df = spark.createDataFrame(
            [
                (1, "a", None, 10),
                (2, None, "x", 20),
                (3, "c", None, None),
            ],
            "ord int, s string, t string, v int",
        )
        op = make_operator("datum_merge", {"order_by": "ord"})
        row = op(df).collect()[0]
        assert row["s"] == "c" and row["t"] == "x" and row["v"] == 20

    def test_grouped_merge(self, spark):
        df = spark.createDataFrame(
            [("g1", 1, "a"), ("g1", 2, "b"), ("g2", 1, "z")],
            "g string, ord int, s string",
        )
        op = make_operator("datum_merge", {"group": ["g"], "order_by": "ord"})
        out = {r["g"]: r["s"] for r in op(df).collect()}
        assert out == {"g1": "b", "g2": "z"}

    def test_deep_map_merge(self, spark):
        df = spark.createDataFrame(
            [
                (1, {"a": "1", "b": "1"}),
                (2, {"b": "2", "c": "2"}),
            ],
            "ord int, m map<string,string>",
        )
        op = make_operator("datum_merge", {"order_by": "ord", "deep": True})
        row = op(df).collect()[0]
        assert row["m"] == {"a": "1", "b": "2", "c": "2"}  # later keys win

    def test_requires_order(self, spark):
        df = spark.createDataFrame([(1,)], "x int")
        with pytest.raises(ValueError, match="order_by"):
            make_operator("datum_merge", {})(df)


class TestCountEofDelay:
    def test_count_eof_passthrough(self, spark, capsys):
        df = spark.createDataFrame([(1,), (2,)], "x int")
        out = make_operator("count_eof", {"label": "probe"})(df)
        assert out.count() == 2
        assert "probe: 2 rows" in capsys.readouterr().out

    def test_delay_batch_sleeps_and_passes_through(self, spark):
        import time

        df = spark.createDataFrame([(1,)], "x int")
        t0 = time.perf_counter()
        out = make_operator("delay", {"delay": 150})(df)
        assert time.perf_counter() - t0 >= 0.15
        assert out.count() == 1


class TestViewDelete:
    def test_keyed_delete(self, spark):
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
        ).createOrReplaceTempView("vd_store")
        df = spark.createDataFrame([(0,)], "x int")
        out = make_operator(
            "view_delete", {"view": "vd_store", "key_field": "k", "values": [1, 3]}
        )(df)
        assert out.count() == 1  # passthrough
        left = sorted(r["k"] for r in spark.table("vd_store").collect())
        assert left == [2]

    def test_predicate_delete(self, spark):
        spark.createDataFrame(
            [(1, 5.0), (2, 50.0)], "k int, v double"
        ).createOrReplaceTempView("vd_store2")
        df = spark.createDataFrame([(0,)], "x int")
        make_operator("view_delete", {"view": "vd_store2", "where": "${v} > 10"})(df)
        assert [r["k"] for r in spark.table("vd_store2").collect()] == [1]


class TestBinaryFilesSink:
    def test_writes_one_file_per_row(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("img1", bytearray(b"\x00\x01")), ("img2", bytearray(b"\xff"))],
            "name string, payload binary",
        )
        out_dir = str(tmp_path / "media")
        out = make_operator(
            "binary_files_sink",
            {"dir": out_dir, "field": "payload", "name_field": "name"},
        )(df)
        assert out.count() == 2
        assert sorted(os.listdir(out_dir)) == ["img1.bin", "img2.bin"]
        with open(os.path.join(out_dir, "img1.bin"), "rb") as f:
            assert f.read() == b"\x00\x01"

    def test_null_payload_skipped(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("a", bytearray(b"x")), ("b", None)], "name string, payload binary"
        )
        out_dir = str(tmp_path / "media2")
        make_operator(
            "binary_files_sink",
            {"dir": out_dir, "field": "payload", "name_field": "name"},
        )(df)
        assert os.listdir(out_dir) == ["a.bin"]


class TestMongoExtras:
    def test_mongo_collections_with_injected_lister(self, spark):
        from tuktu_spark.operators import make_source

        df = make_source(
            spark,
            "mongo_collections",
            {"database": "db1", "lister": lambda db: ["a_coll", "b_coll"]},
        )
        assert [r["collection"] for r in df.collect()] == ["a_coll", "b_coll"]

    def test_mongo_command_with_injected_runner(self, spark):
        from tuktu_spark.operators import make_source

        df = make_source(
            spark,
            "mongo_command",
            {
                "database": "db1",
                "command": {"ping": 1},
                "runner": lambda db, cmd: [{"ok": 1.0, "db": db}],
            },
        )
        assert '"ok": 1.0' in df.first()["reply"]

    def test_mongo_count_with_injected_counter(self, spark):
        from tuktu_spark.operators import make_operator

        df = spark.createDataFrame([(1,), (2,)], "x int")
        out = make_operator(
            "mongo_count",
            {
                "database": "db1",
                "collection": "c",
                "counter": lambda db, coll, f: 42,
            },
        )(df)
        rows = out.collect()
        assert len(rows) == 2 and all(r["mongo_count"] == 42 for r in rows)

    def test_mongo_update_renders_templates_per_row(self, spark, tmp_path):
        # executor-side writer capture: append rendered ops as JSON lines
        # (file-based because foreachPartition runs in worker processes)
        import json as _json
        import uuid

        from tuktu_spark.operators import make_operator

        out_dir = tmp_path / "ops"
        out_dir.mkdir()

        def writer(db, coll, ops, _d=str(out_dir)):
            with open(f"{_d}/{uuid.uuid4().hex}.jsonl", "w") as f:
                for o in ops:
                    f.write(_json.dumps({"db": db, "coll": coll, **o}) + "\n")

        df = spark.createDataFrame(
            [(1, "alice", 9.5), (2, "bob", 3.25)], "id int, name string, score double"
        )
        make_operator(
            "mongo_update",
            {
                "database": "db1",
                "collection": "users",
                "query": {"_id": "#{id}"},
                "update": {"$set": {"name": "#{name}", "score": "#{score}",
                                    "tag": "user-#{id}"}},
                "upsert": True,
                "writer": writer,
            },
        )(df)
        ops = []
        for p in out_dir.iterdir():
            ops += [_json.loads(line) for line in open(p)]
        by_id = {o["query"]["_id"]: o for o in ops}
        # whole-string placeholder keeps the native type; embedded ones
        # interpolate as text
        assert by_id[1]["update"]["$set"] == {
            "name": "alice", "score": 9.5, "tag": "user-1",
        }
        assert by_id[2]["update"]["$set"]["score"] == 3.25
        assert all(o["upsert"] and not o["multi"] for o in ops)
        assert all(o["db"] == "db1" and o["coll"] == "users" for o in ops)

    def test_mongo_remove_just_one(self, spark, tmp_path):
        import json as _json
        import uuid

        from tuktu_spark.operators import make_operator

        out_dir = tmp_path / "rm"
        out_dir.mkdir()

        def writer(db, coll, ops, _d=str(out_dir)):
            with open(f"{_d}/{uuid.uuid4().hex}.jsonl", "w") as f:
                for o in ops:
                    f.write(_json.dumps(o) + "\n")

        df = spark.createDataFrame([("k1",), ("k2",)], "key string")
        make_operator(
            "mongo_remove",
            {
                "database": "db1",
                "collection": "users",
                "query": {"key": "#{key}", "status": "stale"},
                "just_one": True,
                "writer": writer,
            },
        )(df)
        ops = []
        for p in out_dir.iterdir():
            ops += [_json.loads(line) for line in open(p)]
        assert sorted(o["query"]["key"] for o in ops) == ["k1", "k2"]
        assert all(o["query"]["status"] == "stale" and o["just_one"] for o in ops)


class TestXlsxReader:
    @pytest.fixture(scope="class")
    def xlsx_file(self, tmp_path_factory):
        # hand-written SpreadsheetML zip: independent of the reader code
        import zipfile

        d = tmp_path_factory.mktemp("xlsx")
        path = d / "book.xlsx"
        m = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        shared = (
            f'<?xml version="1.0"?><sst xmlns="{m}" count="3" uniqueCount="3">'
            "<si><t>name</t></si><si><t>score</t></si><si><t>alice</t></si></sst>"
        )
        sheet = (
            f'<?xml version="1.0"?><worksheet xmlns="{m}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
            '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>9.5</v></c></row>'
            # row with a gap (no A3) and an inline string + boolean
            '<row r="3"><c r="B3" t="inlineStr"><is><t>bob</t></is></c>'
            '<c r="C3" t="b"><v>1</v></c></row>'
            "</sheetData></worksheet>"
        )
        ct = (
            '<?xml version="1.0"?><Types '
            'xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>'
        )
        with zipfile.ZipFile(path, "w") as zf:
            zf.writestr("[Content_Types].xml", ct)
            zf.writestr("xl/sharedStrings.xml", shared)
            zf.writestr("xl/worksheets/sheet1.xml", sheet)
        return str(path)

    def test_read_rows(self, xlsx_file):
        from tuktu_spark.operators.connectors import read_xlsx_rows

        rows = read_xlsx_rows(xlsx_file)
        assert rows[0] == ["name", "score", None]
        assert rows[1] == ["alice", 9.5, None]
        assert rows[2] == [None, "bob", True]

    def test_source_with_header(self, spark, xlsx_file):
        from tuktu_spark.operators import make_source

        df = make_source(spark, "xlsx", {"path": xlsx_file})
        assert df.columns[:2] == ["name", "score"]
        # mixed float/string "score" column stays string; the all-boolean
        # third column is typed boolean (parity with the pandas .xls path)
        assert dict(df.dtypes)["_c2"] == "boolean"
        got = [tuple(r) for r in df.collect()]
        assert ("alice", "9.5", None) in got
        assert (None, "bob", True) in got

    def test_source_typed_numeric_columns(self, spark, tmp_path):
        import zipfile

        from tuktu_spark.operators import make_source

        m = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        sheet = (
            f'<?xml version="1.0"?><worksheet xmlns="{m}"><sheetData>'
            '<row r="1"><c r="A1" t="inlineStr"><is><t>n</t></is></c>'
            '<c r="B1" t="inlineStr"><is><t>x</t></is></c></row>'
            '<row r="2"><c r="A2"><v>3</v></c><c r="B2"><v>9.5</v></c></row>'
            '<row r="3"><c r="A3"><v>4</v></c><c r="B3"><v>2</v></c></row>'
            "</sheetData></worksheet>"
        )
        path = tmp_path / "typed.xlsx"
        with zipfile.ZipFile(path, "w") as zf:
            zf.writestr("xl/worksheets/sheet1.xml", sheet)
        df = make_source(spark, "xlsx", {"path": str(path)})
        assert dict(df.dtypes) == {"n": "bigint", "x": "double"}
        assert sorted(tuple(r) for r in df.collect()) == [(3, 9.5), (4, 2.0)]

    def test_legacy_xls_still_gated(self, spark, tmp_path):
        from tuktu_spark.operators import make_source

        p = tmp_path / "old.xls"
        p.write_bytes(b"\xd0\xcf\x11\xe0junk")
        with pytest.raises(Exception):
            make_source(spark, "xls", {"path": str(p)})


class TestKinesisInjectable:
    """r8 (verdict #9): the kinesis seams promoted from connector-gated
    partials to injectable-client-tested, the mongo pattern."""

    def test_source_with_injected_reader(self, spark):
        from tuktu_spark.operators.registry import make_source

        def reader(stream_name):
            assert stream_name == "events"
            return [
                {"data": b'{"id": 1}', "partitionKey": "a",
                 "sequenceNumber": "49590338271490256608559692538361571095921575989136588898"},
                {"data": '{"id": 2}', "partitionKey": "b",
                 "sequenceNumber": "49590338271490256608559692538361571095921575989136588899"},
            ]

        df = make_source(
            spark, "kinesis", {"stream": "events", "reader": reader}
        )
        rows = sorted(df.collect(), key=lambda r: r["partitionKey"])
        assert [bytes(r["data"]) for r in rows] == [b'{"id": 1}', b'{"id": 2}']
        assert [r["streamName"] for r in rows] == ["events", "events"]
        assert df.columns == [
            "data", "partitionKey", "sequenceNumber", "streamName"
        ]

    def test_sink_batches_and_partition_keys(self, spark, tmp_path):
        # executor-side putter capture (file-based: foreachPartition runs
        # in worker processes), incl. the 500-record PutRecords chunking
        import json as _json
        import uuid

        from tuktu_spark.operators import make_operator

        out_dir = tmp_path / "puts"
        out_dir.mkdir()

        def putter(stream_name, records, _d=str(out_dir)):
            with open(f"{_d}/{uuid.uuid4().hex}.json", "w") as f:
                _json.dump(
                    {
                        "stream": stream_name,
                        "n": len(records),
                        "records": [
                            {"Data": r["Data"].decode(), "PartitionKey": r["PartitionKey"]}
                            for r in records
                        ],
                    },
                    f,
                )

        df = spark.range(1203).select(
            F.concat(F.lit("payload-"), F.col("id")).alias("data"),
            (F.col("id") % 7).cast("string").alias("shard"),
        ).coalesce(1)  # one partition -> chunking must split into 500s
        make_operator(
            "kinesis_sink",
            {"stream": "out-stream", "partition_key_field": "shard",
             "putter": putter},
        )(df)
        calls = [
            _json.load(open(p)) for p in sorted(out_dir.iterdir())
        ]
        assert sorted(c["n"] for c in calls) == [203, 500, 500]
        assert all(c["stream"] == "out-stream" for c in calls)
        got = {
            r["Data"]: r["PartitionKey"] for c in calls for r in c["records"]
        }
        assert len(got) == 1203
        assert got["payload-13"] == str(13 % 7)

    def test_sink_default_path_reaches_real_client(self, spark, monkeypatch):
        """Without an injected putter the sink must build the REAL boto3
        client executor-side. Deterministic on any machine: fake
        credentials (so ambient AWS credentials can never be used) and an
        endpoint_url at a dead local port (so no real AWS endpoint is
        ever contacted) force a connection failure that proves the real
        put_records call was attempted. Without boto3 the remediation
        NotImplementedError fires instead."""
        import pytest

        from tuktu_spark.operators import make_operator

        monkeypatch.setenv("AWS_ACCESS_KEY_ID", "testing")
        monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "testing")
        monkeypatch.setenv("AWS_EC2_METADATA_DISABLED", "true")
        df = spark.createDataFrame([("x",)], "data string")
        cfg = {
            "stream": "s",
            "endpoint_url": "http://127.0.0.1:9",  # discard port: dead
            "max_retries": 0,
        }
        try:
            import boto3  # noqa: F401

            with pytest.raises(Exception) as ei:
                make_operator("kinesis_sink", cfg)(df)
            msg = str(ei.value)
            # either failure proves the real client path executed: the
            # dead endpoint refused the connection, or (executor workers
            # predate the monkeypatched env) the credential chain ran dry
            # before the connection attempt. Both are boto3-internal.
            assert any(
                s in msg
                for s in (
                    "127.0.0.1:9", "Could not connect",
                    "EndpointConnectionError", "Connection refused",
                    "NoCredentialsError", "credentials",
                )
            ), msg
        except ImportError:
            with pytest.raises(NotImplementedError, match="boto3|putter"):
                make_operator("kinesis_sink", cfg)(df)

    def test_sink_retries_failed_subset_and_skips_nulls(self, spark, tmp_path):
        """PutRecords partial failures: the sink must re-put EXACTLY the
        records whose response row carries an ErrorCode, and give up
        loudly after max_retries. NULL data rows are skipped."""
        import json as _json
        import uuid

        import pytest

        from tuktu_spark.operators import make_operator

        out_dir = tmp_path / "attempts"
        out_dir.mkdir()

        def flaky_putter(stream_name, records, _d=str(out_dir)):
            # persist what this attempt saw (worker-process capture)
            with open(f"{_d}/{uuid.uuid4().hex}.json", "w") as f:
                _json.dump([r["Data"].decode() for r in records], f)
            # the full batch (contains p0): fail the odd payloads
            if any(r["Data"].decode() == "p0" for r in records):
                return {
                    "FailedRecordCount": sum(
                        int(r["Data"].decode().endswith(("1", "3", "5")))
                        for r in records
                    ),
                    "Records": [
                        {"ErrorCode": "ProvisionedThroughputExceededException"}
                        if r["Data"].decode().endswith(("1", "3", "5"))
                        else {"SequenceNumber": "ok"}
                        for r in records
                    ],
                }
            return None  # retry batch: all good

        rows = [(f"p{i}",) for i in range(6)] + [(None,)]
        df = spark.createDataFrame(rows, "data string").coalesce(1)
        make_operator(
            "kinesis_sink", {"stream": "s", "putter": flaky_putter}
        )(df)
        attempts = sorted(
            (_json.load(open(p)) for p in out_dir.iterdir()), key=len,
            reverse=True,
        )
        assert attempts[0] == [f"p{i}" for i in range(6)]  # NULL skipped
        assert attempts[1] == ["p1", "p3", "p5"]  # exactly the failed set

        def always_fails(stream_name, records):
            return {
                "FailedRecordCount": len(records),
                "Records": [{"ErrorCode": "InternalFailure"} for _ in records],
            }

        with pytest.raises(Exception, match="still failing"):
            make_operator(
                "kinesis_sink",
                {"stream": "s", "putter": always_fails, "max_retries": 1},
            )(df)
