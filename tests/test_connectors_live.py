"""LIVE connector evidence (r8) — no external services needed:

JDBC: Spark ships embedded Derby jars (the hive
metastore dependency), so the sql_table source and jdbc_sink operator can
be exercised against a REAL database inside the sandbox — closing the
'live connector evidence' gap for the JDBC pair (reference:
modules/nosql/app/tuktu/nosql/generators/sql.scala:11-47 and
nosql/sql.scala:46-111) without any external service."""

import pytest
from pyspark.sql import functions as F

from tuktu_spark.operators import make_operator
from tuktu_spark.operators.registry import make_source

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


import contextlib


@contextlib.contextmanager
def serve_http(handler_cls):
    """Shared localhost HTTP scaffolding for every live test here: a
    ThreadingHTTPServer on an ephemeral port, torn down on exit."""
    import http.server
    import threading

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler_cls)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        t.join(timeout=2)



@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def test_jdbc_sink_then_source_roundtrip(spark, derby_url):
    props = {"driver": DRIVER}
    df = spark.createDataFrame(
        [(1, "alice", 9.5), (2, "bob", 3.25), (3, "carol", 7.0)],
        "id int, name string, score double",
    )
    make_operator(
        "jdbc_sink",
        {"url": derby_url, "table": "users", "mode": "overwrite",
         "properties": props},
    )(df)
    back = make_source(
        spark, "sql_table",
        {"url": derby_url, "table": "users", "properties": props},
    )
    got = sorted((r["id"], r["name"], r["score"]) for r in back.collect())
    assert got == [(1, "alice", 9.5), (2, "bob", 3.25), (3, "carol", 7.0)]


def test_jdbc_query_source_and_append_mode(spark, derby_url):
    props = {"driver": DRIVER}
    base = spark.createDataFrame([(1, 10), (2, 20)], "id int, v int")
    make_operator(
        "jdbc_sink",
        {"url": derby_url, "table": "t", "mode": "overwrite",
         "properties": props},
    )(base)
    # append mode really appends in the database
    make_operator(
        "jdbc_sink",
        {"url": derby_url, "table": "t", "mode": "append",
         "properties": props},
    )(spark.createDataFrame([(3, 30)], "id int, v int"))
    # query form: the SQL runs IN the database (derby evaluates it).
    # Spark's JDBC writer creates QUOTED lowercase columns, and Derby
    # upcases unquoted identifiers — so the query must quote them.
    out = make_source(
        spark, "sql_table",
        {"url": derby_url,
         "query": 'SELECT "id", "v" * 2 AS dv FROM t WHERE "v" >= 20',
         "properties": props},
    )
    assert sorted((r["id"], r["DV"]) for r in out.collect()) == [(2, 40), (3, 60)]


def test_jdbc_source_pushes_filter_to_database(spark, derby_url):
    """Predicate pushdown reaches the JDBC scan: the filter appears as
    PushedFilters on the scan node, so the DATABASE prunes rows before
    they cross the wire — the property that matters when the table is
    big and the predicate is selective."""
    props = {"driver": DRIVER}
    make_operator(
        "jdbc_sink",
        {"url": derby_url, "table": "big", "mode": "overwrite",
         "properties": props},
    )(spark.range(100).select(F.col("id").cast("int").alias("id")))
    src = make_source(
        spark, "sql_table",
        {"url": derby_url, "table": "big", "properties": props},
    )
    filtered = src.filter(F.col("id") > 90)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan, plan
    assert "GreaterThan" in plan and "90" in plan, plan
    assert filtered.count() == 9


class TestRestLive:
    """LIVE HTTP evidence for the REST source (r8): a real threaded
    http.server on 127.0.0.1 replaces the r2 urllib monkeypatch — the
    request, headers, method and body all cross a real socket."""

    @pytest.fixture()
    def http_server(self):
        import http.server
        import json

        seen = {}

        class Handler(http.server.BaseHTTPRequestHandler):
            def _reply(self, payload, status=200):
                body = json.dumps(payload).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                seen["get"] = {
                    "path": self.path,
                    "auth": self.headers.get("Authorization"),
                }
                if self.path == "/list":
                    self._reply([{"id": 1}, {"id": 2}, {"id": 3}])
                else:
                    self._reply({"ok": True, "path": self.path})

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                seen["post_body"] = self.rfile.read(n).decode()
                self._reply({"created": True}, status=201)

            def log_message(self, *a):
                pass

        with serve_http(Handler) as base:
            yield base, seen

    def test_get_list_becomes_rows(self, spark, http_server):
        import json

        base, seen = http_server
        df = make_source(
            spark, "rest",
            {"url": f"{base}/list", "headers": {"Authorization": "Bearer x"}},
        )
        rows = df.collect()
        assert [json.loads(r["body"])["id"] for r in rows] == [1, 2, 3]
        assert all(r["status"] == 200 for r in rows)
        assert seen["get"] == {"path": "/list", "auth": "Bearer x"}

    def test_post_body_reaches_server(self, spark, http_server):
        base, seen = http_server
        df = make_source(
            spark, "rest",
            {"url": f"{base}/items", "method": "POST",
             "body": '{"name": "new"}'},
        )
        row = df.collect()[0]
        assert row["status"] == 201 and '"created": true' in row["body"]
        assert seen["post_body"] == '{"name": "new"}'


class TestSmtpLive:
    """LIVE SMTP evidence: a minimal threaded RFC 5321 server on
    127.0.0.1 drives smtp_sink's DEFAULT smtplib path — greeting, MAIL
    FROM / RCPT TO, DATA payload and QUIT all cross a real socket."""

    @pytest.fixture()
    def smtp_server(self):
        import socket
        import threading

        mails = []
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", 0))
        srv.listen(5)
        port = srv.getsockname()[1]
        stop = threading.Event()

        def serve():
            srv.settimeout(0.2)
            while not stop.is_set():
                try:
                    conn, _ = srv.accept()
                except socket.timeout:
                    continue
                with conn:
                    f = conn.makefile("rb")
                    conn.sendall(b"220 test ESMTP\r\n")
                    cur = {"rcpt": []}
                    while True:
                        line = f.readline()
                        if not line:
                            break
                        cmd = line.decode().strip()
                        up = cmd.upper()
                        if up.startswith(("HELO", "EHLO")):
                            conn.sendall(b"250 test\r\n")
                        elif up.startswith("MAIL FROM:"):
                            cur["from"] = cmd[10:].strip("<> ")
                            conn.sendall(b"250 ok\r\n")
                        elif up.startswith("RCPT TO:"):
                            cur["rcpt"].append(cmd[8:].strip("<> "))
                            conn.sendall(b"250 ok\r\n")
                        elif up == "DATA":
                            conn.sendall(b"354 go\r\n")
                            body = []
                            while True:
                                dl = f.readline().decode()
                                if dl.rstrip("\r\n") == ".":
                                    break
                                body.append(dl.rstrip("\r\n"))
                            cur["data"] = "\n".join(body)
                            mails.append(dict(cur))
                            cur = {"rcpt": []}
                            conn.sendall(b"250 queued\r\n")
                        elif up == "QUIT":
                            conn.sendall(b"221 bye\r\n")
                            break
                        else:
                            conn.sendall(b"250 ok\r\n")

        t = threading.Thread(target=serve, daemon=True)
        t.start()
        try:
            yield port, mails
        finally:
            stop.set()
            t.join(timeout=2)
            srv.close()

    def test_default_smtplib_path_delivers(self, spark, smtp_server):
        port, mails = smtp_server
        df = spark.createDataFrame(
            [("ops@example.com", "disk 91% full"),
             ("dev@example.com", "queue empty")],
            "rcpt string, msg string",
        )
        make_operator(
            "smtp_sink",
            {"host": "127.0.0.1", "port": port, "to_field": "rcpt",
             "body_field": "msg", "subject": "alert",
             "from": "noreply@example.com"},
        )(df)
        assert len(mails) == 2
        by_rcpt = {m["rcpt"][0]: m for m in mails}
        assert by_rcpt["ops@example.com"]["from"] == "noreply@example.com"
        assert "disk 91% full" in by_rcpt["ops@example.com"]["data"]
        assert "Subject: alert" in by_rcpt["ops@example.com"]["data"]
        assert "queue empty" in by_rcpt["dev@example.com"]["data"]


def test_flow_rest_to_jdbc_live(spark, tmp_path):
    """The whole config-driven lifecycle LIVE: the rest_to_jdbc example
    flow fetches a real localhost HTTP API through the rest generator,
    lifts fields from each JSON body, and lands rows in embedded Derby
    via jdbc_sink — then the table is read back through the sql_table
    source and matched against what the server served. Tuktu's core
    premise (config DAG over connectors, Dispatcher.scala:348-433)
    exercised with nothing mocked."""
    import http.server
    import json
    import os

    from tuktu_spark.flow import run_flow

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = json.dumps(
                [{"id": 1, "name": "ada"}, {"id": 2, "name": "grace"},
                 {"id": 3}]  # missing name -> json_fetch default
            ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    with serve_http(Handler) as base:
        flow_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "flows", "examples", "rest_to_jdbc.json",
        )
        jdbc_url = f"jdbc:derby:{tmp_path}/flowdb;create=true"
        run_flow(
            spark, flow_path,
            params={
                "url": f"{base}/people",
                "jdbc_url": jdbc_url,
                "table": "people",
            },
        )
        back = make_source(
            spark, "sql_table",
            {"url": jdbc_url, "table": "people",
             "properties": {"driver": DRIVER}},
        )
        got = sorted((r["id"], r["name"]) for r in back.collect())
        assert got == [("1", "ada"), ("2", "grace"), ("3", "unknown")]
