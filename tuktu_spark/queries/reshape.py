"""Reshaping queries: explode/implode, JSON ops, string functions —
SURVEY.md §2.8 on the driver surface with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import make_operator
from ..tables import load_table
from . import query

# ---------------------------------------------------------------------------
# Explode — SequenceExploderProcessor (BaseProcessors.scala:900-918) +
# StringSplitterProcessor (:1004-1025): tokenize text, one row per token,
# then histogram. Explode happens before the aggregate, so the shuffle
# carries (token, partial count) — map-side combine keeps it small.
# ---------------------------------------------------------------------------

_TOKENS_ORACLE = """
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
WHERE token <> ''
GROUP BY token
"""


@query("explode_token_histogram", oracle=_TOKENS_ORACLE, tags=("reshape", "explode"))
def explode_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Implode — KeyImploderProcessor (BaseProcessors.scala:785-802): gather
# values per group into an ordered list (string-joined for engine-portable
# comparison).
# ---------------------------------------------------------------------------

_IMPLODE_ORACLE = """
SELECT lang, string_agg(doc_id, ',' ORDER BY doc_id) AS ids
FROM documents GROUP BY lang
"""


@query("implode_ids_per_lang", oracle=_IMPLODE_ORACLE, tags=("reshape", "implode"))
def implode_ids_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.array_join(
            F.transform(F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")),
            ",",
        ).alias("ids")
    )


# ---------------------------------------------------------------------------
# JSON fetch — JsonFetcherProcessor (BaseProcessors.scala:234-263) /
# JSONParseProcessor: pull $.k out of the events props JSON.
# ---------------------------------------------------------------------------

_JSON_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       COUNT(*) AS n
FROM events
GROUP BY event_type
"""


@query("json_fetch_props", oracle=_JSON_ORACLE, tags=("reshape", "json"))
def json_fetch_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("k_sum"), F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# from_json + struct access — ConvertFromJson (processors/json/*): typed
# parse, filter on a parsed field.
# ---------------------------------------------------------------------------

_PARSE_ORACLE = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 95
"""


@query("json_parse_filter", oracle=_PARSE_ORACLE, tags=("reshape", "json"))
def json_parse_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    parsed = e.withColumn("obj", F.from_json("props", "k int"))
    return (
        parsed.select("event_id", F.col("obj.k").alias("k"))
        .filter(F.col("k") >= 95)
    )


# ---------------------------------------------------------------------------
# String scalar functions — ReplaceProcessor / StringImploder etc. over
# customer names; engine-portable subset (no initcap in DuckDB 1.0).
# ---------------------------------------------------------------------------

_STRINGS_ORACLE = """
SELECT c_custkey,
       upper(c_name) AS uc,
       lower(c_mktsegment) AS lc,
       substring(c_name, 1, 8) AS prefix,
       length(c_name) AS len,
       replace(c_name, '#', '-') AS replaced,
       concat(c_mktsegment, ':', c_custkey) AS tagged
FROM customer
"""


@query("string_functions", oracle=_STRINGS_ORACLE, tags=("reshape", "strings"))
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uc"),
        F.lower("c_mktsegment").alias("lc"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.length("c_name").alias("len"),
        F.regexp_replace("c_name", "#", "-").alias("replaced"),
        F.concat_ws("", F.col("c_mktsegment"), F.lit(":"), F.col("c_custkey").cast("string")).alias("tagged"),
    )


# ---------------------------------------------------------------------------
# Array algebra — FieldsToList + DistinctSequence + SequenceLength + flatten
# (BaseProcessors.scala §2.8 family) — built from per-doc token arrays.
# ---------------------------------------------------------------------------

_ARRAY_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
)
SELECT doc_id,
       len(tokens) AS n_tokens,
       len(list_distinct(tokens)) AS n_distinct,
       tokens[1] AS head,
       array_to_string(list_sort(list_distinct(tokens)), ' ') AS sorted_vocab
FROM toks
"""


@query("array_algebra_tokens", oracle=_ARRAY_ORACLE, tags=("reshape", "array"))
def array_algebra_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("tokens"))
    return toks.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_distinct"),
        F.element_at("tokens", 1).alias("head"),
        F.array_join(F.sort_array(F.array_distinct("tokens")), " ").alias("sorted_vocab"),
    )


# ---------------------------------------------------------------------------
# CSV string round-trip (CSVStringProcessor + CSVReaderProcessor,
# csv/CsvProcessors.scala:22-111): row -> csv line -> named columns.
# ---------------------------------------------------------------------------

_CSV_ROUNDTRIP_ORACLE = """
WITH lines AS (
  SELECT CAST(l_orderkey AS VARCHAR) || ',' || CAST(l_linenumber AS VARCHAR)
         || ',' || l_returnflag AS csv
  FROM lineitem
)
SELECT csv,
       string_split(csv, ',')[1] AS k,
       string_split(csv, ',')[2] AS ln,
       string_split(csv, ',')[3] AS flag
FROM lines
"""


@query("reshape_csv_roundtrip", oracle=_CSV_ROUNDTRIP_ORACLE, tags=("reshape", "csv"))
def reshape_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    to_csv = make_operator(
        "csv_string", {"fields": ["l_orderkey", "l_linenumber", "l_returnflag"], "as": "csv"}
    )
    parse = make_operator(
        "csv_parse", {"field": "csv", "headers": ["k", "ln", "flag"]}
    )
    return parse(to_csv(li)).select("csv", "k", "ln", "flag")


# ---------------------------------------------------------------------------
# Fixed-width slicing (FixedWidthProcessor, csv/CsvProcessors.scala:179-215).
# ---------------------------------------------------------------------------

_FIXED_WIDTH_ORACLE = """
WITH padded AS (
  SELECT lpad(CAST(l_orderkey AS VARCHAR), 10, '0') || l_returnflag || l_linestatus AS rec
  FROM lineitem
)
SELECT rec,
       substr(rec, 1, 10) AS key_part,
       substr(rec, 11, 1) AS flag,
       substr(rec, 12, 1) AS status
FROM padded
"""


@query("reshape_fixed_width", oracle=_FIXED_WIDTH_ORACLE, tags=("reshape", "csv"))
def reshape_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.concat(
            F.lpad(F.col("l_orderkey").cast("string"), 10, "0"),
            F.col("l_returnflag"),
            F.col("l_linestatus"),
        ).alias("rec")
    )
    op = make_operator(
        "fixed_width",
        {"field": "rec", "widths": [10, 1, 1], "headers": ["key_part", "flag", "status"]},
    )
    return op(li).select("rec", "key_part", "flag", "status")


# ---------------------------------------------------------------------------
# Struct wrap + recursive flatten (DatumToFieldProcessor + FlattenerProcessor,
# BaseProcessors.scala:844-895): nest columns under a struct, flatten back
# to parent<sep>child names.
# ---------------------------------------------------------------------------

_FLATTEN_ORACLE = """
SELECT n_nationkey AS "datum_n_nationkey", n_name AS "datum_n_name"
FROM nation
"""


@query("reshape_struct_flatten", oracle=_FLATTEN_ORACLE, tags=("reshape",))
def reshape_struct_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    na = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    wrap = make_operator("datum_to_field", {"field": "datum"})
    flat = make_operator("flattener", {"separator": "_"})
    return flat(wrap(na))


_DATUM_MERGE_ORACLE = """
SELECT o_orderstatus,
       arg_max(o_orderpriority, o_orderkey) AS o_orderpriority,
       arg_max(o_totalprice, o_orderkey) AS o_totalprice
FROM orders GROUP BY o_orderstatus
"""


@query("reshape_datum_merge", oracle=_DATUM_MERGE_ORACLE, tags=("reshape", "merge"))
def reshape_datum_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DatumMergeProcessor (DatumMergeProcessor.scala:14-18): fold each
    packet (= o_orderstatus group) into one row, later rows (by orderkey)
    winning — the oracle is arg_max since orders columns are non-null."""
    from ..operators import make_operator

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    op = make_operator(
        "datum_merge", {"group": ["o_orderstatus"], "order_by": "o_orderkey"}
    )
    return op(o)


_DOCBUILD_ORACLE = """
SELECT lang,
       string_agg(text, ' | ' ORDER BY doc_id) AS document
FROM documents
GROUP BY lang
"""


@query("reshape_document_build", oracle=_DOCBUILD_ORACLE, tags=("reshape", "nlp"))
def reshape_document_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DocumentProcessor (nlp/processors/DocumentProcessor.scala:14-40):
    merge each language's document texts into one document, ordered by id."""
    from ..operators import make_operator

    d = load_table(spark, sf_dir, "documents").select("lang", "doc_id", "text")
    op = make_operator(
        "document_build",
        {
            "field": "text",
            "group": ["lang"],
            "order_by": "doc_id",
            "separator": " | ",
        },
    )
    return op(d)


# ---------------------------------------------------------------------------
# Spreadsheet source round-trips (XlsGenerator / XlsxGenerator): 50 docs'
# facts written to a REAL .xls (native BIFF8 writer) / .xlsx (SpreadsheetML
# writer) and read back through the registered source — driver-level
# evidence for both spreadsheet readers. The oracle recomputes the same
# facts from the documents table directly; every cell type (string, RK
# int, NUMBER double, BOOLERR bool) crosses the file format.
# ---------------------------------------------------------------------------

_SHEET_ORACLE = """
SELECT doc_id, lang,
       CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
            AS BIGINT) AS n_toks,
       octet_length(encode(text)) * 0.25 + 0.125 AS qlen,
       doc_id % 2 = 0 AS even
FROM documents WHERE doc_id < 50
"""


def _sheet_rows(spark: SparkSession, sf_dir: str) -> list[list]:
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            "lang",
            F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_toks"),
            (F.octet_length("text") * 0.25 + 0.125).alias("qlen"),
            (F.col("doc_id") % 2 == 0).alias("even"),
        )
        .orderBy("doc_id")
    )
    rows = [["doc_id", "lang", "n_toks", "qlen", "even"]]
    for r in d.collect():  # 50 rows — config-scale by construction
        rows.append([int(r["doc_id"]), r["lang"], int(r["n_toks"]), float(r["qlen"]), bool(r["even"])])
    return rows


_SHEET_PATHS: dict[str, str] = {}


def _sheet_path(fmt: str) -> str:
    # One mkstemp-created file per (process, fmt), reused across invocations
    # and removed at exit — no mktemp race, no per-call temp-file leak.
    if fmt not in _SHEET_PATHS:
        import atexit
        import os
        import tempfile

        fd, path = tempfile.mkstemp(suffix=f".{fmt}", prefix="tuktu_sheet_")
        os.close(fd)
        atexit.register(lambda p=path: os.path.exists(p) and os.unlink(p))
        _SHEET_PATHS[fmt] = path
    return _SHEET_PATHS[fmt]


def _sheet_source_query(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    from ..operators import make_source
    from ..operators.xls_biff import make_xls, make_xlsx

    rows = _sheet_rows(spark, sf_dir)
    data = make_xls(rows) if fmt == "xls" else make_xlsx(rows)
    path = _sheet_path(fmt)
    with open(path, "wb") as f:
        f.write(data)
    df = make_source(spark, "xls", {"path": path, "header": True})
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        F.col("n_toks").cast("long").alias("n_toks"),
        F.col("qlen").cast("double").alias("qlen"),
        "even",
    )


@query("source_xls_roundtrip", oracle=_SHEET_ORACLE, tags=("source", "xls"))
def source_xls_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sheet_source_query(spark, sf_dir, "xls")


@query("source_xlsx_roundtrip", oracle=_SHEET_ORACLE, tags=("source", "xlsx"))
def source_xlsx_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sheet_source_query(spark, sf_dir, "xlsx")
