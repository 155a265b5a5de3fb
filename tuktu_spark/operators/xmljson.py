"""XML parsing and deep JSON merge operators (SURVEY.md §2.8 tail).

Reference: XmlToMapProcessor (BaseProcessors.scala:1247-1268, xmlToMap
utils.scala:502-519), XmlGenerator (FileGenerators.scala:215-236),
JSONMergerProcessor (mergeJson utils.scala:524-539), JSONCreatorProcessor,
FileToJson/FileToString (app/tuktu/processors/file/*.scala).

XML has no Spark-builtin columnar codec in this environment, so parsing
runs as an Arrow-batched pandas UDF over Python's stdlib ElementTree —
per-row independent, so it scales linearly with partitions. Output is a
JSON string column (the dynamic-schema policy of SURVEY §7.3: variant-ish
payloads stay JSON until a schema is declared, then `from_json`).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import operator, source


def _xml_to_obj(text: str):
    """ElementTree node -> plain dict mirroring utils.scala:502-519:
    attributes under '@attrs', text under '#text', children keyed by tag
    (repeated tags become lists)."""
    import xml.etree.ElementTree as ET

    def conv(node):
        out: dict = {}
        if node.attrib:
            out["@attrs"] = dict(node.attrib)
        text_val = (node.text or "").strip()
        children = list(node)
        if not children:
            if out:
                if text_val:
                    out["#text"] = text_val
                return out
            return text_val
        if text_val:
            out["#text"] = text_val
        for ch in children:
            val = conv(ch)
            if ch.tag in out:
                prev = out[ch.tag]
                out[ch.tag] = prev + [val] if isinstance(prev, list) else [prev, val]
            else:
                out[ch.tag] = val
        return out

    root = ET.fromstring(text)
    return {root.tag: conv(root)}


@operator("xml_to_map", "xml_parse")
def xml_to_map(config: dict):
    """Parse an XML string column into a JSON string column (nested map)."""
    field = config["field"]
    result = config.get("as", f"{field}_parsed")

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def parse(col):
        import pandas as pd

        def one(s):
            if s is None:
                return None
            try:
                return json.dumps(_xml_to_obj(s), sort_keys=True)
            except Exception:
                return None

        return pd.Series([one(s) for s in col])

    def transform(df: DataFrame) -> DataFrame:
        return df.withColumn(result, parse(F.col(field)))

    return transform


def deep_merge(a, b):
    """mergeJson (utils.scala:524-539): right side wins scalars, dicts
    merge recursively."""
    if isinstance(a, dict) and isinstance(b, dict):
        out = dict(a)
        for k, v in b.items():
            out[k] = deep_merge(out[k], v) if k in out else v
        return out
    return b


@operator("json_merge")
def json_merge(config: dict):
    """JSONMergerProcessor: deep-merge two JSON string columns."""
    fields = config["fields"]
    result = config.get("as", "merged")

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def merge(*cols):
        import pandas as pd

        def one(vals):
            acc: dict = {}
            for v in vals:
                if v is None:
                    continue
                acc = deep_merge(acc, json.loads(v))
            return json.dumps(acc, sort_keys=True)

        return pd.Series([one(vals) for vals in zip(*cols)])

    def transform(df: DataFrame) -> DataFrame:
        return df.withColumn(result, merge(*[F.col(f) for f in fields]))

    return transform


@operator("json_create")
def json_create(config: dict):
    """JSONCreatorProcessor: build a JSON object column from named column
    references — pure to_json(struct(...)), fully JVM-side."""
    mapping = config["fields"]  # {json_key: column_name}
    result = config.get("as", "json")

    def transform(df: DataFrame) -> DataFrame:
        return df.withColumn(
            result,
            F.to_json(F.struct(*[F.col(c).alias(k) for k, c in mapping.items()])),
        )

    return transform


@source("xml")
def xml_source(spark: SparkSession, config: dict) -> DataFrame:
    """XmlGenerator (FileGenerators.scala:215-236): load an XML file,
    emit one row per node matched by a simple child-path query
    (the reference's iterative \\ query). Driver-side parse (XML configs
    are small); each matched node becomes a JSON string row."""
    import xml.etree.ElementTree as ET

    path = config["path"]
    node_path = config.get("query", ".")
    tree = ET.parse(path)
    nodes = tree.getroot().findall(node_path)
    rows = [(json.dumps(_xml_to_obj(ET.tostring(n, encoding="unicode")), sort_keys=True),) for n in nodes]
    return spark.createDataFrame(rows, "node string")


@source("file_to_string")
def file_to_string(spark: SparkSession, config: dict) -> DataFrame:
    """FileToString (file/FileToString.scala): slurp a whole file into a
    single-row frame."""
    with open(config["path"], encoding=config.get("encoding", "utf-8")) as f:
        content = f.read()
    return spark.createDataFrame([(content,)], f"{config.get('as', 'content')} string")


@source("file_to_json")
def file_to_json(spark: SparkSession, config: dict) -> DataFrame:
    """FileToJson (file/FileToJson.scala): slurp + parse, emit one row per
    top-level element (array) or a single row (object)."""
    with open(config["path"], encoding=config.get("encoding", "utf-8")) as f:
        data = json.load(f)
    items = data if isinstance(data, list) else [data]
    col = config.get("as", "json")
    return spark.createDataFrame(
        [(json.dumps(x, sort_keys=True),) for x in items], f"{col} string"
    )
