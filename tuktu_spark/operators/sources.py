"""Source operators — Tuktu generators (SURVEY.md §2.1) as DataFrame
builders. Connector-backed sources (jdbc/kafka/...) are thin config
wrappers over Spark's own readers, gated on availability."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import source


@source("parquet")
def parquet(spark: SparkSession, config: dict) -> DataFrame:
    """Parquet file/directory source (predicate pushdown + column pruning)."""
    return spark.read.parquet(config["path"])


@source("csv")
def csv(spark: SparkSession, config: dict) -> DataFrame:
    """CSVGenerator (csv/generators/CsvGenerator.scala:111-218): headers
    present/predefined, separator/quote/escape, error tolerance."""
    reader = spark.read.options(
        header=str(bool(config.get("header", True))).lower(),
        sep=config.get("separator", ","),
        quote=config.get("quote", '"'),
        escape=config.get("escape", "\\"),
        mode=config.get("mode", "PERMISSIVE"),  # error tolerance (:198)
        inferSchema=str(bool(config.get("infer_schema", True))).lower(),
    )
    schema = config.get("schema")
    if schema:
        reader = reader.schema(schema)
    df = reader.csv(config["path"])
    headers = config.get("headers")  # predefined header names
    if headers:
        df = df.toDF(*headers)
    return df


@source("json")
def json(spark: SparkSession, config: dict) -> DataFrame:
    """JSON-lines source with schema inference."""
    return spark.read.json(config["path"])


@source("line", "text")
def line(spark: SparkSession, config: dict) -> DataFrame:
    """LineGenerator (FileGenerators.scala:79-138): one row per line with
    start/end line bounds."""
    df = spark.read.text(config["path"])
    start = config.get("start_line")
    end = config.get("end_line")
    if start is not None or end is not None:
        # file order = partition order of the text scan; materialize the
        # monotonic id, then number it DISTRIBUTED with the persist-free
        # BOUNDED kernel (no single-partition window even for huge files,
        # and no cache pin): for a pure file scan the splits — and hence
        # the monotonic ids — are deterministic under recompute, so the
        # value-based boundary cuts renumber identically after executor
        # loss (round-7, verdict #4; pinned in tests/test_operators.py)
        from .joins import _global_row_number_bounded

        df = df.withColumn("__mid__", F.monotonically_increasing_id())
        df = _global_row_number_bounded(df, ["__mid__"], "__rn__")
        df = df.withColumn("__line__", F.col("__rn__") - 1).drop("__mid__", "__rn__")
        if start is not None:
            df = df.filter(F.col("__line__") >= int(start))
        if end is not None:
            df = df.filter(F.col("__line__") <= int(end))
        df = df.drop("__line__")
    result = config.get("result")
    if result:
        df = df.withColumnRenamed("value", result)
    return df


@source("binary_file")
def binary_file(spark: SparkSession, config: dict) -> DataFrame:
    """BinaryFileGenerator (FileGenerators.scala:241-278): whole-file binary
    content + metadata (path, length)."""
    return spark.read.format("binaryFile").load(config["path"])


@source("files")
def files(spark: SparkSession, config: dict) -> DataFrame:
    """FilesGenerator (FileGenerators.scala:194-210): recursive listing of
    paths matching a glob."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", config.get("glob", "*"))
        .option("recursiveFileLookup", "true")
        .load(config["path"])
        .select(F.col("path"), F.col("length"))
    )


@source("inline", "list")
def inline(spark: SparkSession, config: dict) -> DataFrame:
    """ListGenerator / CustomPacketGenerator (DummyGenerator.scala:120-192):
    literal rows. config: {"rows": [...], "columns": [...] | "value":
    scalar list + "result": name}."""
    if "rows" in config:
        return spark.createDataFrame(
            [tuple(r) if isinstance(r, (list, tuple)) else (r,) for r in config["rows"]],
            config.get("columns") or [config.get("result", "value")],
        )
    values = config["values"]
    name = config.get("result", "value")
    return spark.createDataFrame([(v,) for v in values], [name])


@source("dummy")
def dummy(spark: SparkSession, config: dict) -> DataFrame:
    """DummyGenerator (DummyGenerator.scala:34-85) batch form: the constant
    message repeated max_amount times."""
    n = int(config.get("max_amount", 1))
    return spark.range(n).select(
        F.lit(config.get("message", "message")).alias(config.get("result", "message"))
    )


@source("random")
def random_source(spark: SparkSession, config: dict) -> DataFrame:
    """RandomGenerator (DummyGenerator.scala:90-115): random int < max."""
    n = int(config.get("amount", 1))
    maximum = int(config["max"])
    seed = config.get("seed")
    rand = F.rand(int(seed)) if seed is not None else F.rand()
    return spark.range(n).select(
        F.floor(rand * maximum).cast("int").alias(config.get("result", "num"))
    )


@source("time_sequence")
def time_sequence(spark: SparkSession, config: dict) -> DataFrame:
    """TimeGenerator (TimeGenerator.scala:26-168): timestamp sequence from
    start to end by interval — sequence() + explode, distributed."""
    start, end = config["start"], config["end"]
    interval = config.get("interval", "1 day")
    name = config.get("result", "time")
    return spark.sql(
        f"""SELECT explode(sequence(
              TIMESTAMP '{start}', TIMESTAMP '{end}',
              INTERVAL {interval})) AS {name}"""
    )


@source("sql_table")
def sql_table(spark: SparkSession, config: dict) -> DataFrame:
    """SQLGenerator (nosql/generators/sql.scala:11-47): JDBC query source.
    Needs a JDBC driver on the classpath; config: url, query|table,
    properties."""
    reader = spark.read.format("jdbc").option("url", config["url"])
    if "query" in config:
        reader = reader.option("query", config["query"])
    else:
        reader = reader.option("dbtable", config["table"])
    for k, v in config.get("properties", {}).items():
        reader = reader.option(k, v)
    return reader.load()


@source("view")
def view(spark: SparkSession, config: dict) -> DataFrame:
    """Read a registered temp view / catalog table."""
    return spark.table(config["name"])


@source("rate_stream", "dummy_stream")
def rate_stream(spark: SparkSession, config: dict) -> DataFrame:
    """DummyGenerator unbounded form (DummyGenerator.scala:62-66): a
    Structured Streaming rate source with optional constant fields — flows
    built on it compile to streaming DataFrames and run via
    flow.run_stream_flow."""
    from ..streaming import rate_source

    return rate_source(
        spark,
        rows_per_second=int(config.get("rows_per_second", 10)),
        constant=config.get("constant"),
    )


@source("orc")
def orc(spark: SparkSession, config: dict) -> DataFrame:
    """ORC file/directory source (predicate pushdown + column pruning,
    same contract as the parquet source — Spark-native reader)."""
    return spark.read.orc(config["path"])


@source("avro")
def avro(spark: SparkSession, config: dict) -> DataFrame:
    """Avro source via Spark's external spark-avro module. Gated: the
    jar isn't bundled with pyspark, so a missing format errors with a
    remediation message instead of a raw AnalysisException."""
    try:
        return spark.read.format("avro").load(config["path"])
    except Exception as e:  # noqa: BLE001 - jvm exception types vary
        if "avro" in str(e).lower():
            raise NotImplementedError(
                "avro source needs the spark-avro package on the classpath "
                "(--packages org.apache.spark:spark-avro_2.13:<spark-version>)"
            ) from e
        raise
