"""tuktu_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of UnderstandLingBV/Tuktu
(a config-driven streaming dataflow framework; see SURVEY.md) on idiomatic
PySpark: DataFrame/SQL for batch flows, Structured Streaming for unbounded
flows, a small flow compiler for Tuktu-style JSON flow specs, and an
expression translator for Tuktu's arithmetic/predicate/template languages.

Layout:
    session       SparkSession factory tuned for scale (AQE, UTC, Arrow)
    tables        test-corpus parquet loaders / view registration
    expressions   Tuktu expression languages -> pyspark Column translator
    operators     DataFrame -> DataFrame operator library + registry
    sources       batch/streaming source wrappers
    sinks         sink wrappers
    flow          flow-spec (JSON DAG) compiler onto DataFrame lineage
    streaming     Structured Streaming operators (windows, dedup, state)
    llm           LLM-data-pipeline ops (dedup, similarity, text, multimodal)
    ml            pyspark.ml-backed train/apply operators
    queries       benchmark/correctness query registry (driver contract)
"""

__version__ = "0.1.0"
