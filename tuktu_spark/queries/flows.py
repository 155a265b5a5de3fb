"""Flow-compiler queries: a Tuktu-style JSON flow spec compiled to
DataFrame lineage, checked against a DuckDB oracle — the full §7.1 vertical
slice on the driver surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..flow import run_flow
from . import query

_FLOW_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS DOUBLE) AS n,
       CAST(SUM(l_quantity) AS DOUBLE) AS qty,
       CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
FROM lineitem
WHERE l_quantity >= 25 AND l_linestatus = 'F'
GROUP BY l_returnflag, l_linestatus
"""

# The flow spec is data, not code: generators/processors DAG with #{dir}
# parameterization — compiled by tuktu_spark.flow (Dispatcher analogue).
_PRICING_FLOW = {
    "generators": [
        {
            "id": "src",
            "name": "parquet",
            "config": {"path": "#{dir}/lineitem.parquet"},
            "next": ["filt"],
        }
    ],
    "processors": [
        {
            "id": "filt",
            "name": "filter",
            "config": {"expression": "${l_quantity} >= 25 && ${l_linestatus} == 'F'"},
            "next": ["agg"],
        },
        {
            "id": "agg",
            "name": "aggregate_by_value",
            "config": {
                "group": ["l_returnflag", "l_linestatus"],
                "aggregations": {
                    "n": "count()",
                    "qty": "sum(${l_quantity})",
                    "max_qty": "max(${l_quantity})",
                },
            },
            "next": [],
        },
    ],
}


@query("flow_filter_aggregate", oracle=_FLOW_ORACLE, tags=("flow", "groupby"))
def flow_filter_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = run_flow(spark, _PRICING_FLOW, params={"dir": sf_dir})
    return out["agg"]
