"""Flow-compiler queries: a Tuktu-style JSON flow spec compiled to
DataFrame lineage, checked against a DuckDB oracle — the full §7.1 vertical
slice on the driver surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..flow import run_flow
from . import query

_FLOW_ORACLE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
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


# ---------------------------------------------------------------------------
# If-then-else routing (meta/IfThenElseProcessor.scala:27-205) as a flow:
# big orders get a 10% discount label, small ones a surcharge label; the
# oracle is the CASE-equivalent.
# ---------------------------------------------------------------------------

_ROUTE_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 100000 THEN 'discount' ELSE 'surcharge' END AS route,
       CASE WHEN o_totalprice >= 100000 THEN o_totalprice * 0.9
            ELSE o_totalprice * 1.1 END AS adjusted
FROM orders
"""

_ROUTE_FLOW = {
    "generators": [
        {
            "id": "src",
            "name": "parquet",
            "config": {"path": "#{dir}/orders.parquet"},
            "next": ["route"],
        }
    ],
    "processors": [
        {
            "id": "route",
            "name": "if_then_else",
            "config": {
                "condition": "${o_totalprice} >= 100000",
                "then": [
                    {"name": "add_constant", "config": {"field": "route", "value": "discount"}},
                    {"name": "arithmetic", "config": {"expression": "${o_totalprice} * 0.9", "field": "adjusted"}},
                ],
                "else": [
                    {"name": "add_constant", "config": {"field": "route", "value": "surcharge"}},
                    {"name": "arithmetic", "config": {"expression": "${o_totalprice} * 1.1", "field": "adjusted"}},
                ],
            },
            "next": ["proj"],
        },
        {
            "id": "proj",
            "name": "select",
            "config": {"fields": ["o_orderkey", "route", "adjusted"]},
            "next": [],
        },
    ],
}


@query("flow_if_then_else", oracle=_ROUTE_ORACLE, tags=("flow", "meta"))
def flow_if_then_else(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_flow(spark, _ROUTE_FLOW, params={"dir": sf_dir})["proj"]


# ---------------------------------------------------------------------------
# NumberWithProbability (ProbabilityProcessors.scala:13-42) in deterministic
# hash mode: the md5-derived uniform is reproducible in any engine, so the
# discrete draw itself is oracle-checkable.
# ---------------------------------------------------------------------------

_PROB_ORACLE = """
WITH u AS (
  SELECT event_id,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT)
           / CAST(1152921504606846976 AS DOUBLE) AS uni
  FROM events
)
SELECT event_id,
       CASE WHEN uni < 0.2 THEN 'rare' WHEN uni < 0.7 THEN 'common' ELSE 'frequent' END AS draw
FROM u
"""


@query("flow_probability_draw", oracle=_PROB_ORACLE, tags=("flow", "meta"))
def flow_probability_draw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import make_operator
    from ..tables import load_table

    op = make_operator(
        "number_with_probability",
        {
            "outcomes": ["rare", "common", "frequent"],
            "probabilities": [0.2, 0.5, 0.3],
            "as": "draw",
            "hash_key": "event_id",
        },
    )
    return op(load_table(spark, sf_dir, "events")).select("event_id", "draw")


# ---------------------------------------------------------------------------
# Recursive lookup (nosql/processors/sql/RecursiveLookup.scala): descendant
# traversal of the implicit binary user tree (parent = user_id // 2), seeded
# at user 1 — oracled by a recursive CTE.
# ---------------------------------------------------------------------------

_RECURSIVE_ORACLE = """
WITH RECURSIVE users AS (
  SELECT DISTINCT user_id FROM events
), edges AS (
  SELECT CAST(user_id // 2 AS BIGINT) AS parent, user_id AS child
  FROM users WHERE user_id > 1
), walk(root, node, depth) AS (
  SELECT CAST(1 AS BIGINT), CAST(1 AS BIGINT), 0
  UNION ALL
  SELECT w.root, e.child, w.depth + 1
  FROM walk w JOIN edges e ON e.parent = w.node
  WHERE w.depth < 12
)
SELECT root AS user_id, node, depth FROM walk
"""


@query("flow_recursive_lookup", oracle=_RECURSIVE_ORACLE, tags=("flow", "meta", "join"))
def flow_recursive_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.iterative import bfs_expand
    from ..tables import load_table

    users = load_table(spark, sf_dir, "events").select("user_id").distinct()
    edges = users.filter(F.col("user_id") > 1).select(
        (F.col("user_id") / 2).cast("long").alias("parent"),
        F.col("user_id").alias("child"),
    )
    seed = users.filter(F.col("user_id") == 1)
    return bfs_expand(seed, edges, "user_id", "parent", "child", max_iterations=12)


# ---------------------------------------------------------------------------
# Kitchen-sink row-transform flow: chains the small §2.3/§2.8 processors
# (copy, rename, iterated replace, fields->list, length, head, implode)
# through the flow compiler in one oracle-checked pass — operator
# composition evidence on the driver surface.
# ---------------------------------------------------------------------------

_SINK_FLOW = {
    "generators": [
        {
            "id": "src",
            "name": "parquet",
            "config": {"path": "#{dir}/nation.parquet"},
            "next": ["copy"],
        }
    ],
    "processors": [
        {"id": "copy", "name": "field_copy",
         "config": {"copies": [{"path": "n_name", "as": "name2"}]}, "next": ["rep"]},
        {"id": "rep", "name": "replace",
         "config": {"field": "name2", "replacements": [["A", "@"], ["E", "3"]]},
         "next": ["ren"]},
        {"id": "ren", "name": "field_rename",
         "config": {"renames": {"n_comment": "comment"}}, "next": ["lst"]},
        {"id": "lst", "name": "fields_to_list",
         "config": {"fields": ["n_name", "name2"], "field": "pair"}, "next": ["len"]},
        {"id": "len", "name": "seq_length",
         "config": {"field": "pair", "as": "pair_n"}, "next": ["head"]},
        {"id": "head", "name": "head_of_list",
         "config": {"field": "pair", "as": "first_name"}, "next": ["imp"]},
        {"id": "imp", "name": "array_join",
         "config": {"field": "pair", "separator": "-", "as": "joined"}, "next": ["proj"]},
        {"id": "proj", "name": "select",
         "config": {"fields": ["n_nationkey", "name2", "pair_n", "first_name", "joined"]},
         "next": []},
    ],
}

_SINK_ORACLE = """
SELECT n_nationkey,
       replace(replace(n_name, 'A', '@'), 'E', '3') AS name2,
       2 AS pair_n,
       n_name AS first_name,
       n_name || '-' || replace(replace(n_name, 'A', '@'), 'E', '3') AS joined
FROM nation
"""


@query("flow_row_transform_chain", oracle=_SINK_ORACLE, tags=("flow", "projection", "reshape"))
def flow_row_transform_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_flow(spark, _SINK_FLOW, params={"dir": sf_dir})["proj"]
