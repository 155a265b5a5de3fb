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


# ---------------------------------------------------------------------------
# FLAGSHIP multimodal curation lifecycle (round-6 verdict #6): the
# flows/examples/webdataset_curation_lifecycle.json spec executed through
# the flow compiler — WebDataset tar ingest -> untar -> sample grouping ->
# real PNG decode + dHash -> perceptual dedup (first per class) ->
# eval-set decontamination (exact-dHash drop) -> PNG tEXt metadata strip
# -> parts-map rebuild -> byte-deterministic reshard into 4 tar shards.
# The oracle replays EVERYTHING in closed form: the synth tar layout
# (media_synth_tar payload='png': w=6+(i+k)%5, h=5+k%3,
# seed=(7i+k)%256, dx from the 7-entry table, dy=7, Author tEXt
# "cam"*(1+i%4), caption 5+(i+13k)%40 bytes), per-bit dHash over the
# gradient (LEAD on the 9x8 nearest-resize grid, luma 4*v), dedup
# row_number, the hamming-0 eval match (docs < 2 are the eval set, so
# their dHash classes vanish from the corpus), tEXt strip arithmetic
# (12 + 6 + 1 + len framing) and the id%4 shard routing.
# ---------------------------------------------------------------------------

_CURATION_ORACLE = """
WITH s AS (
  SELECT doc_id AS i, t.k AS k, doc_id * 10 + t.k AS id,
         6 + (doc_id + t.k) % 5 AS w, 5 + t.k % 3 AS h,
         (doc_id * 7 + t.k) % 256 AS seed,
         CASE (doc_id + t.k) % 7
              WHEN 0 THEN 3 WHEN 1 THEN 253 WHEN 2 THEN 101 WHEN 3 THEN 11
              WHEN 4 THEN 29 WHEN 5 THEN 57 ELSE 201 END AS dx,
         5 + (doc_id + 13 * t.k) % 40 AS txt_len,
         12 + 6 + 1 + 3 * (1 + doc_id % 4) AS meta_len
  FROM documents, LATERAL (SELECT unnest(range(0, 3)) AS k) t
  WHERE doc_id < 120
),
g AS (
  SELECT id, gy.i AS gy, gx.i AS gx,
         (seed + dx * ((gx.i * w) // 9) + 7 * ((gy.i * h) // 8)) % 256 AS v
  FROM s,
       LATERAL (SELECT unnest(range(0, 9)) AS i) gx,
       LATERAL (SELECT unnest(range(0, 8)) AS i) gy
),
b AS (
  SELECT id, gy, gx,
         CASE WHEN LEAD(4 * v) OVER (PARTITION BY id, gy ORDER BY gx) > 4 * v
              THEN 1 ELSE 0 END AS bit
  FROM g
),
hsh AS (
  SELECT id,
         CAST(SUM(CASE WHEN gy < 4 AND gx < 8
                       THEN bit * (CAST(1 AS BIGINT) << ((gy % 4) * 8 + gx))
                       ELSE 0 END) AS BIGINT) AS hi,
         CAST(SUM(CASE WHEN gy >= 4 AND gx < 8
                       THEN bit * (CAST(1 AS BIGINT) << ((gy % 4) * 8 + gx))
                       ELSE 0 END) AS BIGINT) AS lo
  FROM b GROUP BY id
),
reps AS (
  SELECT id FROM (
    SELECT id, ROW_NUMBER() OVER (PARTITION BY hi, lo ORDER BY id) AS rn
    FROM hsh
  ) WHERE rn = 1
),
evalh AS (
  SELECT DISTINCT hi, lo FROM hsh WHERE id < 13
),
kept AS (
  SELECT s.id, s.txt_len, s.meta_len
  FROM s JOIN hsh USING (id) JOIN reps USING (id)
  WHERE NOT EXISTS (SELECT 1 FROM evalh e WHERE e.hi = hsh.hi AND e.lo = hsh.lo)
)
SELECT CAST(id % 4 AS INT) AS shard_idx,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(txt_len) AS BIGINT) AS txt_bytes,
       CAST(SUM(meta_len) AS BIGINT) AS meta_removed
FROM kept GROUP BY 1
"""


def _lifecycle_flow_path() -> str:
    import os

    import tuktu_spark

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(tuktu_spark.__file__))),
        "flows", "examples", "webdataset_curation_lifecycle.json",
    )


@query(
    "flow_multimodal_curation",
    oracle=_CURATION_ORACLE,
    tags=("flow", "llm", "multimodal", "dedup"),
)
def flow_multimodal_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal curation lifecycle as ONE config-driven flow
    (the reference's whole premise — Dispatcher.scala:348-433 — applied
    to the WebDataset curation chain): real tars, real PNG decode, real
    byte surgery, terminal tar packing, one oracle pinning the routing,
    dedup, decontamination and strip arithmetic end to end."""
    out = run_flow(spark, _lifecycle_flow_path(), params={"dir": sf_dir})
    return out["final"].select("shard_idx", "n_samples", "txt_bytes", "meta_removed")
