"""Join / merge operators (SURVEY.md §2.4).

The reference's JoinGenerator is a hand-rolled symmetric hash join over
Akka workers (JoinGenerator.scala:29-151, inner-only, no spill); here a
join is declarative and Catalyst picks broadcast/shuffled-hash/sort-merge —
plus semi/anti/outer variants the reference lacks.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .registry import operator

_HOW = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "full": "full",
    "outer": "full",
    "semi": "left_semi",
    "left_semi": "left_semi",
    "anti": "left_anti",
    "left_anti": "left_anti",
    "cross": "cross",
}


@operator("join")
def join(config: dict):
    """Equi-join of the piped DataFrame with another flow branch.

    config: {"on": [keys] | [[lk, rk], ...], "how": "inner", "broadcast":
    bool} — `broadcast` hints the other side (dimension tables at scale).
    The merge-capable flow compiler passes the second branch; standalone
    use: make_operator(...)(left, right).
    """
    how = _HOW[config.get("how", "inner")]
    on = config["on"]
    broadcast_right = bool(config.get("broadcast", False))

    def transform(left: DataFrame, right: DataFrame | None = None) -> DataFrame:
        if right is None:
            raise ValueError("join operator needs two inputs")
        r = F.broadcast(right) if broadcast_right else right
        if on and isinstance(on[0], (list, tuple)):
            cond = reduce(
                lambda a, b: a & b, [left[lk] == r[rk] for lk, rk in on]
            )
            return left.join(r, cond, how)
        return left.join(r, on, how)

    return transform


@operator("union_merge", "serial_merge")
def union_merge(config: dict):
    """SerialMerger (merge/BaseMergers.scala:90-97): UNION ALL of branches;
    missing columns padded with nulls (Tuktu rows are schemaless maps)."""
    allow_missing = bool(config.get("allow_missing_columns", True))

    def transform(*dfs: DataFrame) -> DataFrame:
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), dfs
        )

    return transform


@operator("zip_merge", "simple_merge")
def zip_merge(config: dict):
    """SimpleMerger (merge/BaseMergers.scala:14-21): positional zip-union of
    branch rows, later branches overwrite shared fields. Distributed via
    row_number equi-join over an explicit per-branch order.

    config.order_by: {branch_index(str): [cols]} or a single list for all.
    """
    order_by = config["order_by"]
    padding = bool(config.get("padding", False))  # PaddingMerger: keep longer side

    def transform(*dfs: DataFrame) -> DataFrame:
        numbered = []
        for i, df in enumerate(dfs):
            ob = order_by[str(i)] if isinstance(order_by, dict) else order_by
            w = Window.orderBy(*ob)
            numbered.append(df.withColumn("__rn__", F.row_number().over(w)))
        how = "full" if padding else "inner"
        out = numbered[0]
        for nxt in numbered[1:]:
            dup = [c for c in nxt.columns if c in out.columns and c != "__rn__"]
            out = out.drop(*dup).join(nxt, "__rn__", how)
        return out.drop("__rn__")

    return transform


@operator("lookup_join")
def lookup_join(config: dict):
    """SQLProcessor append-mode / MongoDBFindProcessor (sql.scala:46-111) —
    per-row lookup rewritten as a broadcast left join (the reference's
    `distinct` memoization becomes the join itself)."""
    on = config["on"]
    how = _HOW[config.get("how", "left")]

    def transform(left: DataFrame, right: DataFrame | None = None) -> DataFrame:
        if right is None:
            raise ValueError("lookup_join needs a lookup-side input")
        return left.join(F.broadcast(right), on, how)

    return transform


@operator("intersect_merge")
def intersect_merge(config: dict):
    """Set intersection of branches — absent in the reference (SURVEY §2.6
    note); Spark-native. ``all=True`` keeps duplicates (INTERSECT ALL)."""
    keep_dups = bool(config.get("all", False))

    def transform(*dfs: DataFrame) -> DataFrame:
        out = dfs[0]
        for nxt in dfs[1:]:
            out = out.intersectAll(nxt) if keep_dups else out.intersect(nxt)
        return out

    return transform


@operator("except_merge")
def except_merge(config: dict):
    """Set difference of branches (first minus the rest) — Spark-native."""
    keep_dups = bool(config.get("all", False))

    def transform(*dfs: DataFrame) -> DataFrame:
        out = dfs[0]
        for nxt in dfs[1:]:
            out = out.exceptAll(nxt) if keep_dups else out.subtract(nxt)
        return out

    return transform
