"""Query registry — the driver correctness/bench contract.

Every implemented operator from SURVEY.md §2 gets a named query here: a
Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
a DuckDB oracle SQL string computing the same result with the same column
names. ``__spark_entry__`` re-exports this registry.
"""

from __future__ import annotations

import functools
import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from tuktu_spark.tables import ensure_session_confs


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), bench: bool = False):
    """Register a query. ``oracle`` is ANSI SQL runnable by DuckDB over the
    pre-registered views (region nation customer supplier part orders
    lineitem events documents embeddings)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the driver supplies its OWN session; normalize it first
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        REGISTRY[name] = QueryDef(name=name, fn=wrapped, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


_MODULES = (
    "relational",
    "reshape",
    "timeops",
    "llm_dedup",
    "llm_text",
    "llm_similarity",
    "llm_multimodal",
    "flows",
    "ml",
    "streaming",
)

# Queries the driver already hash-verified green against the DuckDB oracle in
# rounds 1-2 (union of CORRECTNESS_r01/r02 green rows). The driver snapshots
# only the first ~50 registry entries per round, so load_all() orders the
# never-driver-checked queries FIRST (oracled before rows-only) and these
# twice-verified ones last — rotating the correctness window over the whole
# surface instead of re-checking the same relational layer every round.
_DRIVER_VERIFIED = frozenset(
    {
        "agg_expr_language", "argmax_field_per_row", "array_algebra_tokens",
        "case_route_buckets", "corr_matrix", "corr_qty_price", "cube_orders",
        "date_trunc_month", "dedup_first_per_key", "drop_offset",
        "explode_token_histogram", "filter_batch_packet", "filter_predicate",
        "filter_regex", "group_agg_orders", "histogram_event_types",
        "implode_ids_per_lang", "join_anti_customers_without_orders",
        "join_asof_latest_ref", "join_orders_customer", "join_range_bands",
        "join_semi_big_spenders", "json_fetch_props", "json_parse_filter",
        "mode_per_group", "normalize_15min_buckets", "pivot_linestatus",
        "q1_pricing_summary", "q5_local_supplier_volume",
        "reshape_csv_roundtrip", "reshape_fixed_width",
        "reshape_struct_flatten", "reshape_datum_merge",
        "reshape_document_build", "rollup_orders", "running_count_per_user",
        "sample_systematic", "select_project", "setop_except_nations",
        "setop_intersect_nations", "stats_midrange_covariance",
        "stats_summary", "stratified_sample_first_k", "string_functions",
        "template_interpolation", "top_k_orders", "tumbling_window_hourly",
        "union_merge_branches", "unpivot_measures", "window_moving_sum",
        "zip_merge_branches",
    }
)


def load_all() -> dict[str, QueryDef]:
    """Import all query modules (idempotent) and return the registry ordered
    so the driver's 50-row correctness window lands on queries that have not
    yet been driver-verified: unchecked-with-oracle first, then unchecked
    rows-only, then the already-green tail."""
    for mod in _MODULES:
        importlib.import_module(f"tuktu_spark.queries.{mod}")

    def rank(item: tuple[str, QueryDef]) -> int:
        name, qd = item
        if name in _DRIVER_VERIFIED:
            return 2
        return 0 if qd.oracle else 1

    return dict(sorted(REGISTRY.items(), key=rank))
