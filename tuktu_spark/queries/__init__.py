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
            # Release positional-kernel persists pinned by PREVIOUS query
            # builds (ADVICE r5: without this, every positional query in a
            # long driver/bench session accumulates a cached sorted copy of
            # its input for the session lifetime). Safe at query BUILD
            # time: the prior query's action has completed in the
            # build-run-build-run driver/bench loop; a caller that batches
            # builds before collecting recomputes from lineage instead
            # (deterministic for deterministic upstreams — see
            # _global_row_number's docstring for the nondeterministic case).
            from tuktu_spark.operators.joins import release_positional_persisted

            release_positional_persisted()
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

# Latest round in which the external driver hash-verified each query green
# against the DuckDB oracle (from CORRECTNESS_r0N.json green rows). The
# driver snapshots only the first ~50 registry entries per round, so
# load_all() ROTATES the window by recency instead of excluding verified
# queries outright: never-hash-verified queries come first (oracled before
# rows-only), then queries whose implementation was touched this round
# (_TOUCHED — a regression introduced into a previously-green query must
# not escape re-verification), then everything else by least-recently-
# verified round — so older greens periodically re-enter the window.
_VERIFIED_ROUND = {
    **dict.fromkeys(
        (
            "agg_expr_language", "argmax_field_per_row", "array_algebra_tokens",
            "case_route_buckets", "corr_matrix", "corr_qty_price", "cube_orders",
            "date_trunc_month", "dedup_first_per_key", "drop_offset",
            "explode_token_histogram", "filter_batch_packet", "filter_predicate",
            "filter_regex", "group_agg_orders", "histogram_event_types",
            "implode_ids_per_lang", "join_anti_customers_without_orders",
            "join_asof_latest_ref", "join_orders_customer", "join_range_bands",
            "join_semi_big_spenders", "json_fetch_props", "json_parse_filter",
            "mode_per_group", "pivot_linestatus", "q1_pricing_summary",
            "q5_local_supplier_volume", "reshape_csv_roundtrip",
            "reshape_datum_merge", "reshape_document_build",
            "reshape_fixed_width", "reshape_struct_flatten", "rollup_orders",
            "running_count_per_user", "sample_systematic", "select_project",
            "setop_except_nations", "setop_intersect_nations",
            "stats_midrange_covariance", "stats_summary",
            "stratified_sample_first_k", "string_functions",
            "template_interpolation", "top_k_orders", "union_merge_branches",
            "unpivot_measures", "window_moving_sum", "zip_merge_branches",
        ),
        2,
    ),
    **dict.fromkeys(
        (
            "approx_sketch_accuracy", "calendar_parts",
            "dedup_decontaminate_report", "dedup_embedding_cosine",
            "dedup_exact_md5", "dedup_minhash_components", "dedup_minhash_lsh",
            "dedup_ngram_jaccard", "dedup_simhash_near_pairs",
            "dedup_simhash_values", "flow_filter_aggregate",
            "flow_if_then_else", "flow_probability_draw",
            "flow_recursive_lookup", "flow_row_transform_chain",
            "ml_dummy_variables", "ml_fpgrowth_itemsets", "ml_hmm_decode",
            "ml_impute_mean", "ml_normalize_minmax", "ml_normalize_zscore",
            "multimodal_probe_roundtrip", "nlp_cleanup_tokens",
            "nlp_fasttext_buckets", "nlp_location_detect", "nlp_nbsvm_ratios",
            "nlp_pmi_cooccurrence", "nlp_pos_tags", "nlp_rbem_polarity",
            "nlp_shorttext_statics", "nlp_shorttext_vocab", "nlp_stem",
            "nlp_summarize_top_sentences", "nlp_tfidf_top", "nlp_top_terms",
            "period_add_shift", "session_window_per_user", "ship_latency_days",
            "similarity_label_centroids", "similarity_quantize_codes",
            "similarity_topk_bruteforce", "similarity_topk_ivf_bucketed",
            "sliding_window_counts", "text_corpus_audit", "text_gopher_rules",
            "text_language_id", "text_language_id_ngram",
            "text_quality_features", "text_token_fingerprint",
            "ts_changepoint_cusum",
        ),
        3,
    ),
    **dict.fromkeys(
        (
            "cube_orders", "dedup_incremental_batch", "dedup_minhash_components",
            "dedup_minhash_lsh", "dedup_minhash_lsh_skew", "dedup_simhash_near_pairs",
            "dedup_simhash_values", "filter_predicate", "filter_regex",
            "join_asof_latest_ref", "join_range_bands", "mix_pack_sequences",
            "mix_weighted_sample", "ml_hmm_train_loglik", "ml_kmeans_cluster_sizes",
            "ml_logreg_accuracy", "multimodal_audio_stats", "multimodal_decode_stats",
            "multimodal_frame_sample", "multimodal_frame_timestamps", "multimodal_jpeg_decode",
            "multimodal_mp4_probe", "multimodal_probe_roundtrip", "nlp_fasttext_buckets",
            "nlp_fasttext_similar_pairs", "nlp_nbsvm_accuracy", "nlp_pos_tags",
            "nlp_rbem_polarity", "nlp_rhetorics_counts", "nlp_shorttext_accuracy",
            "nlp_word2vec_nearest", "pivot_linestatus", "q1_pricing_summary",
            "rollup_orders", "select_project", "similarity_topk_ivf_kmeans",
            "similarity_topk_pq", "source_xls_roundtrip", "source_xlsx_roundtrip",
            "streaming_join_replay", "streaming_session_replay", "streaming_tumbling_replay",
            "text_bpe_roundtrip", "text_pii_scrub", "text_repetition_stats",
            "top_k_orders", "ts_ar_forecast", "ts_arima_forecast",
            "tumbling_window_hourly",
        ),
        4,
    ),
    **dict.fromkeys(
        (
            "agg_expr_language", "argmax_field_per_row", "case_route_buckets", "corr_matrix",
            "corr_qty_price", "cube_orders", "dedup_first_per_key", "dedup_ngram_spans",
            "dedup_paragraphs", "drop_offset", "filter_batch_packet", "group_agg_orders",
            "histogram_event_types", "join_anti_customers_without_orders", "join_asof_latest_ref", "join_orders_customer",
            "join_range_bands", "join_semi_big_spenders", "mix_pack_sequences", "ml_hmm_decode",
            "mode_per_group", "multimodal_decode_stats", "multimodal_frame_timestamps", "multimodal_jpeg_decode",
            "multimodal_mp4_probe", "nlp_fasttext_buckets", "nlp_fasttext_similar_pairs", "nlp_pos_tags",
            "nlp_rbem_multilang", "nlp_rbem_polarity", "nlp_tfidf_top", "normalize_15min_buckets",
            "pivot_linestatus", "q5_local_supplier_volume", "rollup_orders", "running_count_per_user",
            "sample_systematic", "setop_except_nations", "setop_intersect_nations", "similarity_topk_ivf_index",
            "source_xls_roundtrip", "source_xlsx_roundtrip", "stats_midrange_covariance", "stats_summary",
            "stratified_sample_first_k", "template_interpolation", "text_bpe_roundtrip", "union_merge_branches",
            "window_moving_sum", "zip_merge_branches",
        ),
        5,
    ),
    **dict.fromkeys(
        (
            "dedup_semantic_decontam", "dedup_semdedup",
            "dedup_span_intervals", "dedup_span_removal", "drop_offset",
            "mix_budget_sample", "mix_dsir_select", "mix_sample_exact_k",
            "mix_temperature_sample", "multimodal_audio_decontaminate",
            "multimodal_audio_features", "multimodal_audio_fingerprint",
            "multimodal_audio_near_pairs", "multimodal_audio_resample",
            "multimodal_audio_trim", "multimodal_avi_frames",
            "multimodal_bmp_decode", "multimodal_crop_stats",
            "multimodal_frames_at_ticks", "multimodal_g711_stats",
            "multimodal_gif_decode", "multimodal_image_decontaminate",
            "multimodal_image_dhash", "multimodal_jpeg420_decode",
            "multimodal_luma_histogram", "multimodal_mjpeg_frames",
            "multimodal_mp4_frames", "multimodal_mp4_timestamps",
            "multimodal_png_indexed", "multimodal_reshard_tars",
            "multimodal_resize_stats", "multimodal_strip_metadata",
            "multimodal_tiff_decode", "multimodal_video_scene_cuts",
            "multimodal_webdataset_shards", "nlp_bm25_search",
            "nlp_bm25_top", "nlp_fasttext_vec_embed",
            "running_count_per_user", "similarity_ivf_index_append",
            "similarity_ivfpq_topk", "streaming_dsir_replay",
            "streaming_media_dedup_replay", "streaming_scene_cuts_replay",
            "text_arpa_lm_score", "text_arpa_ppl_buckets",
            "text_chunk_documents", "text_html_extract",
            "text_ngram_lm_score", "text_normalize_nfc"
        ),
        6,
    ),
    **dict.fromkeys(
        (
            "approx_sketch_accuracy", "array_algebra_tokens", "calendar_parts",
            "cube_orders", "date_trunc_month", "dedup_edit_distance",
            "dedup_image_semantic", "dedup_incremental_batch",
            "dedup_minhash_lsh", "dedup_minhash_lsh_skew",
            "dedup_ngram_jaccard", "drop_offset", "explode_token_histogram",
            "flow_multimodal_curation", "implode_ids_per_lang",
            "join_asof_latest_ref", "join_range_bands", "json_fetch_props",
            "json_parse_filter", "mix_dsir_select", "mix_pack_sequences",
            "multimodal_audio_classify", "multimodal_cdc_dedup",
            "multimodal_cnn_classify", "multimodal_cnn_train_eval",
            "multimodal_image_dhash", "multimodal_reshard_tars",
            "multimodal_video_classify", "nlp_fasttext_buckets",
            "nlp_rbem_polarity", "period_add_shift", "pivot_linestatus",
            "reshape_csv_roundtrip", "reshape_datum_merge",
            "reshape_document_build", "reshape_fixed_width",
            "reshape_struct_flatten", "rollup_orders",
            "session_window_per_user", "ship_latency_days",
            "sliding_window_counts", "streaming_ann_ingest_replay",
            "streaming_cnn_classify_replay", "string_functions",
            "text_line_filter", "text_ngram_lm_score",
            "text_unigram_tokenize", "text_url_domain_stats",
            "unpivot_measures", "zip_merge_branches",
        ),
        7,
    ),
    **dict.fromkeys(
        (
            "cube_orders", "dedup_decontaminate_report", "dedup_edit_distance",
            "dedup_edit_distance_skew", "dedup_embedding_cosine",
            "dedup_exact_md5", "flow_filter_aggregate", "flow_if_then_else",
            "flow_probability_draw", "flow_recursive_lookup",
            "flow_row_transform_chain", "join_asof_latest_ref",
            "join_range_bands", "ml_dummy_variables", "ml_fpgrowth_itemsets",
            "ml_impute_mean", "ml_normalize_minmax", "ml_normalize_zscore",
            "multimodal_audio_classify", "multimodal_cnn_classify",
            "multimodal_cnn_pretrained_classify", "multimodal_video_classify",
            "nlp_cleanup_tokens", "nlp_location_detect", "nlp_nbsvm_ratios",
            "nlp_pmi_cooccurrence", "nlp_shorttext_statics",
            "nlp_shorttext_vocab", "nlp_stem", "nlp_summarize_top_sentences",
            "nlp_top_terms", "pivot_linestatus", "q1_pricing_summary",
            "rollup_orders", "similarity_label_centroids",
            "similarity_quantize_codes", "similarity_topk_bruteforce",
            "similarity_topk_ivf_bucketed", "streaming_ann_compact_replay",
            "streaming_ann_ingest_replay", "streaming_cnn_classify_replay",
            "text_corpus_audit", "text_gopher_rules", "text_language_id",
            "text_language_id_ngram", "text_line_filter",
            "text_quality_features", "text_token_fingerprint",
            "text_unigram_tokenize", "ts_changepoint_cusum",
        ),
        8,
    ),
    **dict.fromkeys(
        (
            "cube_orders", "dedup_decontaminate_bloom", "dedup_edit_distance",
            "dedup_edit_distance_skew", "dedup_first_per_key",
            "dedup_minhash_components", "dedup_minhash_lsh",
            "dedup_minhash_lsh_distinct", "dedup_minhash_lsh_skew",
            "dedup_ngram_jaccard", "dedup_ngram_jaccard_distinct",
            "dedup_simhash_distinct", "dedup_simhash_near_pairs",
            "dedup_simhash_values", "filter_predicate", "filter_regex",
            "group_agg_orders", "join_asof_latest_ref", "join_range_bands",
            "mix_weighted_sample", "ml_hmm_train_loglik",
            "ml_kmeans_cluster_sizes", "ml_logreg_accuracy",
            "multimodal_audio_classify",
            "multimodal_audio_pretrained_classify", "multimodal_audio_stats",
            "multimodal_frame_sample", "multimodal_probe_roundtrip",
            "nlp_nbsvm_accuracy", "nlp_rhetorics_counts",
            "nlp_shorttext_accuracy", "nlp_word2vec_nearest",
            "pivot_linestatus", "rollup_orders", "select_project",
            "similarity_topk_ivf_kmeans", "similarity_topk_pq",
            "streaming_ann_compact_replay", "streaming_dedup_compact_replay",
            "streaming_join_replay", "streaming_session_replay",
            "streaming_tumbling_replay", "text_ngram_lm_score",
            "text_pii_scrub", "text_repetition_stats",
            "text_unigram_tokenize", "top_k_orders", "ts_ar_forecast",
            "ts_arima_forecast", "tumbling_window_hourly",
        ),
        9,
    ),
    **dict.fromkeys(
        (
            "agg_expr_language", "argmax_field_per_row", "case_route_buckets",
            "corr_matrix", "corr_qty_price", "dedup_decontaminate_bloom",
            "dedup_decontaminate_normalized", "dedup_decontaminate_spans",
            "dedup_minhash_components", "dedup_minhash_lsh",
            "dedup_minhash_lsh_distinct", "dedup_minhash_lsh_skew",
            "dedup_ngram_jaccard", "dedup_ngram_jaccard_distinct",
            "dedup_ngram_jaccard_skew", "dedup_ngram_spans", "dedup_paragraphs",
            "dedup_simhash_distinct", "dedup_simhash_near_pairs",
            "dedup_span_intervals", "dedup_span_removal", "filter_batch_packet",
            "histogram_event_types", "join_anti_customers_without_orders",
            "join_orders_customer", "join_semi_big_spenders", "mode_per_group",
            "multimodal_video_pretrained_classify", "normalize_15min_buckets",
            "q5_local_supplier_volume", "sample_systematic", "setop_except_nations",
            "setop_intersect_nations", "similarity_topk_ivf_index",
            "source_xls_roundtrip", "source_xlsx_roundtrip",
            "stats_midrange_covariance", "stats_summary", "stratified_sample_first_k",
            "streaming_ann_ingest_replay", "streaming_cnn_classify_replay",
            "streaming_decontaminate_replay", "streaming_decontaminate_spans_replay",
            "streaming_dsir_replay", "streaming_media_dedup_replay",
            "template_interpolation", "text_bpe_roundtrip", "text_ngram_lm_score",
            "union_merge_branches", "window_moving_sum",
        ),
        10,
    ),
    **dict.fromkeys(
        (
            "dedup_decontaminate_policy", "dedup_decontaminate_span_stats",
            "dedup_decontaminate_spans", "dedup_decontaminate_spans_normalized",
            "dedup_keep_best_per_cluster", "dedup_ngram_jaccard_skew",
            "dedup_semantic_decontam", "dedup_semdedup",
            "join_anti_customers_without_orders", "mix_budget_sample",
            "mix_sample_exact_k", "mix_temperature_sample", "ml_hmm_decode",
            "multimodal_audio_features", "multimodal_audio_fingerprint",
            "multimodal_audio_near_pairs", "multimodal_audio_resample",
            "multimodal_avi_frames", "multimodal_bmp_decode",
            "multimodal_crop_stats", "multimodal_decode_stats",
            "multimodal_frame_timestamps", "multimodal_gif_decode",
            "multimodal_jpeg420_decode", "multimodal_jpeg_decode",
            "multimodal_luma_histogram", "multimodal_mjpeg_frames",
            "multimodal_mp4_frames", "multimodal_mp4_probe",
            "multimodal_mp4_timestamps", "multimodal_png_indexed",
            "multimodal_resize_stats", "multimodal_video_scene_cuts",
            "multimodal_webdataset_shards", "nlp_fasttext_similar_pairs",
            "nlp_pos_tags", "nlp_rbem_multilang", "nlp_tfidf_top",
            "running_count_per_user", "setop_except_nations",
            "similarity_ivf_index_append", "similarity_ivfpq_topk",
            "streaming_decontaminate_replay",
            "streaming_decontaminate_spans_normalized_replay",
            "streaming_decontaminate_spans_replay", "text_arpa_lm_score",
            "text_arpa_ppl_buckets", "text_chunk_documents",
            "text_html_extract", "text_normalize_nfc",
        ),
        11,
    ),
    **dict.fromkeys(
        (
            "approx_sketch_accuracy", "array_algebra_tokens", "calendar_parts",
            "date_trunc_month", "dedup_decontaminate_attribution",
            "dedup_decontaminate_policy", "dedup_decontaminate_spans_normalized",
            "dedup_image_semantic", "dedup_incremental_batch", "drop_offset",
            "explode_token_histogram", "flow_multimodal_curation",
            "implode_ids_per_lang", "json_fetch_props", "json_parse_filter",
            "mix_dsir_select", "mix_pack_sequences", "multimodal_audio_decontaminate",
            "multimodal_audio_trim", "multimodal_cdc_dedup",
            "multimodal_cnn_train_eval", "multimodal_frames_at_ticks",
            "multimodal_g711_stats", "multimodal_image_decontaminate",
            "multimodal_image_dhash", "multimodal_reshard_tars",
            "multimodal_strip_metadata", "multimodal_tiff_decode", "nlp_bm25_search",
            "nlp_bm25_top", "nlp_fasttext_vec_embed", "nlp_rbem_polarity",
            "period_add_shift", "reshape_csv_roundtrip", "reshape_datum_merge",
            "reshape_document_build", "reshape_fixed_width", "reshape_struct_flatten",
            "session_window_per_user", "ship_latency_days", "sliding_window_counts",
            "streaming_decontaminate_policy_replay", "streaming_decontaminate_replay",
            "streaming_decontaminate_spans_normalized_replay",
            "streaming_decontaminate_spans_replay", "streaming_scene_cuts_replay",
            "string_functions", "text_url_domain_stats", "unpivot_measures",
            "zip_merge_branches",
        ),
        12,
    ),
}

# Queries whose implementation (or a shared helper they exercise) changed in
# the CURRENT round — forced into the verification window even if recently
# green, so this round's edits cannot silently regress them.
_TOUCHED = frozenset(
    {
        # round 14 (optimization) edits — scoped to queries whose
        # EXECUTED operator code changed:
        #
        # - ngram_jaccard_pairs: threshold validation at entry + the
        #   fused 'auto' dispatch probe (the skew query's path) — the
        #   whole jaccard family re-verifies;
        # - edit_distance_pairs: row-local gram-occurrence bag replaces
        #   the (string, gram) window;
        # - hashed_shingles/_banded_buckets: expression-memoized trees
        #   (plan-identical, but executed code changed) — minhash/LSH,
        #   keep-best, incremental-batch and the fuzzy decontamination
        #   family all execute them;
        # - bm25(): persist_dl knob (default path plan-identical);
        # - mix_dsir_select: persistFeatures conf branch;
        # - text_ngram_lm_score: partition_by_keys width derivation.
        #
        # load_table's plan memo also changed and is on EVERY query's
        # path; all 228 cannot fit a ~50-row window, so the loader is
        # covered by its unit tests plus the least-recently-verified
        # rotation that cycles the rest of the registry through
        # subsequent windows. (The r13-touched minhash five are all in
        # this round's list again via the memoized banding.)
        "dedup_ngram_jaccard",
        "dedup_ngram_jaccard_distinct",
        "dedup_ngram_jaccard_skew",
        "dedup_edit_distance",
        "dedup_edit_distance_skew",
        "dedup_minhash_lsh",
        "dedup_minhash_lsh_distinct",
        "dedup_minhash_lsh_skew",
        "dedup_minhash_components",
        "dedup_keep_best_per_cluster",
        "dedup_incremental_batch",
        "dedup_decontaminate_fuzzy",
        "dedup_decontaminate_fuzzy_filter",
        "dedup_decontaminate_fuzzy_shuffle",
        "dedup_decontaminate_fuzzy_suite",
        "streaming_fuzzy_decontaminate_replay",
        "nlp_bm25_top",
        "nlp_bm25_search",
        "mix_dsir_select",
        "text_ngram_lm_score",
    }
)

# Queries that failed a past driver round before being fixed (the round-1
# rollup/cube/pivot/asof/range family) — RETIRED r10: each member has now
# been driver-green in five separate windows (r2, r4, r5, r7/r8, r9)
# since the r1 fixes; pinning them at the window's front forever costs
# slots the stale tail needs. The set stays defined (empty) so the rank
# function keeps its seam for future regressions.
_REVERIFY_PRIORITY = frozenset()


def load_all() -> dict[str, QueryDef]:
    """Import all query modules (idempotent) and return the registry ordered
    for the driver's ~50-row correctness window: never-hash-verified first
    (oracled before rows-only), then this round's touched queries, then
    least-recently-verified."""
    for mod in _MODULES:
        importlib.import_module(f"tuktu_spark.queries.{mod}")

    def rank(item: tuple[str, QueryDef]) -> tuple[int, int]:
        name, qd = item
        if name not in _VERIFIED_ROUND:
            return (0, 0 if qd.oracle else 1)
        if name in _TOUCHED:
            return (1, 0)
        if name in _REVERIFY_PRIORITY:
            return (1, 1)
        return (2, _VERIFIED_ROUND[name])

    return dict(sorted(REGISTRY.items(), key=rank))
