"""External-verification history of the query registry.

The driver's CORRECTNESS gate checks the FIRST 50 entries of
``queries()`` (observed in rounds 1 and 2: both files cover exactly the
first 50 registrations).  As of round 6 the never-externally-verified
set is EMPTY (cumulative driver verification 218/218), so the rotation
policy changed (round-6 verdict item #1) from grow-the-union to
least-recently-verified-first: the gate now continuously re-confirms
the STALEST external greens.  Ordering classes:

  class 0 — never externally verified (new registrations land here so
            they get a driver row in their first round);
  class 1 — externally verified, HAS a DuckDB oracle — ordered by the
            round of their most recent green driver row, oldest first
            (a round-1 green is five-plus rounds and >12k changed LoC
            stale against this codebase);
  class 2 — externally verified, registered WITHOUT an oracle by
            design (approx sketches / engine-native hashes / iterative
            algorithms with pytest accuracy gates instead).  A gate
            rerun on these can only record the weaker rows-only form,
            so re-gating one displaces a real hash-exact
            re-confirmation slot for zero information — they sort
            last and only re-enter the gate if the registry ever
            shrinks below 50 oracle-backed names.

Within each class, registration order breaks ties.  Every query is
ALSO oracle-checked locally by tests/test_oracle.py on every pytest
run, so rotation never leaves anything unchecked — it only changes
which 50 the external gate re-confirms.
"""

# the 50 queries covered by CORRECTNESS_r03.json (driver gate, round 3)
ROUND3_VERIFIED: frozenset[str] = frozenset({
    "agg_equidepth_histogram", "agg_histogram", "agg_hll_intersect",
    "agg_hll_mergeable", "agg_kll_mergeable", "agg_percentile_disc",
    "agg_sample_estimate", "agg_unpivot", "agg_view_ivm", "er_resolve",
    "events_anomaly", "events_basket_lift", "events_ewma", "events_funnel",
    "events_path_trigrams", "events_purchase_attribution",
    "events_resample_ffill", "events_retention", "events_sessionize",
    "events_time_rollup", "join_asof_nearest", "join_bloom_semi",
    "join_interval_overlap", "join_lateral_topn", "join_scd2_temporal",
    "join_shuffle_hash_hint", "json_variant", "merge_into_cdc",
    "sample_weighted", "scd2_build", "tpch_q1", "tpch_q10", "tpch_q11",
    "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17",
    "tpch_q18", "tpch_q19", "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5",
    "tpch_q6", "tpch_q7", "tpch_q8", "tpch_q9", "win_time_range_frame",
})

# the 50 queries covered by CORRECTNESS_r01.json and CORRECTNESS_r02.json
# (named for rounds 1-AND-2 — renamed from the ambiguous ROUND12_VERIFIED
# at the start of the actual round 12 so the real per-round names stay
# collision-free)
ROUND1_2_VERIFIED: frozenset[str] = frozenset({
    "agg_approx_distinct", "agg_cube", "agg_distinct", "agg_groupcount",
    "agg_having", "agg_minmax_by", "agg_multi", "agg_pivot",
    "agg_pivot_rates", "agg_rollup", "agg_sum_avg", "agg_twolevel",
    "explode_join", "filter_compound", "filter_eq_neq", "filter_isin",
    "filter_notnull", "filter_range", "join_anti", "join_asof",
    "join_broadcast_lookup", "join_dim_chain", "join_full_outer",
    "join_fuzzy_levenshtein", "join_left_outer", "join_range_theta",
    "join_semi", "join_sortmerge", "null_handling", "project_compute",
    "sample_hash", "sample_quota", "sample_stratified", "self_join",
    "set_distinct", "set_except", "set_except_all", "set_intersect",
    "set_intersect_all", "set_union_all", "sort_global", "sort_merge_compact",
    "sort_topk", "win_first_last", "win_lag_lead", "win_ntile", "win_rank",
    "win_row_number", "win_running_sum", "win_topk_per_group",
})

# the 50 queries covered by CORRECTNESS_r04.json (driver gate, round 4)
ROUND4_VERIFIED: frozenset[str] = frozenset({
    "agg_from_view", "ann_knn_graph", "curation_domain_cap",
    "curation_end_to_end", "curation_funnel", "dataset_card",
    "dedup_components_contraction", "dedup_containment", "dedup_cross_source",
    "dedup_embedding_ann", "dedup_incremental", "dedup_normalized_groups",
    "dedup_paragraphs", "dedup_semdedup", "dedup_substring",
    "dedup_substring_fraction", "dedup_verified_components",
    "doc_pack_sequences", "graph_clustering_coeff", "graph_pagerank",
    "graph_triangles", "lang_id_eval", "mix_source_weights",
    "quality_expectations", "select_contamination_free", "select_diverse_docs",
    "similarity_ivf_pq", "similarity_ivf_trained", "source_overlap_matrix",
    "split_train_val_test", "text_bpe_apply", "text_bpe_merge_pairs",
    "text_bpe_train", "text_char_entropy", "text_chunk_overlap",
    "text_contamination", "text_count_min", "text_gopher_quality",
    "text_heavy_hitters_sketch", "text_ngram_counts", "text_normalize",
    "text_pii_scrub", "text_quality_model", "text_repetition",
    "text_skipgram_pairs", "tpch_q20", "tpch_q21", "tpch_q22",
    "udf_arrow_scalar", "udf_map_in_arrow",
})

# the 49 queries covered by CORRECTNESS_r05.json (driver gate, round
# 5): 47 hash-exact plus the two oracle-less registrations
# (agg_percentile_approx, hash_keys_native) whose record is the
# driver's weaker rows-only form (spark_rows recorded, matches None,
# err='no_oracle').  Those two are registered WITHOUT an oracle BY
# DESIGN (approx sketches / engine-native hashes have no
# DuckDB-expressible twin; pytest accuracy gates cover them), so a
# future gate rerun can never record more than this — re-gating them
# would displace a real re-confirmation slot for zero information.
# ``array_suite`` was the 50th name in that gate but ended as a
# harness ``err`` (its ARRAY<INT> output column broke the driver's
# pandas canonicalizer), so it is deliberately EXCLUDED here: it
# stays unverified-priority until a driver gate shows a green row for
# the now-stringified form.
ROUND5_VERIFIED: frozenset[str] = frozenset({
    "agg_salted_skew", "text_lm_familiarity", "similarity_knn_label",
    "embedding_label_cohesion", "search_bm25", "search_phrase",
    "search_hybrid_rrf", "agg_stats_suite", "agg_percentile",
    "agg_percentile_approx", "agg_grouping_sets", "sql_orders_revenue",
    "unpivot_measures", "win_cume_nth", "subquery_above_avg", "agg_median",
    "agg_mode", "agg_listagg", "agg_bool_countif", "agg_bitwise",
    "agg_regr", "subquery_exists", "subquery_in", "win_range_frame",
    "win_moving_avg", "str_basic_suite", "str_regexp_suite", "str_format",
    "date_suite", "math_suite", "math_bitops", "hash_keys",
    "hash_keys_native", "binary_suite", "case_when_bucketing",
    "json_extract", "map_struct_suite", "array_posexplode", "udf_scalar",
    "udaf_grouped", "udtf_expand", "grouped_map_normalize", "dedup_exact",
    "dedup_exact_groups", "dedup_fingerprint_groups", "dedup_jaccard",
    "dedup_near", "dedup_components", "dedup_keep_best",
})

# the 50 queries covered by CORRECTNESS_r06.json (driver gate, round 6):
# 49 hash-exact plus agg_approx_distinct's by-design rows-only row.
# 19 of these were first-time external greens (array_suite + the
# text/dedup/similarity/stream rotation tail); the other 31 are
# re-confirmations of round-1/2-era names.
ROUND6_VERIFIED: frozenset[str] = frozenset({
    "agg_approx_distinct", "agg_cube", "agg_distinct", "agg_groupcount",
    "agg_having", "agg_minmax_by", "agg_multi", "agg_pivot",
    "agg_pivot_rates", "agg_rollup", "agg_sum_avg", "agg_twolevel",
    "array_suite", "dedup_embedding_cosine", "dedup_minhash_cluster",
    "dedup_ngram_jaccard", "dedup_simhash", "explode_join",
    "filter_compound", "filter_eq_neq", "filter_isin", "filter_notnull",
    "filter_range", "join_anti", "join_broadcast_lookup", "join_dim_chain",
    "join_left_outer", "join_semi", "join_sortmerge", "null_handling",
    "project_compute", "sample_hash", "sample_quota", "sample_stratified",
    "sample_weighted", "select_training_docs", "self_join",
    "similarity_ann_lsh", "similarity_ivf", "similarity_topk",
    "stream_session", "stream_sliding", "stream_tumbling",
    "text_fingerprint", "text_lang_id", "text_quality", "text_tfidf",
    "text_token_count_bpe", "text_token_stats", "text_top_tokens",
})

# the 50 queries covered by CORRECTNESS_r07.json (driver gate, round
# 7): all 50 hash-exact — the first slate produced by the
# least-recently-verified-first rotation (the 4 new round-7
# postings-index registrations, then the stalest r2/r3-era greens).
ROUND7_VERIFIED: frozenset[str] = frozenset({
    "agg_equidepth_histogram", "agg_histogram", "agg_percentile_disc",
    "agg_sample_estimate", "agg_unpivot", "agg_view_ivm", "er_resolve",
    "events_anomaly", "events_basket_lift", "events_ewma", "events_funnel",
    "events_path_trigrams", "events_purchase_attribution",
    "events_resample_ffill", "events_retention", "events_sessionize",
    "events_time_rollup", "join_asof", "join_asof_nearest",
    "join_bloom_semi", "join_full_outer", "join_fuzzy_levenshtein",
    "join_interval_overlap", "join_lateral_topn", "join_range_theta",
    "join_scd2_temporal", "join_shuffle_hash_hint", "json_variant",
    "scd2_build", "search_bm25_incremental", "search_bm25_postings",
    "search_phrase_postings", "search_proximity_postings", "set_distinct",
    "set_except", "set_except_all", "set_intersect", "set_intersect_all",
    "set_union_all", "sort_global", "sort_merge_compact", "sort_topk",
    "win_first_last", "win_lag_lead", "win_ntile", "win_rank",
    "win_row_number", "win_running_sum", "win_time_range_frame",
    "win_topk_per_group",
})

# the 50 queries covered by CORRECTNESS_r08.json (driver gate, round
# 8): all 50 hash-exact — the 9 round-8 registrations (the delete
# lifecycle + index-layout family), merge_into_cdc, all 22 TPC-H,
# quality_expectations, the arrow UDFs and the stalest r4-era
# dedup/text names.  Folded at the START of round 9 per the standing
# fold-timing rule (folding mid-round would reorder the slate out from
# under the gate and strand never-verified queries).
ROUND8_VERIFIED: frozenset[str] = frozenset({
    "ann_knn_graph", "dedup_components_contraction", "dedup_containment",
    "dedup_embedding_ann", "dedup_embedding_incremental",
    "dedup_incremental", "dedup_lsh_index_delete",
    "dedup_lsh_index_incremental", "dedup_lsh_index_probe",
    "dedup_normalized_groups", "dedup_paragraphs", "dedup_semdedup",
    "dedup_verified_components", "graph_clustering_coeff",
    "graph_triangles", "merge_into_cdc", "quality_expectations",
    "search_bm25_deleted", "similarity_ivf_deleted",
    "similarity_ivf_incremental", "similarity_ivf_layout",
    "store_delete_rows", "text_chunk_overlap",
    "text_heavy_hitters_sketch", "text_normalize", "text_quality_model",
    "tpch_q1", "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q12",
    "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17",
    "tpch_q18", "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22",
    "udf_arrow_scalar", "udf_map_in_arrow",
})

# the 50 queries covered by CORRECTNESS_r09.json (driver gate, round
# 9): all 50 hash-exact (rows/schema/hash True, err None for every
# row) — the 7 round-9 lifecycle registrations (view retraction, LSH
# compaction, BM25/IVF maintenance, snapshot diff/vacuum/CDC export)
# plus the 43 least-recently-verified r4/r5-era greens the rotation
# surfaced.  Folded at the START of round 10 per the standing
# fold-timing rule.
ROUND9_VERIFIED: frozenset[str] = frozenset({
    "agg_bitwise", "agg_bool_countif", "agg_from_view",
    "agg_grouping_sets", "agg_listagg", "agg_median", "agg_mode",
    "agg_percentile", "agg_regr", "agg_stats_suite",
    "agg_view_retracted", "curation_domain_cap", "curation_end_to_end",
    "curation_funnel", "dataset_card", "dedup_cross_source",
    "dedup_lsh_index_compacted", "dedup_substring",
    "dedup_substring_fraction", "doc_pack_sequences", "lang_id_eval",
    "mix_source_weights", "search_bm25_maintained",
    "select_contamination_free", "select_diverse_docs",
    "similarity_ivf_maintained", "source_overlap_matrix",
    "split_train_val_test", "sql_orders_revenue", "store_cdc_export",
    "store_snapshot_diff", "store_vacuumed", "str_basic_suite",
    "str_regexp_suite", "subquery_above_avg", "subquery_exists",
    "subquery_in", "text_bpe_merge_pairs", "text_char_entropy",
    "text_contamination", "text_count_min", "text_gopher_quality",
    "text_ngram_counts", "text_pii_scrub", "text_repetition",
    "text_skipgram_pairs", "unpivot_measures", "win_cume_nth",
    "win_moving_avg", "win_range_frame",
})

# the 50 queries covered by CORRECTNESS_r10.json (driver gate, round
# 10): all 50 hash-exact (rows/schema/hash True, err None for every
# row) — the 8 round-10 store-lifecycle/CDC registrations
# (curation_delta_ingest, agg_view_advanced, store_time_travel,
# store_changelog_replayed, store_row_history, store_schema_evolved,
# store_tagged_read, store_upsert_rows) plus the 42
# least-recently-verified r5/r6-era greens the rotation surfaced.
# Folded at the START of round 11 per the standing fold-timing rule.
ROUND10_VERIFIED: frozenset[str] = frozenset({
    "agg_cube", "agg_distinct", "agg_groupcount", "agg_having",
    "agg_minmax_by", "agg_multi", "agg_pivot", "agg_pivot_rates",
    "agg_rollup", "agg_salted_skew", "agg_sum_avg", "agg_twolevel",
    "agg_view_advanced", "array_posexplode", "binary_suite",
    "case_when_bucketing", "curation_delta_ingest", "date_suite",
    "dedup_components", "dedup_exact", "dedup_exact_groups",
    "dedup_fingerprint_groups", "dedup_jaccard", "dedup_keep_best",
    "dedup_near", "embedding_label_cohesion", "filter_eq_neq",
    "filter_isin", "filter_range", "grouped_map_normalize", "hash_keys",
    "json_extract", "map_struct_suite", "math_bitops", "math_suite",
    "search_bm25", "search_hybrid_rrf", "search_phrase",
    "similarity_knn_label", "store_changelog_replayed", "store_row_history",
    "store_schema_evolved", "store_tagged_read", "store_time_travel",
    "store_upsert_rows", "str_format", "text_lm_familiarity",
    "udaf_grouped", "udf_scalar", "udtf_expand",
})

# the 50 queries covered by CORRECTNESS_r11.json (driver gate, round
# 11): all 50 hash-exact (rows/schema/hash True, err None for every
# row) — the 3 round-11 store-replication registrations
# (store_replicated_evolved, store_replication_lag,
# store_rebased_changelog) plus the 47 least-recently-verified
# r6/r7-era greens the rotation surfaced.  Folded at the START of
# round 12 per the standing fold-timing rule.
ROUND11_VERIFIED: frozenset[str] = frozenset({
    "array_suite", "dedup_embedding_cosine", "dedup_minhash_cluster",
    "dedup_ngram_jaccard", "dedup_simhash", "er_resolve",
    "explode_join", "filter_compound", "filter_notnull", "join_anti",
    "join_asof", "join_asof_nearest", "join_bloom_semi",
    "join_broadcast_lookup", "join_dim_chain", "join_full_outer",
    "join_fuzzy_levenshtein", "join_left_outer", "join_range_theta",
    "join_semi", "join_shuffle_hash_hint", "join_sortmerge",
    "null_handling", "project_compute", "sample_hash", "sample_quota",
    "sample_stratified", "sample_weighted", "select_training_docs",
    "self_join", "similarity_ann_lsh", "similarity_ivf",
    "similarity_topk", "store_rebased_changelog",
    "store_replicated_evolved", "store_replication_lag",
    "stream_session", "stream_sliding", "stream_tumbling",
    "text_fingerprint", "text_lang_id", "text_quality", "text_tfidf",
    "text_token_count_bpe", "text_token_stats", "text_top_tokens",
    "win_lag_lead", "win_rank", "win_row_number", "win_topk_per_group",
})

# the 50 queries covered by CORRECTNESS_r12.json (driver gate, round
# 12): all 50 hash-exact (rows/schema/hash True, err None for every
# row) — the 4 round-12 class-0 registrations
# (store_type_conflict_rejected, store_schema_renamed,
# store_compacted_changelog, store_changelog_time_travel) plus the 46
# least-recently-verified greens the rotation surfaced.  Folded at the
# START of round 13 per the standing fold-timing rule.
ROUND12_VERIFIED: frozenset[str] = frozenset({
    "agg_equidepth_histogram", "agg_histogram", "agg_percentile_disc",
    "agg_sample_estimate", "agg_unpivot", "agg_view_ivm",
    "events_anomaly", "events_basket_lift", "events_ewma",
    "events_funnel", "events_path_trigrams",
    "events_purchase_attribution", "events_resample_ffill",
    "events_retention", "events_sessionize", "events_time_rollup",
    "join_interval_overlap", "join_lateral_topn", "join_scd2_temporal",
    "json_variant", "merge_into_cdc", "scd2_build",
    "search_bm25_incremental", "search_bm25_postings",
    "search_phrase_postings", "search_proximity_postings",
    "set_distinct", "set_except", "set_except_all", "set_intersect",
    "set_intersect_all", "set_union_all", "sort_global",
    "sort_merge_compact", "sort_topk", "store_changelog_time_travel",
    "store_compacted_changelog", "store_schema_renamed",
    "store_type_conflict_rejected", "tpch_q1", "tpch_q10", "tpch_q14",
    "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "win_first_last",
    "win_ntile", "win_running_sum", "win_time_range_frame",
})

# ROUND-14 SESSION TODO (fold timing): CORRECTNESS_r13 will be
# generated at the END of round 13 against round-13 final HEAD — fold
# that file's names as ROUND13_VERIFIED (and extend
# DRIVER_VERIFIED/_VERIFIED_BY_ROUND) at the START of round 14,
# exactly as ROUND12_VERIFIED was folded at the start of round 13.

# union of everything any driver CORRECTNESS gate has verified so far
DRIVER_VERIFIED: frozenset[str] = (
    ROUND1_2_VERIFIED | ROUND3_VERIFIED | ROUND4_VERIFIED | ROUND5_VERIFIED
    | ROUND6_VERIFIED | ROUND7_VERIFIED | ROUND8_VERIFIED
    | ROUND9_VERIFIED | ROUND10_VERIFIED | ROUND11_VERIFIED
    | ROUND12_VERIFIED
)

# round of each name's most recent green driver row (r1 and r2 covered
# the identical first-50 slate, so their names carry round 2).  Later
# rounds overwrite earlier ones.
_VERIFIED_BY_ROUND: tuple[tuple[int, frozenset[str]], ...] = (
    (2, ROUND1_2_VERIFIED),
    (3, ROUND3_VERIFIED),
    (4, ROUND4_VERIFIED),
    (5, ROUND5_VERIFIED),
    (6, ROUND6_VERIFIED),
    (7, ROUND7_VERIFIED),
    (8, ROUND8_VERIFIED),
    (9, ROUND9_VERIFIED),
    (10, ROUND10_VERIFIED),
    (11, ROUND11_VERIFIED),
    (12, ROUND12_VERIFIED),
)

LAST_VERIFIED_ROUND: dict[str, int] = {}
for _round, _names in _VERIFIED_BY_ROUND:
    for _n in _names:
        LAST_VERIFIED_ROUND[_n] = _round

# the 109-query registry as of the round-1 judge re-verification
ROUND1_REGISTRY: frozenset[str] = frozenset({
    "agg_approx_distinct", "agg_bitwise", "agg_bool_countif", "agg_cube",
    "agg_distinct", "agg_groupcount", "agg_grouping_sets", "agg_having",
    "agg_listagg", "agg_median", "agg_minmax_by", "agg_mode", "agg_multi",
    "agg_percentile", "agg_percentile_approx", "agg_pivot", "agg_pivot_rates",
    "agg_regr", "agg_rollup", "agg_stats_suite", "agg_sum_avg",
    "agg_twolevel", "array_posexplode", "array_suite", "binary_suite",
    "case_when_bucketing", "date_suite", "dedup_components",
    "dedup_embedding_cosine", "dedup_exact", "dedup_exact_groups",
    "dedup_fingerprint_groups", "dedup_jaccard", "dedup_keep_best",
    "dedup_minhash_cluster", "dedup_near", "dedup_ngram_jaccard",
    "dedup_simhash", "explode_join", "filter_compound", "filter_eq_neq",
    "filter_isin", "filter_notnull", "filter_range", "grouped_map_normalize",
    "hash_keys", "hash_keys_native", "join_anti", "join_asof",
    "join_broadcast_lookup", "join_dim_chain", "join_full_outer",
    "join_left_outer", "join_range_theta", "join_semi", "join_sortmerge",
    "json_extract", "map_struct_suite", "math_bitops", "math_suite",
    "null_handling", "project_compute", "sample_hash", "sample_stratified",
    "select_training_docs", "self_join", "set_distinct", "set_except",
    "set_except_all", "set_intersect", "set_intersect_all", "set_union_all",
    "similarity_ann_lsh", "similarity_ivf", "similarity_topk", "sort_global",
    "sort_merge_compact", "sort_topk", "sql_orders_revenue",
    "str_basic_suite", "str_format", "str_regexp_suite", "stream_session",
    "stream_sliding", "stream_tumbling", "subquery_above_avg",
    "subquery_exists", "subquery_in", "text_fingerprint", "text_lang_id",
    "text_quality", "text_tfidf", "text_token_count_bpe", "text_token_stats",
    "text_top_tokens", "udaf_grouped", "udf_scalar", "udtf_expand",
    "unpivot_measures", "win_cume_nth", "win_first_last", "win_lag_lead",
    "win_moving_avg", "win_ntile", "win_range_frame", "win_rank",
    "win_row_number", "win_running_sum", "win_topk_per_group",
})


def priority(name: str) -> int:
    """Legacy grow-the-union class (kept for tests/history audits)."""
    if name in DRIVER_VERIFIED:
        return 2
    if name in ROUND1_REGISTRY:
        return 1
    return 0


def rotation_key(name: str, has_oracle: bool) -> tuple[int, int]:
    """Least-recently-verified-first ordering key (round-7 policy).

    Returns (class, last_verified_round); registration order breaks
    ties in the caller.  See the module docstring for the class
    definitions.
    """
    if name not in DRIVER_VERIFIED:
        return (0, 0)
    if not has_oracle:
        return (2, LAST_VERIFIED_ROUND[name])
    return (1, LAST_VERIFIED_ROUND[name])
