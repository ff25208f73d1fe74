"""Driver contract for the inde1_spark engine.

``entry(spark)`` runs the flagship hourly-stats query on sf0.001.
``queries()`` exposes one callable per implemented operator from SURVEY.md §2
(plus the LLM-data-pipeline extensions); ``oracle_sql()`` gives the DuckDB
equivalent for each. Column names and value determinism are aligned between
the two (see inde1_spark/operators/analytics.py docstring for the strategy).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"

# Testdata mapping (FIXTURES.md §5): events.event_type 'view'~ENTRY,
# 'click'~EXIT, 'error'~protected-slot event; customer = users dimension.
ENTRY, EXIT = "view", "click"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from inde1_spark.sources.readers import load_table

    return load_table(spark, sf_dir, name)


def _tp(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Corpus load with the guide §2.5 unsplittable-input mitigation.

    Used by the queries whose map-side CPU (tokenize/ngram/frequency
    aggregation) dominates their runtime — measured 2-3x faster with the
    scan parallelized (r12). Self-disabling when the parquet layout
    already splits to the session's parallelism (real-scale inputs)."""
    from inde1_spark.sources.readers import load_table

    return load_table(spark, sf_dir, name, scan_parallel=True)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: single-pass hourly parking-style aggregate (SURVEY §7.2.1)."""
    from inde1_spark.operators.analytics import hourly_stats

    return hourly_stats(_t(spark, SF0001, "events"))


# ---------------------------------------------------------------------------
# queries(): name -> (spark, sf_dir) -> DataFrame
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Dict ORDER IS LOAD-BEARING: the driver's correctness gate verifies the
    FIRST 50 entries. Rotation policy (CLAUDE.md invariant): entries that
    have never received a driver row come first, then entries whose output
    changed since their last driver row, then re-confirmations of the
    oldest greens. Everything behind the window stays pinned locally by
    tests/test_oracle_parity.py, which parametrizes ALL entries.

    r11 window (steady-state, third full turn): the 12 operators staged
    through r10 (source_length_drift..perplexity_filter_sweep — all
    double-SF hash-green, edge-pinned, plan-pinned, partition-invariant
    BEFORE promotion, per the staged-surface invariant) enter
    production at the head, followed by 38 re-confirmations of the
    oldest driver rows: the head of the 45 remaining r04-era entries
    (small_qty_revenue..dedup_containment). 12 + 38 = exactly 50. No
    promoted entry's output changed after its staged hash pins except
    the r10-ADVICE compression_ratio_audit denominator guard (identical
    output on every non-empty input; re-pinned pre-promotion).

    STEADY-STATE CADENCE: every window slot not taken by a new query is
    a re-confirmation. Draw the entries whose last driver row is OLDEST
    (round number, then dict order) so no query's last driver row ages
    past ~7 rounds (338/50 = 6.8); new queries, when staged batches
    promote, still jump the queue per the rotation policy above.
    Computed oldest pool after a green r11: the 7 remaining r04-era
    entries (hopping_window_stats..shingle_novelty), then the r05
    block — the r12 re-confirmation slots come from there.
    """
    from inde1_spark.operators import analytics as A
    from inde1_spark.operators import corpus as C
    from inde1_spark.operators import dedup as D
    from inde1_spark.operators import multimodal as M
    from inde1_spark.operators import clustering as CL
    from inde1_spark.operators import joins as J
    from inde1_spark.operators import scoring as SC
    from inde1_spark.operators import similarity as S
    from inde1_spark.operators import text as T
    from inde1_spark.operators import tpch as Q

    return {
        # ================= gate window (first 50) =========================
        # --- never driver-verified: the 12 ops staged through r10 ---
        "source_length_drift": lambda sp, d: A.source_length_drift(
            _t(sp, d, "documents")
        ),
        "copartition_audit": lambda sp, d: A.copartition_audit(
            _t(sp, d, "events"),
            _t(sp, d, "customer"),
            _t(sp, d, "orders"),
            _t(sp, d, "lineitem"),
            _t(sp, d, "part"),
        ),
        "semdedup_incremental": lambda sp, d: CL.semdedup_incremental(
            _t(sp, d, "embeddings")
        ),
        "repetition_rules": lambda sp, d: T.repetition_rules(
            _t(sp, d, "documents")
        ),
        "dedup_winnow_incremental": lambda sp, d: D.dedup_winnow_incremental(
            _t(sp, d, "documents")
        ),
        "shingle_df_cap_sweep": lambda sp, d: D.shingle_df_cap_sweep(
            _t(sp, d, "documents")
        ),
        "schema_evolution_audit": lambda sp, d: A.schema_evolution_audit(
            _t(sp, d, "events")
        ),
        "compression_ratio_audit": lambda sp, d: A.compression_ratio_audit(
            _t(sp, d, "events")
        ),
        "corpus_prep_cost_audit": lambda sp, d: C.corpus_prep_cost_audit(
            _t(sp, d, "documents")
        ),
        "mixture_epoch_plan": lambda sp, d: C.mixture_epoch_plan(
            _t(sp, d, "documents")
        ),
        "split_balance_audit": lambda sp, d: C.split_balance_audit(
            _t(sp, d, "documents")
        ),
        "perplexity_filter_sweep": lambda sp, d: SC.perplexity_filter_sweep(
            _tp(sp, d, "documents")
        ),
        # --- re-confirmations: head of the 45 remaining r04-era entries
        #     (last driver rows r04 — the oldest pool after a green r10) ---
        "small_qty_revenue": lambda sp, d: Q.small_qty_revenue(
            _t(sp, d, "lineitem"), _t(sp, d, "part")
        ),
        "large_volume_customers": lambda sp, d: Q.large_volume_customers(
            _t(sp, d, "customer"), _t(sp, d, "orders"), _t(sp, d, "lineitem")
        ),
        "brand_filtered_revenue": lambda sp, d: Q.brand_filtered_revenue(
            _t(sp, d, "lineitem"), _t(sp, d, "part")
        ),
        "funnel_steps": lambda sp, d: A.funnel_steps(_t(sp, d, "events")),
        "transition_matrix": lambda sp, d: A.transition_matrix(_t(sp, d, "events")),
        "time_weighted_avg": lambda sp, d: A.time_weighted_avg(_t(sp, d, "events")),
        "gap_histogram": lambda sp, d: A.gap_histogram(_t(sp, d, "events")),
        "weekly_growth": lambda sp, d: A.weekly_growth(_t(sp, d, "events")),
        "dau_wau": lambda sp, d: A.dau_wau(_t(sp, d, "events")),
        "cumulative_users": lambda sp, d: A.cumulative_users(_t(sp, d, "events")),
        "attribution_first_touch": lambda sp, d: A.attribution_first_touch(
            _t(sp, d, "events")
        ),
        "retention_cohorts": lambda sp, d: A.retention_cohorts(_t(sp, d, "events")),
        "ewma_series": lambda sp, d: A.ewma_series(_t(sp, d, "events")),
        "ewma_anomaly": lambda sp, d: A.ewma_anomaly(_t(sp, d, "events")),
        "cluster_balance": lambda sp, d: CL.cluster_balance(
            _t(sp, d, "embeddings")
        ),
        "embedding_outliers": lambda sp, d: S.embedding_outliers(
            _t(sp, d, "embeddings")
        ),
        "weighted_sample": lambda sp, d: C.weighted_sample(_t(sp, d, "documents")),
        "approx_percentiles": lambda sp, d: A.approx_percentiles(
            _t(sp, d, "events")
        ),
        "dedup_incremental": lambda sp, d: D.dedup_incremental(
            _t(sp, d, "documents")
        ),
        "lang_confusion": lambda sp, d: T.lang_confusion(_t(sp, d, "documents")),
        "vocab_coverage": lambda sp, d: SC.vocab_coverage(_t(sp, d, "documents")),
        "token_entropy": lambda sp, d: SC.token_entropy(_t(sp, d, "documents")),
        "dup_rate_by_source": lambda sp, d: C.dup_rate_by_source(
            _t(sp, d, "documents")
        ),
        "dedup_minhash_fast": lambda sp, d: D.dedup_minhash_fast(_t(sp, d, "documents")),
        "dedup_minhash_capped": lambda sp, d: D.dedup_minhash_fast(
            _t(sp, d, "documents"), max_shingle_df=64
        ),
        # contract shape (ground-truth count + recall/precision booleans):
        # the raw pair output is engine-specific, see dedup_simhash_contract
        "dedup_simhash_fast": lambda sp, d: D.dedup_simhash_contract(
            _t(sp, d, "documents")
        ),
        "embedding_dim_stats": lambda sp, d: S.embedding_dim_stats(
            _t(sp, d, "embeddings")
        ),
        "min_cost_supplier": lambda sp, d: Q.min_cost_supplier(
            _t(sp, d, "part"), _t(sp, d, "lineitem"), _t(sp, d, "supplier"),
            _t(sp, d, "nation"), _t(sp, d, "region")
        ),
        "supplier_count_by_part_attr": lambda sp, d: Q.supplier_count_by_part_attr(
            _t(sp, d, "lineitem"), _t(sp, d, "part"), _t(sp, d, "supplier")
        ),
        "excess_qty_suppliers": lambda sp, d: Q.excess_qty_suppliers(
            _t(sp, d, "lineitem"), _t(sp, d, "supplier"), _t(sp, d, "nation")
        ),
        "sole_late_supplier": lambda sp, d: Q.sole_late_supplier(
            _t(sp, d, "orders"), _t(sp, d, "lineitem"), _t(sp, d, "supplier")
        ),
        "grouping_sets_revenue": lambda sp, d: A.grouping_sets_revenue(
            _t(sp, d, "events")
        ),
        "holt_linear": lambda sp, d: A.holt_linear(_t(sp, d, "events")),
        "zscore_anomaly": lambda sp, d: A.zscore_anomaly(_t(sp, d, "events")),
        "dedup_levenshtein": lambda sp, d: D.dedup_levenshtein(
            _t(sp, d, "documents")
        ),
        "top_ngrams_per_lang": lambda sp, d: T.top_ngrams_per_lang(
            _t(sp, d, "documents")
        ),
        "distinct_rollup_hll": lambda sp, d: A.distinct_rollup_hll(
            _t(sp, d, "events")
        ),
        "dedup_containment": lambda sp, d: D.dedup_containment(
            _t(sp, d, "documents")
        ),
        # ============== end gate window ===================================
        # r10 gate-green block (all 50 hash-green in CORRECTNESS_r10;
        # pinned locally by tests/test_oracle_parity.py every run).
        "archive_prune_audit": lambda sp, d: A.archive_prune_audit(
            _t(sp, d, "events")
        ),
        "salting_plan": lambda sp, d: A.salting_plan(_t(sp, d, "events")),
        "bucketing_plan": lambda sp, d: A.bucketing_plan(
            _t(sp, d, "events"), _t(sp, d, "orders"), _t(sp, d, "lineitem")
        ),
        "window_completeness_audit": lambda sp, d: A.window_completeness_audit(
            _t(sp, d, "events")
        ),
        "value_drift_audit": lambda sp, d: A.value_drift_audit(
            _t(sp, d, "events")
        ),
        "temporal_leakage_audit": lambda sp, d: A.temporal_leakage_audit(
            _t(sp, d, "events")
        ),
        "dedup_substring_incremental": lambda sp, d: D.dedup_substring_incremental(
            _t(sp, d, "documents")
        ),
        "dedup_pipeline_funnel": lambda sp, d: D.dedup_pipeline_funnel(
            _t(sp, d, "documents")
        ),
        "minhash_band_sweep": lambda sp, d: D.minhash_band_sweep(
            _t(sp, d, "documents")
        ),
        "semdedup_threshold_sweep": lambda sp, d: CL.semdedup_threshold_sweep(
            _t(sp, d, "embeddings")
        ),
        "fertility_by_source": lambda sp, d: T.fertility_by_source(
            _t(sp, d, "documents")
        ),
        "broadcast_plan_audit": lambda sp, d: A.broadcast_plan_audit(
            *[
                _t(sp, d, t)
                for t in (
                    "region",
                    "nation",
                    "customer",
                    "supplier",
                    "part",
                    "orders",
                    "lineitem",
                )
            ]
        ),
        # --- re-confirmations: the 33 remaining r03-era entries (last
        #     driver rows r03 — the oldest pool after a green r09) ---
        "knn_ivf": lambda sp, d: S.knn_ivf(_t(sp, d, "embeddings")),
        "embedding_quantize": lambda sp, d: S.embedding_quantize(
            _t(sp, d, "embeddings")
        ),
        "text_token_stats": lambda sp, d: T.token_stats(_t(sp, d, "documents")),
        "text_token_bpe": lambda sp, d: T.token_count_bpe(_t(sp, d, "documents")),
        "text_quality": lambda sp, d: T.quality_score(_t(sp, d, "documents")),
        "text_lang_id": lambda sp, d: T.lang_id(_t(sp, d, "documents")),
        "text_fingerprint": lambda sp, d: T.fingerprint(_t(sp, d, "documents")),
        "text_repetition": lambda sp, d: T.repetition_stats(_t(sp, d, "documents")),
        "text_gopher": lambda sp, d: T.gopher_rules(_t(sp, d, "documents")),
        "pii_redact": lambda sp, d: T.pii_redact(_t(sp, d, "documents")),
        "text_lines": lambda sp, d: T.line_quality(_t(sp, d, "documents")),
        "quality_bins": lambda sp, d: T.quality_bins(_t(sp, d, "documents")),
        "source_stats": lambda sp, d: C.source_stats(_t(sp, d, "documents")),
        "train_test_split": lambda sp, d: T.train_test_split(_t(sp, d, "documents")),
        "train_test_split_grouped": lambda sp, d: T.train_test_split_grouped(
            _t(sp, d, "documents")
        ),
        "stratified_sample": lambda sp, d: T.stratified_sample(_t(sp, d, "documents")),
        "pack_sequences": lambda sp, d: C.pack_sequences(_t(sp, d, "documents")),
        "ngram_vocab": lambda sp, d: C.ngram_vocab(_t(sp, d, "documents")),
        "contamination_check": lambda sp, d: C.contamination_check(
            _t(sp, d, "documents")
        ),
        "mixture_sample": lambda sp, d: C.mixture_sample(_t(sp, d, "documents")),
        "trim_outliers": lambda sp, d: C.trim_outliers(_t(sp, d, "documents")),
        "shuffle_shards": lambda sp, d: C.shuffle_shards(_t(sp, d, "documents")),
        "multimodal_meta": lambda sp, d: M.binary_meta(_t(sp, d, "documents")),
        "multimodal_features": lambda sp, d: M.feature_columns(_t(sp, d, "documents")),
        "multimodal_frames": lambda sp, d: M.sample_frames(_t(sp, d, "documents")),
        "approx_distinct": lambda sp, d: A.approx_distinct(_t(sp, d, "events")),
        "chunk_tokens": lambda sp, d: C.chunk_tokens(_t(sp, d, "documents")),
        "dsir_sample": lambda sp, d: C.dsir_sample(_t(sp, d, "documents")),
        "quality_ntile": lambda sp, d: T.quality_ntile(_t(sp, d, "documents")),
        "cross_source_overlap": lambda sp, d: C.cross_source_overlap(
            _t(sp, d, "documents")
        ),
        "term_cooccurrence": lambda sp, d: SC.term_cooccurrence(_t(sp, d, "documents")),
        "length_mad_outliers": lambda sp, d: C.length_mad_outliers(
            _t(sp, d, "documents")
        ),
        "pivot_source_lang": lambda sp, d: A.pivot_source_lang(_t(sp, d, "documents")),
        # --- re-confirmations: head of the r04 gate-green block ---
        "cross_nation_volume": lambda sp, d: Q.cross_nation_volume(
            _t(sp, d, "supplier"), _t(sp, d, "lineitem"), _t(sp, d, "orders"),
            _t(sp, d, "customer"), _t(sp, d, "nation")
        ),
        "nation_market_share": lambda sp, d: Q.nation_market_share(
            _t(sp, d, "region"), _t(sp, d, "nation"), _t(sp, d, "customer"),
            _t(sp, d, "orders"), _t(sp, d, "lineitem"), _t(sp, d, "supplier")
        ),
        "product_type_profit": lambda sp, d: Q.product_type_profit(
            _t(sp, d, "part"), _t(sp, d, "supplier"), _t(sp, d, "nation"),
            _t(sp, d, "lineitem"), _t(sp, d, "orders")
        ),
        "returned_item_losses": lambda sp, d: Q.returned_item_losses(
            _t(sp, d, "customer"), _t(sp, d, "orders"), _t(sp, d, "lineitem"),
            _t(sp, d, "nation")
        ),
        "late_shipment_priority": lambda sp, d: Q.late_shipment_priority(
            _t(sp, d, "orders"), _t(sp, d, "lineitem")
        ),
        # r09 gate-green block (all 50 hash-green in CORRECTNESS_r09;
        # pinned locally by tests/test_oracle_parity.py every run).
        "nelson_aalen_hazard": lambda sp, d: A.nelson_aalen_hazard(
            _t(sp, d, "events")
        ),
        "ndv_estimator_audit": lambda sp, d: A.ndv_estimator_audit(
            _t(sp, d, "events")
        ),
        "file_compaction_plan": lambda sp, d: A.file_compaction_plan(
            _t(sp, d, "events")
        ),
        "label_propagation_communities": lambda sp, d: (
            D.label_propagation_communities(_t(sp, d, "documents"))
        ),
        "jm_query_likelihood": lambda sp, d: SC.jm_query_likelihood(
            _t(sp, d, "documents")
        ),
        "dedup_substring_windows": lambda sp, d: D.dedup_substring_windows(
            _t(sp, d, "documents")
        ),
        "sort_benefit_audit": lambda sp, d: A.sort_benefit_audit(
            _t(sp, d, "events")
        ),
        "mcnemar_halves_test": lambda sp, d: A.mcnemar_halves_test(
            _t(sp, d, "events")
        ),
        "kmv_distinct_by_source": lambda sp, d: A.kmv_distinct_by_source(
            _t(sp, d, "documents")
        ),
        "bridge_edges_audit": lambda sp, d: D.bridge_edges_audit(
            _t(sp, d, "documents")
        ),
        "cochran_q_weeks": lambda sp, d: A.cochran_q_weeks(
            _t(sp, d, "events")
        ),
        "morisita_horn_overlap": lambda sp, d: SC.morisita_horn_overlap(
            _t(sp, d, "documents")
        ),
        # (r09 window re-confirmations: the 25 r02-era entries)
        "enrich_users_ttl": lambda sp, d: A.enrich_users_ttl(
            _t(sp, d, "events"), _t(sp, d, "customer")
        ),
        "asof_join": lambda sp, d: A.asof_join(_t(sp, d, "events")),
        "range_join_windows": lambda sp, d: A.range_join_windows(
            _t(sp, d, "events")
        ),
        "resample_ffill": lambda sp, d: A.resample_ffill(_t(sp, d, "events")),
        "window_funcs": lambda sp, d: A.window_funcs(_t(sp, d, "events")),
        "percentiles": lambda sp, d: A.percentiles(_t(sp, d, "events")),
        "corr_exact": lambda sp, d: A.corr_exact(_t(sp, d, "events")),
        "rollup_nation_region": lambda sp, d: A.rollup_nation_region(
            _t(sp, d, "orders"), _t(sp, d, "customer"), _t(sp, d, "nation"), _t(sp, d, "region")
        ),
        "sessionize_gap": lambda sp, d: A.sessionize_gap(_t(sp, d, "events")),
        "cube_day_type": lambda sp, d: A.cube_day_type(_t(sp, d, "events")),
        "value_histogram": lambda sp, d: A.value_histogram(_t(sp, d, "events")),
        "string_funcs": lambda sp, d: A.string_funcs(_t(sp, d, "events")),
        "revenue_daily_model": lambda sp, d: A.revenue_daily_model(_t(sp, d, "events")),
        "exists_check": lambda sp, d: A.exists_check(_t(sp, d, "events")),
        "json_document": lambda sp, d: A.json_document(_t(sp, d, "events")),
        "time_funcs": lambda sp, d: A.time_funcs(_t(sp, d, "events")),
        "revenue_by_nation": lambda sp, d: Q.revenue_by_nation(
            _t(sp, d, "region"), _t(sp, d, "nation"), _t(sp, d, "customer"),
            _t(sp, d, "orders"), _t(sp, d, "lineitem")
        ),
        "forecast_revenue": lambda sp, d: Q.forecast_revenue(_t(sp, d, "lineitem")),
        "order_priority_check": lambda sp, d: Q.order_priority_check(
            _t(sp, d, "orders"), _t(sp, d, "lineitem")
        ),
        "customer_order_distribution": lambda sp, d: Q.customer_order_distribution(
            _t(sp, d, "customer"), _t(sp, d, "orders")
        ),
        "promo_revenue": lambda sp, d: Q.promo_revenue(
            _t(sp, d, "lineitem"), _t(sp, d, "part")
        ),
        "top_supplier": lambda sp, d: Q.top_supplier(
            _t(sp, d, "supplier"), _t(sp, d, "lineitem")
        ),
        "customers_without_orders": lambda sp, d: Q.customers_without_orders(
            _t(sp, d, "customer"), _t(sp, d, "orders")
        ),
        "dedup_exact": lambda sp, d: D.dedup_exact(_t(sp, d, "documents")),
        "dedup_ngram_jaccard": lambda sp, d: D.dedup_ngram_jaccard(_t(sp, d, "documents")),
        # (r09 window re-confirmations: the first 13 r03-era entries)
        "dedup_embedding_lsh": lambda sp, d: D.dedup_embedding_lsh(
            _t(sp, d, "embeddings")
        ),
        "semdedup": lambda sp, d: CL.semdedup(_t(sp, d, "embeddings")),
        "kmeans_assign": lambda sp, d: CL.kmeans_assign(_t(sp, d, "embeddings")),
        "dedup_spans": lambda sp, d: D.dedup_spans(_t(sp, d, "documents")),
        "dedup_winnow": lambda sp, d: D.dedup_winnow(_t(sp, d, "documents")),
        "text_winnow": lambda sp, d: T.winnow_fingerprints(_t(sp, d, "documents")),
        "dedup_clusters": lambda sp, d: D.dedup_clusters(_t(sp, d, "documents")),
        "dedup_keep_best": lambda sp, d: D.dedup_keep_best(_t(sp, d, "documents")),
        "tfidf_top_terms": lambda sp, d: SC.tfidf_top_terms(_tp(sp, d, "documents")),
        "bm25_score": lambda sp, d: SC.bm25_score(_t(sp, d, "documents")),
        "unigram_logprob": lambda sp, d: SC.unigram_logprob(_tp(sp, d, "documents")),
        "knn_brute_cosine": lambda sp, d: S.knn_brute_cosine(_t(sp, d, "embeddings")),
        "knn_lsh_bucketed": lambda sp, d: S.knn_lsh_bucketed(_t(sp, d, "embeddings")),
        # r08 gate-green block (all 50 hash-green in CORRECTNESS_r08;
        # pinned locally by tests/test_oracle_parity.py every run).
        "entropy_rate_markov": lambda sp, d: A.entropy_rate_markov(
            _t(sp, d, "events")
        ),
        "ann_rank_overlap_rbo": lambda sp, d: S.ann_rank_overlap_rbo(
            _t(sp, d, "embeddings")
        ),
        "sprt_entry_bias": lambda sp, d: A.sprt_entry_bias(_t(sp, d, "events")),
        "pacf_daily": lambda sp, d: A.pacf_daily(_t(sp, d, "events")),
        "periodogram_daily": lambda sp, d: A.periodogram_daily(
            _t(sp, d, "events")
        ),
        "rm3_expansion": lambda sp, d: SC.rm3_expansion(_t(sp, d, "documents")),
        "prototypicality_prune": lambda sp, d: CL.prototypicality_prune(
            _t(sp, d, "embeddings")
        ),
        "hill_tail_index": lambda sp, d: A.hill_tail_index(_t(sp, d, "events")),
        "did_estimate": lambda sp, d: A.did_estimate(_t(sp, d, "events")),
        "cuped_adjustment": lambda sp, d: A.cuped_adjustment(
            _t(sp, d, "events")
        ),
        "srm_check": lambda sp, d: A.srm_check(_t(sp, d, "events")),
        "power_mde_plan": lambda sp, d: A.power_mde_plan(_t(sp, d, "events")),
        "wilson_intervals": lambda sp, d: A.wilson_intervals(
            _t(sp, d, "events")
        ),
        "peak_detection": lambda sp, d: A.peak_detection(_t(sp, d, "events")),
        "hitting_time_markov": lambda sp, d: A.hitting_time_markov(
            _t(sp, d, "events")
        ),
        "dtw_entry_exit": lambda sp, d: A.dtw_entry_exit(_t(sp, d, "events")),
        "clustering_agreement": lambda sp, d: CL.clustering_agreement(
            _t(sp, d, "embeddings")
        ),
        "embedding_drift": lambda sp, d: S.embedding_drift(
            _t(sp, d, "embeddings")
        ),
        "dispersion_check": lambda sp, d: A.dispersion_check(
            _t(sp, d, "events")
        ),
        "friedman_test": lambda sp, d: A.friedman_test(_t(sp, d, "events")),
        "ljung_box": lambda sp, d: A.ljung_box(_t(sp, d, "events")),
        "lorenz_curve": lambda sp, d: C.lorenz_curve(_t(sp, d, "documents")),
        "turning_points_test": lambda sp, d: A.turning_points_test(
            _t(sp, d, "events")
        ),
        "bartels_rank_vn": lambda sp, d: A.bartels_rank_vn(_t(sp, d, "events")),
        "poisson_rate_ci": lambda sp, d: A.poisson_rate_ci(_t(sp, d, "events")),
        "grubbs_daily_outlier": lambda sp, d: A.grubbs_daily_outlier(
            _t(sp, d, "events")
        ),
        "odds_ratio_daily": lambda sp, d: A.odds_ratio_daily(
            _t(sp, d, "events")
        ),
        "mood_median_test": lambda sp, d: A.mood_median_test(
            _t(sp, d, "events")
        ),
        "page_trend_test": lambda sp, d: A.page_trend_test(_t(sp, d, "events")),
        "granger_daily": lambda sp, d: A.granger_daily(_t(sp, d, "events")),
        "zonemap_prune_audit": lambda sp, d: A.zonemap_prune_audit(
            _t(sp, d, "events")
        ),
        "ivm_merge_check": lambda sp, d: A.ivm_merge_check(_t(sp, d, "events")),
        "winsorized_stats": lambda sp, d: A.winsorized_stats(
            _t(sp, d, "events")
        ),
        "degree_assortativity": lambda sp, d: D.degree_assortativity(
            _t(sp, d, "documents")
        ),
        "embedding_cka": lambda sp, d: S.embedding_cka(_t(sp, d, "embeddings")),
        "ivf_nprobe_sweep": lambda sp, d: S.ivf_nprobe_sweep(
            _t(sp, d, "embeddings")
        ),
        "rake_keywords": lambda sp, d: T.rake_keywords(_t(sp, d, "documents")),
        "cvm_two_sample": lambda sp, d: A.cvm_two_sample(_t(sp, d, "events")),
        "two_proportion_z": lambda sp, d: A.two_proportion_z(
            _t(sp, d, "events")
        ),
        "capture_recapture": lambda sp, d: A.capture_recapture(
            _t(sp, d, "events")
        ),
        "join_order_audit": lambda sp, d: A.join_order_audit(
            _t(sp, d, "orders"), _t(sp, d, "customer"), _t(sp, d, "nation")
        ),
        "cochran_armitage_trend": lambda sp, d: A.cochran_armitage_trend(
            _t(sp, d, "events")
        ),
        "lognormal_length_fit": lambda sp, d: C.lognormal_length_fit(
            _t(sp, d, "documents")
        ),
        "hourly_stats": lambda sp, d: A.hourly_stats(_t(sp, d, "events")),
        "occupancy_asof": lambda sp, d: A.occupancy_asof(_t(sp, d, "events")),
        "session_pairing": lambda sp, d: A.session_pairing(_t(sp, d, "events")),
        "alerts": lambda sp, d: A.alerts(_t(sp, d, "events"), _t(sp, d, "customer")),
        "cumulative_series": lambda sp, d: A.cumulative_series(_t(sp, d, "events")),
        "weekly_revenue_by_type": lambda sp, d: A.weekly_revenue_by_type(
            _t(sp, d, "events")
        ),
        "pricing_summary": lambda sp, d: Q.pricing_summary(_t(sp, d, "lineitem")),
        # r07 gate-green block (all 50 hash-green in CORRECTNESS_r07;
        # pinned locally by tests/test_oracle_parity.py every run).
        "market_basket_lift": lambda sp, d: A.market_basket_lift(
            _t(sp, d, "lineitem")
        ),
        "new_vs_returning": lambda sp, d: A.new_vs_returning(
            _t(sp, d, "events")
        ),
        "ann_mrr_ndcg": lambda sp, d: S.ann_mrr_ndcg(_t(sp, d, "embeddings")),
        "lsh_rebanding_planner": lambda sp, d: D.lsh_rebanding_planner(
            _t(sp, d, "documents")
        ),
        "halflife_popularity": lambda sp, d: A.halflife_popularity(
            _t(sp, d, "events")
        ),
        "span_corruption_plan": lambda sp, d: C.span_corruption_plan(
            _t(sp, d, "documents")
        ),
        "kcore_dup_graph": lambda sp, d: D.kcore_dup_graph(
            _t(sp, d, "documents")
        ),
        "dedup_threshold_sweep": lambda sp, d: D.dedup_threshold_sweep(
            _t(sp, d, "documents")
        ),
        "bloom_parameter_sweep": lambda sp, d: J.bloom_parameter_sweep(
            _t(sp, d, "orders"), _t(sp, d, "customer")
        ),
        "knn_mmr_rerank": lambda sp, d: S.knn_mmr_rerank(
            _t(sp, d, "embeddings")
        ),
        "coverage_select": lambda sp, d: C.coverage_select(
            _t(sp, d, "documents")
        ),
        "forecast_conformal": lambda sp, d: A.forecast_conformal(
            _t(sp, d, "events")
        ),
        "bbit_minhash_est": lambda sp, d: D.bbit_minhash_est(
            _t(sp, d, "documents")
        ),
        "moments_profile": lambda sp, d: A.moments_profile(_t(sp, d, "events")),
        "mann_whitney_pairs": lambda sp, d: A.mann_whitney_pairs(
            _t(sp, d, "events")
        ),
        "theil_sen_slope": lambda sp, d: A.theil_sen_slope(_t(sp, d, "events")),
        "kruskal_wallis": lambda sp, d: A.kruskal_wallis(_t(sp, d, "events")),
        "spearman_corr": lambda sp, d: A.spearman_corr(_t(sp, d, "lineitem")),
        "cramers_v_matrix": lambda sp, d: A.cramers_v_matrix(_t(sp, d, "events")),
        "partition_skew_audit": lambda sp, d: A.partition_skew_audit(
            _t(sp, d, "events")
        ),
        "cross_correlation_lagged": lambda sp, d: A.cross_correlation_lagged(
            _t(sp, d, "events")
        ),
        "sax_symbolize": lambda sp, d: A.sax_symbolize(_t(sp, d, "events")),
        "stratified_sample_mad": lambda sp, d: C.stratified_sample_mad(
            _t(sp, d, "documents")
        ),
        "token_budget_curriculum": lambda sp, d: C.token_budget_curriculum(
            _t(sp, d, "documents")
        ),
        "simhash_hamming_histogram": lambda sp, d: D.simhash_hamming_histogram(
            _t(sp, d, "documents")
        ),
        "dup_link_prediction": lambda sp, d: D.dup_link_prediction(
            _t(sp, d, "documents")
        ),
        "word_link_prediction": lambda sp, d: T.word_link_prediction(
            _t(sp, d, "documents")
        ),
        "knn_ivf_pq": lambda sp, d: S.knn_ivf_pq(_t(sp, d, "embeddings")),
        "cube_returnflag_status": lambda sp, d: Q.cube_returnflag_status(
            _t(sp, d, "lineitem")
        ),
        "funnel_windowed": lambda sp, d: A.funnel_windowed(_t(sp, d, "events")),
        "hurst_exponent": lambda sp, d: A.hurst_exponent(_t(sp, d, "events")),
        "burst_viterbi": lambda sp, d: A.burst_viterbi(_t(sp, d, "events")),
        "dedup_savings_by_source": lambda sp, d: D.dedup_savings_by_source(
            _t(sp, d, "documents")
        ),
        "padding_waste_sweep": lambda sp, d: C.padding_waste_sweep(
            _t(sp, d, "documents")
        ),
        "mutual_info_matrix": lambda sp, d: A.mutual_info_matrix(
            _t(sp, d, "events")
        ),
        "cusum_drift": lambda sp, d: A.cusum_drift(_t(sp, d, "events")),
        "wilcoxon_signed_rank": lambda sp, d: A.wilcoxon_signed_rank(
            _t(sp, d, "events")
        ),
        "theil_index": lambda sp, d: C.theil_index(_t(sp, d, "documents")),
        "kendall_tau_matrix": lambda sp, d: A.kendall_tau_matrix(
            _t(sp, d, "lineitem")
        ),
        "jsd_sources": lambda sp, d: SC.jsd_sources(_t(sp, d, "documents")),
        "hilbert_layout": lambda sp, d: A.hilbert_layout(_tp(sp, d, "events")),
        "brown_forsythe": lambda sp, d: A.brown_forsythe(_t(sp, d, "events")),
        "holt_winters": lambda sp, d: A.holt_winters(_t(sp, d, "events")),
        "fellegi_sunter_linkage": lambda sp, d: D.fellegi_sunter_linkage(
            _t(sp, d, "documents")
        ),
        "anova_oneway": lambda sp, d: A.anova_oneway(_t(sp, d, "events")),
        "dirichlet_query_likelihood": lambda sp, d: SC.dirichlet_query_likelihood(
            _t(sp, d, "documents")
        ),
        "isotonic_daily": lambda sp, d: A.isotonic_daily(_t(sp, d, "events")),
        "kneser_ney_logprob": lambda sp, d: SC.kneser_ney_logprob(
            _tp(sp, d, "documents")
        ),
        "diversity_profile": lambda sp, d: C.diversity_profile(
            _t(sp, d, "documents")
        ),
        "matryoshka_recall": lambda sp, d: S.matryoshka_recall(
            _t(sp, d, "embeddings")
        ),
        # r06 gate-green block (all 50 hash-green in CORRECTNESS_r06;
        # pinned locally by tests/test_oracle_parity.py every run).
        "gini_token_concentration": lambda sp, d: C.gini_token_concentration(
            _t(sp, d, "documents")
        ),
        "minhash_est_jaccard": lambda sp, d: D.minhash_est_jaccard(
            _t(sp, d, "documents")
        ),
        "embedding_isotropy": lambda sp, d: S.embedding_isotropy(
            _t(sp, d, "embeddings")
        ),
        "knn_pq": lambda sp, d: S.knn_pq(_t(sp, d, "embeddings")),
        "dup_cluster_histogram": lambda sp, d: D.dup_cluster_histogram(
            _t(sp, d, "documents")
        ),
        "ttr_profile": lambda sp, d: T.ttr_profile(_t(sp, d, "documents")),
        "cdc_chunk_stats": lambda sp, d: D.cdc_chunk_stats(_t(sp, d, "documents")),
        "vocab_coverage_curve": lambda sp, d: SC.vocab_coverage_curve(
            _t(sp, d, "documents")
        ),
        "merge_upsert": lambda sp, d: A.merge_upsert(_t(sp, d, "documents")),
        "scd2_intervals": lambda sp, d: A.scd2_intervals(_t(sp, d, "events")),
        "scd2_asof_enrich": lambda sp, d: A.scd2_asof_enrich(_t(sp, d, "events")),
        "salted_group_count": lambda sp, d: A.salted_group_count(
            _t(sp, d, "events")
        ),
        "bpe_learn_merges": lambda sp, d: T.bpe_learn_merges(
            _t(sp, d, "documents")
        ),
        "bpe_apply": lambda sp, d: T.bpe_apply(_t(sp, d, "documents")),
        "ann_paths_recall": lambda sp, d: S.ann_paths_recall(
            _t(sp, d, "embeddings")
        ),
        "kanonymity_audit": lambda sp, d: A.kanonymity_audit(_t(sp, d, "events")),
        "ldiversity_audit": lambda sp, d: A.ldiversity_audit(_t(sp, d, "events")),
        "cross_source_dup_matrix": lambda sp, d: D.cross_source_dup_matrix(
            _t(sp, d, "documents")
        ),
        "cluster_separation": lambda sp, d: CL.cluster_separation(
            _t(sp, d, "embeddings")
        ),
        "tcloseness_audit": lambda sp, d: A.tcloseness_audit(_t(sp, d, "events")),
        "bootstrap_mean_ci": lambda sp, d: A.bootstrap_mean_ci(_t(sp, d, "events")),
        "seasonal_decompose": lambda sp, d: A.seasonal_decompose(_t(sp, d, "events")),
        "value_drift_psi": lambda sp, d: A.value_drift_psi(_t(sp, d, "events")),
        "modality_agreement": lambda sp, d: T.modality_agreement(
            _t(sp, d, "documents"), _t(sp, d, "embeddings")
        ),
        "heavy_hitters_cms": lambda sp, d: A.heavy_hitters_cms(
            _t(sp, d, "events")
        ),
        "bloom_prefilter_join": lambda sp, d: J.bloom_prefilter_join(
            _t(sp, d, "orders"), _t(sp, d, "customer")
        ),
        "keyword_textrank": lambda sp, d: T.keyword_textrank(
            _t(sp, d, "documents")
        ),
        "chi2_independence": lambda sp, d: A.chi2_independence(
            _t(sp, d, "events")
        ),
        "acf_daily": lambda sp, d: A.acf_daily(_t(sp, d, "events")),
        "mann_kendall": lambda sp, d: A.mann_kendall(_t(sp, d, "events")),
        "benford_deviation": lambda sp, d: A.benford_deviation(
            _t(sp, d, "events")
        ),
        "runs_test": lambda sp, d: A.runs_test(_t(sp, d, "events")),
        "join_cardinality_audit": lambda sp, d: A.join_cardinality_audit(
            _t(sp, d, "events")
        ),
        "audience_overlap": lambda sp, d: A.audience_overlap(
            _t(sp, d, "events")
        ),
        "quality_emd": lambda sp, d: C.quality_emd(_t(sp, d, "documents")),
        "markov_stationary": lambda sp, d: A.markov_stationary(
            _t(sp, d, "events")
        ),
        "heaps_fit": lambda sp, d: SC.heaps_fit(_t(sp, d, "documents")),
        "log_odds_distinctive_terms": lambda sp, d: SC.log_odds_distinctive_terms(
            _t(sp, d, "documents")
        ),
        "pareto_frontier": lambda sp, d: A.pareto_frontier(_t(sp, d, "part")),
        "interval_coverage": lambda sp, d: A.interval_coverage(
            _t(sp, d, "events")
        ),
        "user_streaks": lambda sp, d: A.user_streaks(_t(sp, d, "events")),
        "symspell_neighbors": lambda sp, d: T.symspell_neighbors(
            _t(sp, d, "part"), "p_name"
        ),
        "mutual_nearest_neighbors": lambda sp, d: S.mutual_nearest_neighbors(
            _t(sp, d, "embeddings")
        ),
        "quality_quantile_normalize": lambda sp, d: C.quality_quantile_normalize(
            _t(sp, d, "documents")
        ),
        "session_paths": lambda sp, d: A.session_paths(_t(sp, d, "events")),
        "kaplan_meier_retention": lambda sp, d: A.kaplan_meier_retention(
            _t(sp, d, "events")
        ),
        "asof_join_forward": lambda sp, d: A.asof_join_forward(
            _t(sp, d, "events")
        ),
        "cross_source_perplexity": lambda sp, d: SC.cross_source_perplexity(
            _t(sp, d, "documents")
        ),
        "impact_postings": lambda sp, d: SC.impact_postings(
            _tp(sp, d, "documents")
        ),
        "profile_columns": lambda sp, d: A.profile_columns(_t(sp, d, "events")),
        # r05 gate-green block (all 50 hash-green in CORRECTNESS_r05;
        # pinned locally by tests/test_oracle_parity.py every run).
        # --- r05-verified: deferred from the r04 window ---
        "rolling_daily_revenue": lambda sp, d: A.rolling_daily_revenue(
            _t(sp, d, "events")
        ),
        "dow_profile": lambda sp, d: A.dow_profile(_t(sp, d, "events")),
        "value_percentile_ranks": lambda sp, d: A.value_percentile_ranks(
            _t(sp, d, "events")
        ),
        # --- never driver-verified: added late in r04 ---
        "nation_stock_value": lambda sp, d: Q.nation_stock_value(
            _t(sp, d, "lineitem"), _t(sp, d, "supplier"), _t(sp, d, "nation")
        ),
        "similarity_join_allpairs": lambda sp, d: D.similarity_join_allpairs(
            _t(sp, d, "documents")
        ),
        "changepoint_meanshift": lambda sp, d: A.changepoint_meanshift(
            _t(sp, d, "events")
        ),
        "embedding_dim_corr": lambda sp, d: S.embedding_dim_corr(
            _t(sp, d, "embeddings")
        ),
        "tokenizer_fertility": lambda sp, d: T.tokenizer_fertility(
            _t(sp, d, "documents")
        ),
        "zorder_layout": lambda sp, d: A.zorder_layout(_t(sp, d, "events")),
        "bigram_logprob": lambda sp, d: SC.bigram_logprob(_t(sp, d, "documents")),
        "percentile_rollup_kll": lambda sp, d: A.percentile_rollup_kll(
            _t(sp, d, "events")
        ),
        "source_drift_ks": lambda sp, d: C.source_drift_ks(_t(sp, d, "documents")),
        "zipf_fit": lambda sp, d: SC.zipf_fit(_t(sp, d, "documents")),
        "ann_recall_eval": lambda sp, d: S.ann_recall_eval(
            _t(sp, d, "embeddings")
        ),
        "chunk_dedup_cdc": lambda sp, d: D.chunk_dedup_cdc(_t(sp, d, "documents")),
        "dup_graph_transitivity": lambda sp, d: D.dup_graph_transitivity(
            _t(sp, d, "documents")
        ),
        "cdc_doc_overlap": lambda sp, d: D.cdc_doc_overlap(_t(sp, d, "documents")),
        "knn_rrf_fusion": lambda sp, d: S.knn_rrf_fusion(_t(sp, d, "embeddings")),
        "embedding_random_projection": lambda sp, d: S.embedding_random_projection(
            _t(sp, d, "embeddings")
        ),
        "knn_two_stage": lambda sp, d: S.knn_two_stage(_t(sp, d, "embeddings")),
        "mixture_temperature": lambda sp, d: C.mixture_temperature(
            _t(sp, d, "documents")
        ),
        "hash_vectorize": lambda sp, d: T.hash_vectorize(_t(sp, d, "documents")),
        "embedding_top_component": lambda sp, d: S.embedding_top_component(
            _t(sp, d, "embeddings")
        ),
        "doc_knn_hashed": lambda sp, d: T.doc_knn_hashed(_t(sp, d, "documents")),
        "rfm_segments": lambda sp, d: A.rfm_segments(_t(sp, d, "events")),
        "cohort_ltv": lambda sp, d: A.cohort_ltv(_t(sp, d, "events")),
        "user_burstiness": lambda sp, d: A.user_burstiness(_t(sp, d, "events")),
        # --- r05 re-confirmation block (the 7 oldest r01/r02 greens now sit
        # in the r08 gate window above; the rest stay here) ---
        "top_revenue_orders": lambda sp, d: Q.top_revenue_orders(
            _t(sp, d, "customer"), _t(sp, d, "orders"), _t(sp, d, "lineitem")
        ),
        "filter_project": lambda sp, d: A.filter_project(_t(sp, d, "events")),
        "group_count": lambda sp, d: A.group_count(_t(sp, d, "events")),
        "global_counts": lambda sp, d: A.global_counts(_t(sp, d, "events")),
        "occupancy_clamped": lambda sp, d: A.occupancy_clamped(_t(sp, d, "events")),
        "revenue_duration": lambda sp, d: A.revenue_duration(_t(sp, d, "events")),
        "avg_per_group": lambda sp, d: A.avg_per_group(_t(sp, d, "events")),
        "daily_buckets": lambda sp, d: A.daily_buckets(_t(sp, d, "events")),
        "duration_stats": lambda sp, d: A.duration_stats(_t(sp, d, "events")),
        "heatmap_hour": lambda sp, d: A.heatmap_hour(_t(sp, d, "events")),
        "entry_exit_ratio": lambda sp, d: A.entry_exit_ratio(_t(sp, d, "events")),
        "enrich_users": lambda sp, d: A.enrich_users(
            _t(sp, d, "events"), _t(sp, d, "customer")
        ),
        "occupancy_pct": lambda sp, d: A.occupancy_pct(
            _t(sp, d, "events"), _t(sp, d, "customer"), _t(sp, d, "nation")
        ),
        "top_k_users": lambda sp, d: A.top_k_users(_t(sp, d, "events")),
        "max_ts": lambda sp, d: A.max_ts(_t(sp, d, "events")),
        "set_ops": lambda sp, d: A.set_ops(_t(sp, d, "events")),
        # r04 gate-green block, remaining 7 (all hash-green in
        # CORRECTNESS_r04; the first 5 were re-confirmed in the r10
        # window, the next 38 sit in the r11 gate window above;
        # pinned locally by tests/test_oracle_parity.py every run).
        "hopping_window_stats": lambda sp, d: A.hopping_window_stats(
            _t(sp, d, "events")
        ),
        "pagerank_dup_graph": lambda sp, d: D.pagerank_dup_graph(
            _t(sp, d, "documents")
        ),
        "json_props_audit": lambda sp, d: A.json_props_audit(_t(sp, d, "events")),
        "conversion_lag_histogram": lambda sp, d: A.conversion_lag_histogram(
            _t(sp, d, "events")
        ),
        "daily_trend_regression": lambda sp, d: A.daily_trend_regression(
            _t(sp, d, "events")
        ),
        "join_key_skew": lambda sp, d: A.join_key_skew(_t(sp, d, "events")),
        "shingle_novelty": lambda sp, d: C.shingle_novelty(
            _t(sp, d, "documents")
        ),
    }


def staged_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """STAGED surface — operators verified but not yet driver-facing (see
    CLAUDE.md). The r11 batch (source_length_drift..
    perplexity_filter_sweep) was promoted into queries() at the top of
    this round; entries staged for r12 accumulate here behind the full
    five-pin checklist (double-SF parity, vanilla-session dtype, edge
    pins, plan pins, partition invariance) before any promotion. Pinned
    locally on every pytest run by tests/test_staged_parity.py (same
    harness as queries()).
    """
    from inde1_spark.operators import analytics as A  # noqa: F401
    from inde1_spark.operators import corpus as C  # noqa: F401
    from inde1_spark.operators import dedup as D  # noqa: F401
    from inde1_spark.operators import scoring as SC  # noqa: F401
    from inde1_spark.operators import similarity as S  # noqa: F401
    from inde1_spark.operators import text as TX  # noqa: F401

    return {
        # ----- r12 batch, first tranche (promotes in the r12 rotation) -----
        "jonckheere_terpstra_trend": lambda sp, d: A.jonckheere_terpstra_trend(
            _t(sp, d, "events")
        ),
        "mantel_haenszel_or": lambda sp, d: A.mantel_haenszel_or(
            _t(sp, d, "events")
        ),
        "range_partition_plan": lambda sp, d: A.range_partition_plan(
            _t(sp, d, "events")
        ),
        "join_size_estimate_audit": lambda sp, d: A.join_size_estimate_audit(
            _t(sp, d, "events"),
            _t(sp, d, "customer"),
            _t(sp, d, "orders"),
            _t(sp, d, "lineitem"),
            _t(sp, d, "part"),
        ),
        "langid_calibration_audit": lambda sp, d: TX.langid_calibration_audit(
            _t(sp, d, "documents")
        ),
        "graph_modularity_audit": lambda sp, d: D.graph_modularity_audit(
            _t(sp, d, "documents")
        ),
        "bm25_parameter_sweep": lambda sp, d: SC.bm25_parameter_sweep(
            _t(sp, d, "documents")
        ),
        "session_gap_sweep": lambda sp, d: A.session_gap_sweep(
            _t(sp, d, "events")
        ),
        "predicate_selectivity_audit": lambda sp, d: (
            A.predicate_selectivity_audit(_t(sp, d, "events"))
        ),
        # ----- r12 batch, second tranche (staged in r11) -----
        "restart_cost_audit": lambda sp, d: A.restart_cost_audit(
            _t(sp, d, "events")
        ),
        "backfill_skew_audit": lambda sp, d: A.backfill_skew_audit(
            _t(sp, d, "events")
        ),
        "fk_integrity_audit": lambda sp, d: A.fk_integrity_audit(
            _t(sp, d, "events"),
            _t(sp, d, "customer"),
            _t(sp, d, "orders"),
            _t(sp, d, "lineitem"),
            _t(sp, d, "part"),
            _t(sp, d, "documents"),
            _t(sp, d, "embeddings"),
        ),
        # ----- r13 batch, first tranche (accumulating behind the r12 batch) -----
        "cdc_mask_sweep": lambda sp, d: D.cdc_mask_sweep(
            _t(sp, d, "documents")
        ),
        "quality_dedup_interaction": lambda sp, d: C.quality_dedup_interaction(
            _t(sp, d, "documents")
        ),
        "event_order_integrity_audit": lambda sp, d: (
            A.event_order_integrity_audit(_t(sp, d, "events"))
        ),
        "minhash_perm_sweep": lambda sp, d: D.minhash_perm_sweep(
            _t(sp, d, "documents")
        ),
        "curation_order_audit": lambda sp, d: C.curation_order_audit(
            _t(sp, d, "documents")
        ),
        "text_normalization_audit": lambda sp, d: TX.text_normalization_audit(
            _t(sp, d, "documents")
        ),
        "pq_distortion_sweep": lambda sp, d: S.pq_distortion_sweep(
            _t(sp, d, "embeddings")
        ),
        "lm_order_sweep": lambda sp, d: SC.lm_order_sweep(
            _t(sp, d, "documents")
        ),
        "keep_policy_audit": lambda sp, d: D.keep_policy_audit(
            _t(sp, d, "documents")
        ),
        "hash_width_audit": lambda sp, d: D.hash_width_audit(
            _t(sp, d, "documents")
        ),
        "corpus_shard_plan": lambda sp, d: C.corpus_shard_plan(
            _t(sp, d, "documents")
        ),
        "state_size_profile": lambda sp, d: A.state_size_profile(
            _t(sp, d, "events")
        ),
        # ----- r14 batch, first tranche (staged in r11) -----
        "cache_hit_curve": lambda sp, d: A.cache_hit_curve(
            _t(sp, d, "events")
        ),
        "allowed_lateness_sweep": lambda sp, d: A.allowed_lateness_sweep(
            _t(sp, d, "events")
        ),
        "blocking_key_sweep": lambda sp, d: D.blocking_key_sweep(
            _t(sp, d, "documents")
        ),
        # ----- r14 batch, second tranche (staged in r11) -----
        "ttl_staleness_sweep": lambda sp, d: A.ttl_staleness_sweep(
            _t(sp, d, "events")
        ),
        "trigger_interval_sweep": lambda sp, d: A.trigger_interval_sweep(
            _t(sp, d, "events")
        ),
        "truncation_loss_sweep": lambda sp, d: C.truncation_loss_sweep(
            _t(sp, d, "documents")
        ),
        # ----- r14 batch, third tranche (staged in r11) -----
        "lsh_bucket_balance_audit": lambda sp, d: D.lsh_bucket_balance_audit(
            _t(sp, d, "documents")
        ),
        "shuffle_width_sweep": lambda sp, d: A.shuffle_width_sweep(
            _t(sp, d, "events")
        ),
        "retention_policy_sweep": lambda sp, d: A.retention_policy_sweep(
            _t(sp, d, "events")
        ),
        # ----- r14 batch, fourth tranche (staged in r11) -----
        "column_completeness_audit": lambda sp, d: A.column_completeness_audit(
            _t(sp, d, "events")
        ),
        "scan_split_sweep": lambda sp, d: A.scan_split_sweep(
            _t(sp, d, "events")
        ),
        "rate_limit_sweep": lambda sp, d: A.rate_limit_sweep(
            _t(sp, d, "events")
        ),
        # ----- r15 batch, first tranche (staged in r11) -----
        "watermark_state_tradeoff": lambda sp, d: A.watermark_state_tradeoff(
            _t(sp, d, "events")
        ),
        "key_churn_audit": lambda sp, d: A.key_churn_audit(
            _t(sp, d, "events")
        ),
        # ----- r15 batch, second tranche (staged in r11) -----
        "lateness_attribution_audit": lambda sp, d: A.lateness_attribution_audit(
            _t(sp, d, "events")
        ),
        "ivf_list_balance_audit": lambda sp, d: S.ivf_list_balance_audit(
            _t(sp, d, "embeddings")
        ),
        "pack_budget_sweep": lambda sp, d: C.pack_budget_sweep(
            _t(sp, d, "documents")
        ),
    }


def staged_oracle_sql() -> dict[str, str]:
    from inde1_spark.oracles import STAGED_ORACLES

    return dict(STAGED_ORACLES)


def test_only_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Bit-reproducible DuckDB twins of the scale-path dedups — TEST
    INFRASTRUCTURE, deliberately NOT part of the engine's query surface.

    Their plans are scale-killers by construction (a single-task sorted
    shingle dictionary for the minhash/simhash twins, a cartesian pair
    join for the embedding twin) and exist only to reproduce the fast
    paths' math digit-for-digit in DuckDB; the production names
    (dedup_minhash_lsh / dedup_simhash / dedup_embedding) delegate to the
    fast paths, whose gate entries hash against exact-ground-truth /
    contract oracles directly. Pinned locally on every pytest run by
    tests/test_oracle_parity.py, same harness as queries().
    """
    from inde1_spark.operators import dedup as D

    return {
        "dedup_minhash_oracle": lambda sp, d: D.dedup_minhash_oracle(
            _t(sp, d, "documents")
        ),
        "dedup_simhash_oracle": lambda sp, d: D.dedup_simhash_oracle(
            _t(sp, d, "documents")
        ),
        "dedup_embedding_oracle": lambda sp, d: D.dedup_embedding_oracle(
            _t(sp, d, "embeddings")
        ),
    }


# ---------------------------------------------------------------------------
# oracle_sql(): DuckDB-equivalent ANSI SQL per query
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    from inde1_spark.oracles import ORACLES

    return dict(ORACLES)


def test_only_oracle_sql() -> dict[str, str]:
    from inde1_spark.oracles import TEST_ONLY_ORACLES

    return dict(TEST_ONLY_ORACLES)
