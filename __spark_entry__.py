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
    # Round-5 rotation: new/changed this round — the new LSH skew-monitor
    # gate, the newly-oracled zlib query (no more no_oracle rows), the
    # three minhash queries whose candidate generation was refactored
    # into lsh_banded_frame, and the two Delta-backed gates whose log
    # writer changed (metaData refresh + private checkpoints).
    "dedup_lsh_bucket_stats",
    "dedup_duplicated_spans",
    "dedup_span_removal_stats",
    "error_in_signup_window_by_user",
    "text_compression_ratio",
    "dedup_minhash_lsh",
    "dedup_minhash_df_pruned",
    "dedup_minhash_incremental",
    "delta_roundtrip_stats",
    "streaming_ingest_gate",
    # the seven revenue rollups converted to decimal accumulation
    # (scale-stable money sums — see registry.money_sum)
    "pricing_summary",
    "pricing_summary_sql",
    "revenue_by_segment",
    "brand_volume",
    "regional_supplier_volume",
    "order_revenue_cube",
    "promo_revenue_share",
    # Round-4 rotation (kept high: still the most recently first-gated)
    "events_json_props_stats",
    "event_type_user_grouping_sets",
    "order_priority_check",
    "promo_revenue_share",
    "events_trailing_hour_sum",
    "events_hourly_gapfilled",
    "embedding_pq_topk",
    # new in round 4: sketches (t-digest / Misra-Gries / HLL gates),
    # recall-gated ANN, and the training-pipeline corpus operators
    "event_value_tdigest",
    "events_heavy_hitter_users",
    "events_distinct_users_hll",
    "documents_domain_cap",
    "events_user_cms_counts",
    "events_bloom_pruned_building",
    "dedup_levenshtein_blocked",
    "events_theta_distinct_algebra",
    "documents_sequence_packing",
    "events_snapshot_diff",
    "events_robust_outliers",
    "large_order_customers",
    "embedding_incremental_near_dup",
    "delta_roundtrip_stats",
    "streaming_ingest_gate",
    "event_value_kll",
    "events_cms_daily_range",
    # LLM pipeline: dedup
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_minhash_lsh",
    "dedup_minhash_df_pruned",
    "dedup_minhash_incremental",
    "dedup_simhash",
    "dedup_simhash_hamming",
    "dedup_ngram_blocked",
    "dedup_cluster_summary",
    "dedup_clusters_alternating",
    "dedup_quality_keepers",
    # LLM pipeline: similarity / embeddings
    "embedding_topk",
    "embedding_quantized_topk",
    "embedding_near_dup",
    "embedding_ann_lsh",
    "embedding_topk_vectorized",
    "embedding_ann_ivf",
    # LLM pipeline: text analysis
    "text_quality",
    "lang_id_heuristic",
    "token_counts",
    "doc_fingerprints",
    "text_redaction",
    "document_chunks",
    "vocabulary_top_terms",
    "tfidf_scores",
    "text_repetition",
    "benchmark_decontamination",
    # LLM pipeline: sampling / splits
    "documents_split_counts",
    "documents_stratified_sample",
    "token_budget_mixture",
    "documents_shard_stats",
    "documents_weighted_sample",
    # LLM pipeline: multimodal plumbing
    "multimodal_metadata",
    "multimodal_frame_features",
    "multimodal_frame_sample",
    # domain ETL composites
    "commute_enrichment",
    "events_column_profile",
    "event_value_percentiles",
    "cdc_apply_snapshot",
    "cdc_scd2_history",
    "lang_confusion_matrix",
    "domain_wellness_kpis",
    "synthetic_activities_sample",
    "synthetic_activities_profile",
    "cdc_envelope_roundtrip",
    "activity_gold_enrichment",
    # plans changed this round (re-verify under the gate)
    "event_value_deciles",
    "salted_event_rollup",
    "user_qualification",
    "wellness_kpis",
    "slack_messages",
    "events_after_watermark",
    "events_user_zscores",
    "event_value_histogram",
    # representative relational catalog
    "pricing_summary",
    "event_type_stats",
    "revenue_by_segment",
    "latest_events_per_user",
    "purchase_asof_click",
    "error_in_signup_window",
    "events_session_1h",
    "hypertable_daily_rollup",
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
