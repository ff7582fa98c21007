"""Build a deterministically-sampled oracle dir from a heavy sf fixture.

The 12 sf1 oracle-gate exclusions (ROADMAP #15) are all oracle-COST
exclusions: their DuckDB replays are deliberately brute-force (minhash /
ngram / SimHash-Hamming signature comprehensions, recursive-CTE
closures, embedding all-pairs) and take minutes at 50k docs, while the
Spark sides complete comfortably. Rather than leave those queries gated
only at sf0.01 (520 docs), this tool manufactures a middle point the
oracles CAN afford: a deterministic md5 sample of the sf1 corpus
(default 10% -> ~5k docs / 2k vectors, 10x the sf0.01 gate corpus),
with every other table hardlinked unchanged so `check_oracle.py` runs
against the dir as-is.

Determinism: a row survives iff
``CAST('0x' || substr(md5('orasample|' || id), 1, 8) AS BIGINT) % K = 0``
— the same keyed-md5 idiom every sampling operator in the repo uses, so
the sample is reproducible across runs/engines and independent of row
order. Planted near-copy families survive proportionally (the
`_with_near_copies` corpora plant copies of doc_id < 25 at QUERY time,
so any surviving low doc_ids still produce planted pairs).

Usage:
    python tools/make_oracle_sample.py [src_dir] [dest_dir] [K]
    # defaults: /tmp/spark_graft_sf1 /tmp/spark_graft_sf1_sample 10
then:
    python tools/check_oracle.py /tmp/spark_graft_sf1_sample \
        dedup_minhash_lsh dedup_minhash_df_pruned ...
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SAMPLED_TABLES = {"documents": "doc_id", "embeddings": "vec_id"}

# The sf1 oracle-cost exclusion family this sample exists to gate
# (kept in one place so the gate invocation can't drift from the tool).
HEAVY_ORACLE_QUERIES = [
    "dedup_minhash_lsh",
    "fuzzy_decontamination",
    "dedup_minhash_df_pruned",
    "dedup_minhash_incremental",
    "dedup_lsh_bucket_stats",
    "dedup_ngram_blocked",
    "dedup_ngram_prefix",
    "dedup_simhash_hamming",
    "dedup_cluster_summary",
    "dedup_clusters_alternating",
    "dedup_quality_keepers",
    "dedup_levenshtein_blocked",
    "dedup_levenshtein_passjoin",
    "dedup_spans_incremental",
    "dedup_spans_incremental_removal",
    "embedding_near_dup",
    "embedding_incremental_near_dup",
    "embedding_ivf_cell_stats",
    "embedding_index_reload_topk",
    "embedding_ivfpq_topk",
    # r8: the PQ artifact gate (same brute-force-baseline oracle class)
    # and the sampled monitor (minhash signature comprehension oracle)
    "embedding_pq_index_reload_topk",
    "dedup_lsh_bucket_stats_sampled",
    # runs against the UNSAMPLED (hardlinked) sf1 events table — the
    # slice is in the query itself (r7: the at-scale external check the
    # 38M-pair global form cannot have)
    "error_in_signup_window_sliced",
    # late r8: the two struct-zip gram rewrites — at-scale evidence that
    # struct distinctness/equality replays the oracle's string grams
    "text_repetition",
    "benchmark_decontamination",
    # r10: the new text/retrieval/semantic operators — each trains its
    # model/blocks on the sampled corpus identically on both engines,
    # so the sampled gate is self-consistent
    "bm25_scores",
    "lm_quality_nll",
    "semantic_dedup_pairs",
    # r10b: the incremental SemDeDup gate shares the batch form's
    # brute-force O(n²) oracle (it was registered after the first r10
    # close — adding it here closes that gap), and the eight
    # second-session operators take the same sampled at-scale check
    "semantic_dedup_incremental",
    "gopher_quality_filter",
    "token_entropy",
    "c4_line_dedup",
    "c4_line_dedup_incremental",
    "dsir_importance_weights",
    "embedding_mmr_rerank",
    "lm_quality_bigram_nll",
    "vocab_zipf_fit",
    # r11: the learned quality filter (trains on the sampled corpus
    # identically in both engines — the oracle unrolls the same three
    # gradient steps), its weight-artifact gate (same oracle + the
    # pinned reload flag), and the per-language perplexity terciles
    "quality_classifier_scores",
    "quality_classifier_reload_scores",
    "ccnet_perplexity_buckets",
    # r12: UniMax mixture sampling — the water-fill allocation and the
    # keyed-hash sample replay identically on the sampled corpus (the
    # capped set just resolves against the sample's own supplies)
    "token_budget_mixture_unimax",
    # r12 (continuation): the ensemble composes three HEAVY-list
    # component oracles (classifier + ccnet terciles + DSIR), so it
    # takes the same sampled at-scale check they do
    "quality_ensemble_report",
    # r12 continuation #2: the shingle-comprehension oracles (novelty /
    # overlap), the recursive-CTE closure split, the unrolled-Lloyd and
    # unrolled-power-iteration oracles (list-lambda distance/gram passes
    # are brute force in DuckDB), and the calibration diagram that nests
    # the classifier oracle
    "ngram_novelty_by_source",
    "source_overlap_matrix",
    "leakage_safe_split_counts",
    "kmeans_cluster_stats",
    "kmeans_reload_stats",
    "embedding_pca_top_component",
    "classifier_calibration_bins",
    # the curve shares the unrolled-merge oracle scaffolding with
    # bpe_merges (the 491 s full-sf1 class)
    "bpe_vocab_size_curve",
]


def make_sample(src: str, dest: str, k: int = 10) -> None:
    os.makedirs(dest, exist_ok=True)
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        table = fname[: -len(".parquet")]
        s, d = os.path.join(src, fname), os.path.join(dest, fname)
        if os.path.exists(d):
            os.remove(d)
        if table in SAMPLED_TABLES:
            key = SAMPLED_TABLES[table]
            duckdb.sql(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{s}')
                  WHERE CAST('0x' || substr(md5('orasample|' || {key}::VARCHAR), 1, 8)
                             AS BIGINT) % {k} = 0
                ) TO '{d}' (FORMAT PARQUET)
                """
            )
        else:
            try:
                os.link(s, d)  # hardlink: zero-copy, read-only use
            except OSError:
                shutil.copyfile(s, d)
    for table in SAMPLED_TABLES:
        n = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{os.path.join(dest, table)}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows sampled (1/{k})")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1_sample"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make_sample(src, dest, k)
