"""Next-decade sweep (r7, VERDICT #1): run the dedup/ANN/span heavy
families at TWO fixtures — sf1 and a K×-larger one (default sf10:
500k docs / 200k vectors from ``make_sf.py ... documents,embeddings``)
— in one warmed session, and report, per query:

    ratio_cold = t_cold(big) / (K * t_cold(sf1))
    ratio_warm = t_warm(big) / (K * t_warm(sf1))

ratio ≈ 1 is linear scaling; < 1 sub-linear (fixed overheads amortize,
granularities deepen); a family > ~1.2 is the next
``dedup_levenshtein_blocked`` and gets the r6 treatment before a real
corpus finds it. Auto-granularity should STEP UP between the fixtures
(planes 8→11, IVF cells 256→512, PQ codes already at the 256 cap) —
the whole point of deriving from the corpus instead of the tuning set.

Only documents/embeddings exist in the sf10 fixture, so only queries
reading those tables are eligible (QUERIES below).

Usage: python tools/sweep_heavy.py [sf1_dir] [big_dir] [K] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from employee_activity_etl_poc_spark.plans.registry import REGISTRY  # noqa: E402
from employee_activity_etl_poc_spark.session import get_spark  # noqa: E402

# the heavy families: candidate-generating dedup (minhash/simhash/
# ngram/levenshtein), span-level dedup, graph summaries over the pair
# sets, and the ANN stack — everything whose scale story r6 certified
# only across one decade
QUERIES = [
    # exact + near-dup document families
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_minhash_lsh",
    "fuzzy_decontamination",
    "dedup_minhash_df_pruned",
    "dedup_minhash_incremental",
    "dedup_lsh_bucket_stats",
    "dedup_simhash",
    "dedup_simhash_hamming",
    # dedup_ngram_blocked is EXCLUDED by design: its fixed (lang x
    # length) blocks are quadratic BY CONTRACT (10.9B within-block
    # pairs at sf10, one 76k-doc block = 2.9B pairs on one partition —
    # the audit form, like error_in_signup_window). Its scale twins
    # sweep instead: minhash LSH above and the exact prefix join below.
    "dedup_ngram_prefix",
    # dedup_levenshtein_blocked is likewise quadratic BY CONTRACT at
    # the decade step (its width-8 FULL-LENGTH buckets are fixed in
    # number, so pair ENUMERATION grows ~n² even though the r6 L1
    # prefilter keeps DP calls tiny — measured 4.5x linear / 330 s at
    # sf10 vs PassJoin's 0.25x / 34 s). The audit form on a bounded
    # corpus; PassJoin is the family's sweep representative.
    "dedup_levenshtein_passjoin",
    "dedup_cluster_summary",
    "dedup_clusters_alternating",
    "dedup_quality_keepers",
    # span-level dedup
    "dedup_duplicated_spans",
    "dedup_span_removal_stats",
    "dedup_spans_incremental",
    "dedup_spans_incremental_removal",
    # ANN / embedding stack
    "embedding_topk",
    "embedding_topk_vectorized",
    "embedding_quantized_topk",
    "embedding_near_dup",
    "embedding_incremental_near_dup",
    "embedding_ann_lsh",
    "embedding_ann_ivf",
    "embedding_pq_topk",
    "embedding_ivfpq_topk",
    "embedding_ivf_cell_stats",
    "embedding_index_reload_topk",
]


def _run(spark, name: str, sf_dir: str) -> tuple[float, float]:
    fn = REGISTRY[name].fn
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    cold = time.time() - t0
    t1 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    warm = time.time() - t1
    # cache hygiene BETWEEN measurements (after warm, so warm still
    # reuses the cold run's persists, which is what "warm" means): a
    # query's persisted frames must not sit on the heap while the NEXT
    # query's sort/columnar stages allocate — nine queries of
    # accumulated caches starved dedup_ngram_prefix's eager persist
    # into a GCLocker OOM that the query, alone in the session, never
    # hits. Per-query sessions (the 1000-executor reality) have no such
    # neighbor; the sweep must not invent one.
    spark.catalog.clearCache()
    return round(cold, 3), round(warm, 3)


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf10"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    out = sys.argv[4] if len(sys.argv) > 4 else "/tmp/sweep_heavy.json"
    spark = get_spark("sweep-heavy")
    # warm the Python worker pool (see bench.py)
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()

    rec: dict[str, dict] = {}
    for name in QUERIES:
        try:
            c1, w1 = _run(spark, name, sf1)
            cK, wK = _run(spark, name, big)
            rec[name] = {
                "sf1_cold": c1, "sf1_warm": w1,
                "big_cold": cK, "big_warm": wK,
                "ratio_cold": round(cK / (k * c1), 3) if c1 else None,
                "ratio_warm": round(wK / (k * w1), 3) if w1 else None,
            }
            print(
                f"{name}: sf1 {c1}/{w1}s big {cK}/{wK}s "
                f"ratio {rec[name]['ratio_cold']}/{rec[name]['ratio_warm']}",
                flush=True,
            )
        except Exception as exc:  # keep sweeping; report at the end
            rec[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"{name}: ERR {rec[name]['err']}", flush=True)

    worst = sorted(
        (
            (v.get("ratio_warm") or 0, n)
            for n, v in rec.items()
            if "err" not in v
        ),
        reverse=True,
    )[:5]
    summary = {
        "k": k,
        "n_queries": len(QUERIES),
        "n_err": sum("err" in v for v in rec.values()),
        "worst_warm": worst,
        "queries": rec,
    }
    with open(out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({"worst_warm": worst, "n_err": summary["n_err"]}))
    spark.stop()


if __name__ == "__main__":
    main()
