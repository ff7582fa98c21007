"""Index-lifecycle policy, encoded: monitor a PINNED ANN index and
re-train it when drift breaches the bound.

ROADMAP #18 split the problem in two. The engine half shipped across
r6-r7: ``similarity.ivf_cell_stats(cents=...)`` observes a persisted
index's cell populations on the CURRENT corpus (a refit is balanced by
construction and cannot see drift), and ``operators.index_store``
save/load pins centroids + derived granularities (probe count,
``built_n``) into a parquet artifact, gated by the reload≡fresh
identity. This module is the remaining DEPLOYMENT half — "run the
monitor per ingest epoch, re-train on breach" — as one idempotent call
a scheduler (foreachBatch hook, cron'd job) invokes per epoch.

The policy is deliberately simple and fully driver-side-decided from
ONE monitor row; everything heavy (assignment matmul, k-center fit)
stays distributed in the operators it delegates to. Reference parity:
the reference persists no index state (its dedup is pandas
``drop_duplicates``, ``bronze/test7.py``); this belongs to the
LLM-pipeline surface the engine adds.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..operators import similarity as SIM
from ..operators.index_store import load_ann_index, save_ann_index

__all__ = ["refresh_ivf_index_if_drifted", "default_index_path"]


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` resolved against the session's
    Hadoop conf — the SAME filesystem ``save_ann_index``'s parquet write
    lands on. The r7 lifecycle used ``os.path``/``shutil`` here, which
    silently reports 'no artifact' for every path on a non-local default
    FS (s3a://, hdfs://) and retrains each epoch — drift would never be
    observed (r7 advice)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def refresh_ivf_index_if_drifted(
    spark: SparkSession,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    imbalance_bound: float = 8.0,
    n: int | None = None,
) -> dict:
    """One lifecycle epoch for an IVF index artifact at ``path``.

    - No artifact yet → train (k-center + Lloyd, every granularity
      auto-derived from the CURRENT corpus count) and save; report
      ``action='built'``.
    - Artifact exists → measure the pinned centroids' cell populations
      on the current corpus (``ivf_cell_stats(cents=...)``). Within
      ``imbalance_bound`` → leave the index untouched (probers keep
      bit-identical behavior; report ``action='kept'``). Breached →
      re-train on the current corpus, overwrite the artifact
      atomically-enough for parquet (write to ``path + '.next'``, then
      swap), and report ``action='refreshed'`` with the before/after
      imbalance so the caller can alert on a retrain that did NOT
      rebalance (data got genuinely skewed, not just drifted).

    Returns a driver-side dict: ``{action, n, built_n, n_cells,
    imbalance, imbalance_after (refreshed only), n_probe}``. Idempotent
    per corpus snapshot: a second call on the same corpus is always
    ``'kept'`` (a fresh fit on the corpus it was fit on is balanced).
    """
    if n is None:
        n = corpus.count()

    def _train_and_save(target: str) -> dict:
        cents = SIM._ivf_centroids_kcenter(
            corpus, id_col, vec_col, SIM.suggest_ivf_cells(n)
        )
        n_probe = SIM.suggest_ivf_probe(n, len(cents))
        dim = len(cents[0])
        save_ann_index(
            spark, target, dim=dim, built_n=n, n_probe=n_probe,
            centroids=cents,
        )
        return {"n_cells": len(cents), "n_probe": n_probe}

    fs, hpath = _hadoop_fs(spark, path)
    if not fs.exists(hpath):
        info = _train_and_save(path)
        return {"action": "built", "n": n, "built_n": n, **info}

    idx = load_ann_index(spark, path)
    stat = SIM.ivf_cell_stats(
        corpus, id_col, vec_col,
        cents=idx["centroids"], imbalance_bound=imbalance_bound, n=n,
    ).collect()[0]
    report = {
        "n": n,
        "built_n": idx["built_n"],
        "n_cells": len(idx["centroids"]),
        "n_probe": idx["n_probe"],
        "imbalance": stat["imbalance"],
    }
    if stat["imbalance_ok"]:
        return {"action": "kept", **report}

    staging = path.rstrip("/") + ".next"
    fs_stg, hstg = _hadoop_fs(spark, staging)
    if fs_stg.exists(hstg):
        fs_stg.delete(hstg, True)
    info = _train_and_save(staging)
    # parquet has no atomic dir swap; the delete+rename window is the
    # accepted caveat (an object store would PUT a new prefix and flip
    # a pointer — the jar-free Delta log composes for exactly that).
    # Both steps go through the Hadoop FS so the swap works on whatever
    # filesystem the artifact was written to, not just local disk.
    fs.delete(hpath, True)
    if not fs.rename(hstg, hpath):
        raise IOError(
            f"index swap failed: rename({staging} -> {path}) returned "
            "false on " + fs.getUri().toString()
        )
    fresh = load_ann_index(spark, path)
    after = SIM.ivf_cell_stats(
        corpus, id_col, vec_col,
        cents=fresh["centroids"], imbalance_bound=imbalance_bound, n=n,
    ).collect()[0]
    return {
        "action": "refreshed",
        **report,
        "built_n": n,
        "n_cells": info["n_cells"],
        "n_probe": info["n_probe"],
        "imbalance_after": after["imbalance"],
    }


def default_index_path(tag: str) -> str:
    """Scratch-path convention shared with the reload gate and the
    ingest pipeline's lifecycle hook (:mod:`..plans.llm_pipeline`)."""
    return os.path.join(tempfile.gettempdir(), f"spark_graft_ann_idx_{tag}")
