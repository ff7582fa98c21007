"""Persistable classifier-model artifacts — :mod:`.index_store`'s
contract applied to the learned quality filter: a model trained once
(``textops.quality_classifier``) must score later sessions and grown
corpora under the EXACT weights it was trained with, not a silent
retrain. Weights live on the 1e-6 integer grid (bigint grid units), so
the parquet round-trip is bit-exact by construction — no float
tolerance anywhere in the lifecycle.

Format: ONE parquet directory, rows ``(b, w6)`` for the weight vector
plus a ``b = -1`` row carrying the bias (the same sentinel bucket the
training pass uses for the bias gradient) and a ``b = -2`` row whose
``w6`` is the feature-space size — enough to rebuild the dense literal
vector and to LOUDLY reject scoring with a mismatched bucket count
(hash family drift = silently wrong features, the index_store plane
lesson).

Reference parity: the reference trains/persists no models; this is
part of the LLM-pipeline surface the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..localrel import local_df

__all__ = ["save_classifier", "load_classifier"]


def save_classifier(
    spark: SparkSession, path: str, w6: list[int], b6: int
) -> None:
    """Write the grid-unit weight vector + bias as a parquet artifact
    (one slice — driver-sized by construction: B+2 bigint rows)."""
    rows = [(-2, len(w6)), (-1, int(b6))]
    rows += [(i, int(v)) for i, v in enumerate(w6)]
    local_df(spark, rows, "b long, w6 long").write.mode("overwrite").parquet(
        path
    )


def load_classifier(spark: SparkSession, path: str) -> tuple[list[int], int]:
    """(w6, b6) exactly as saved. Raises on a truncated/foreign artifact
    (missing sentinel rows or a weight count that disagrees with the
    recorded feature-space size)."""
    rows = {r["b"]: r["w6"] for r in spark.read.parquet(path).collect()}
    if -2 not in rows or -1 not in rows:
        raise ValueError(
            f"classifier artifact at {path} is missing its sentinel rows "
            "(not a save_classifier artifact, or a partial write)"
        )
    n = int(rows[-2])
    w6 = [int(rows.get(i, 0)) for i in range(n)]
    n_present = sum(1 for b in rows if b >= 0)
    if n_present != n:
        raise ValueError(
            f"classifier artifact at {path} records {n} buckets but "
            f"holds {n_present} weight rows — truncated or mixed artifact"
        )
    return w6, int(rows[-1])
