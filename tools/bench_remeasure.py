"""Idle-machine median-of-3 remeasure for flagged BENCH rows.

r9 judge ask #1: when bench.py's ``regressions_vs_prev`` block flags a
headline row (>20% and >0.3 s slower than the prior round at the same
sf) and the plan is unchanged, the round must pin the row with an
idle-machine median-of-3 — exactly the discipline SWEEP_sf100.json's
``remeasured`` entries already follow. This tool runs that remeasure
with the SAME protocol as bench.py (noop sink, three cache-cold passes,
clearCache hygiene, JVM + Python-worker warmup) and MERGES the result
into BENCH_REMEASURED.json at the repo root, which bench.py then ships
verbatim inside the regressions block so the payload is self-contained.

Run it on an IDLE machine (no concurrent pytest/sweep — 32 shared cores
make totals lie) with:

    python tools/bench_remeasure.py <query[,query...]> [sf_dir] [note]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from employee_activity_etl_poc_spark.plans.registry import REGISTRY  # noqa: E402
from employee_activity_etl_poc_spark.session import get_spark  # noqa: E402


def remeasure(names: list[str], sf_dir: str, note: str = "") -> dict:
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench-remeasure")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        fn = REGISTRY[name].fn
        colds: list[float] = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            colds.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
        out[name] = {
            "median": sorted(colds)[1],
            "spread": [min(colds), max(colds)],
            "n": 3,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "note": note,
        }
        print(json.dumps({name: out[name]}))
    spark.stop()
    return out


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    note = sys.argv[3] if len(sys.argv) > 3 else ""
    results = remeasure(names, sf_dir, note)
    path = os.path.join(REPO, "BENCH_REMEASURED.json")
    merged = {}
    if os.path.isfile(path):
        with open(path) as fh:
            merged = json.load(fh)
    merged.update(results)
    with open(path, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(f"merged {len(results)} remeasure(s) into {path}")


if __name__ == "__main__":
    main()
