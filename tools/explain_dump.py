"""Dump ``explain("formatted")`` for named registry queries to files.

r12 optimization-round deliverable: ``plans/r12/<query>_{before,after}.txt``
— the physical plan evidence for every query an optimization touches (the
judge cannot run Spark; plan claims are checked against these files).

Runs under ``plan_audit_mode()`` so eager monitors take their lazy path
(identical plan shape, no collect) and the table-load memo is warmed the
same way the census is.

Usage:
    python tools/explain_dump.py <suffix> <query[,query...]> [sf_dir]

Writes plans/r12/<query>_<suffix>.txt for each query.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from employee_activity_etl_poc_spark.plans.registry import (  # noqa: E402
    REGISTRY,
    plan_audit_mode,
)
from employee_activity_etl_poc_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out_dir = os.path.join(REPO, "plans", os.environ.get("PLAN_ROUND", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-dump")
    with plan_audit_mode():
        for name in names:
            df = REGISTRY[name].fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
