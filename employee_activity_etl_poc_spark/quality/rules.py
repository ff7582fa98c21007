"""Data-quality rule engine — SURVEY §2.9 `validate_activities` rebuilt.

The reference validates activities with three plain-pandas rules returning
dicts of offending IDs (``sport_benefits.py:21-60``): future start dates,
negative distances on distance sports, and per-sport distance-range
violations, plus ID-uniqueness / non-null checks in ``test_real_data.py:6-18``
and a referential-integrity set difference in
``find_unique_employee.ipynb:88-112``.

Here a rule is (name, severity, predicate Column); ``run_rules`` evaluates
ALL rules in one distributed pass and returns a single violations DataFrame
``(rule, severity, id)`` — no driver-side loops, and one scan regardless of
rule count.

Spec decision (SURVEY §5 "known-red test"): a negative distance on a
distance sport trips BOTH `negative_distance` AND `distance_range` — the
reference's own test expected otherwise and failed; we pin the overlap
semantics deliberately.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Per-sport plausible distance ranges in meters, from the reference's
# validation config (``sport_benefits.py:9-19``). Data, not code: these are
# the business thresholds our engine must enforce.
SPORT_DISTANCE_RANGES: dict[str, tuple[int, int]] = {
    "Natation": (500, 3000),
    "Course à pied": (1000, 20000),
    "Vélo": (5000, 50000),
    "Marche": (1000, 15000),
}

HARD = "hard"  # fail the pipeline (test_real_data.py:25-28)
SOFT = "soft"  # report only (the waived range rule, test_real_data.py:29)


@dataclass(frozen=True)
class Rule:
    name: str
    severity: str
    predicate: Column  # true => row violates


def standard_activity_rules(
    id_col: str = "activity_id",
    start_col: str = "start_ts",
    sport_col: str = "sport_type",
    distance_col: str = "distance_m",
    now: Column | None = None,
) -> list[Rule]:
    """The three reference rules (P5, P6, P7) as predicate columns.

    ``now`` is injectable for deterministic tests (the reference compared
    against wall-clock ``pd.Timestamp.now()``, ``sport_benefits.py:36``).
    """
    now = now if now is not None else F.current_timestamp()
    distance_sports = list(SPORT_DISTANCE_RANGES)
    d = F.coalesce(F.col(distance_col).cast("double"), F.lit(-1.0))

    # P7: per-sport range check as a chained expression over the config map;
    # at dim scale this is equivalently a broadcast join against a range dim.
    range_violation = F.lit(False)
    for sport, (lo, hi) in SPORT_DISTANCE_RANGES.items():
        range_violation = F.when(
            (F.col(sport_col) == sport) & ((d < lo) | (d > hi)), F.lit(True)
        ).otherwise(range_violation)

    return [
        Rule("future_start_date", HARD, F.col(start_col) > now),
        Rule(
            "negative_distance",
            HARD,
            F.col(sport_col).isin(distance_sports) & (d < 0),
        ),
        Rule("distance_range", SOFT, range_violation),
        Rule("null_id", HARD, F.col(id_col).isNull()),
    ]


def run_rules(df: DataFrame, rules: list[Rule], id_col: str) -> DataFrame:
    """Evaluate all rules in one pass -> ``(rule, severity, id)`` rows.

    Implemented as explode-of-structs so the input is scanned once; Catalyst
    prunes to only the columns the predicates reference.
    """
    checks = F.array(
        *[
            F.when(
                r.predicate,
                F.struct(F.lit(r.name).alias("rule"), F.lit(r.severity).alias("severity")),
            )
            for r in rules
        ]
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(checks).alias("v"))
        .where(F.col("v").isNotNull())
        .select(F.col("v.rule").alias("rule"), F.col("v.severity").alias("severity"), "id")
    )


def duplicate_ids(df: DataFrame, id_col: str) -> DataFrame:
    """A5: IDs appearing more than once (``test_real_data.py:17``)."""
    return (
        df.groupBy(F.col(id_col).alias("id"))
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
    )


def referential_orphans(fact: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """J3: fact keys absent from the dimension — the anti-join form of the
    reference's Python set difference (``find_unique_employee.ipynb:88-112``).
    """
    return fact.select(key).distinct().join(dim.select(key).distinct(), key, "left_anti")
