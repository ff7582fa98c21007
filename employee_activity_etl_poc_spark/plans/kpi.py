"""Business-KPI aggregations — the Power BI DAX measures re-homed as
DataFrame plans (SURVEY §2.4 A7-A9, §2.3 J6; ``FormulaePowerBI.txt:1-47``).

The DAX originals are row-context measures over the gold tables; here each
is a shuffle-once groupBy with map-side partial aggregation, and the scalar
"correlated" salary lookup (J6) is decorrelated into a plain equi-join.

Business constants (from ``FormulaePowerBI.txt``):
- an employee "qualifies" for wellness days when they logged more than
  ``QUALIFY_MIN_ACTIVITIES`` activities (line 21-23);
- each qualifying employee earns ``WELLNESS_DAYS_AWARDED`` days (line 30-33);
- salary-equivalent uses ``WORKDAYS_PER_YEAR`` = 251 (line 36-40);
- the commute bonus is ``PRIME_RATE`` = 5% of gross salary (line 43-47).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUALIFY_MIN_ACTIVITIES = 5
WELLNESS_DAYS_AWARDED = 5
WORKDAYS_PER_YEAR = 251
PRIME_RATE = 0.05


def summarize_per_entity(
    df: DataFrame, group_cols: list[str], count_alias: str = "total_line_count"
) -> DataFrame:
    """A7: ``SUMMARIZE(..., COUNTROWS(...))`` — activity count per
    entity×category (``FormulaePowerBI.txt:2-8``)."""
    return df.groupBy(*group_cols).agg(F.count("*").alias(count_alias))


def with_qualification_flags(
    summary: DataFrame,
    qualify_commute_pred: Column,
    count_col: str = "total_line_count",
) -> DataFrame:
    """A8: QualifySport / QualifyCommute flags over the per-entity summary
    (``FormulaePowerBI.txt:21-27``)."""
    return summary.withColumn(
        "qualify_sport", F.col(count_col) > QUALIFY_MIN_ACTIVITIES
    ).withColumn("qualify_commute", qualify_commute_pred)


def wellness_totals(qualified: DataFrame, salary_col: str = "salary") -> DataFrame:
    """A9: the three KPI rollups in one aggregation pass
    (``FormulaePowerBI.txt:30-47``).

    - total_wellness_days  = Σ qualify_sport ? 5 : 0
    - total_equiv_salary   = Σ salary × 5/251 over qualifying employees
    - total_prime_sportive = Σ salary × 5% over active-commute employees
    """
    qs, qc = F.col("qualify_sport"), F.col("qualify_commute")
    sal = F.col(salary_col)
    return qualified.agg(
        F.sum(F.when(qs, F.lit(WELLNESS_DAYS_AWARDED)).otherwise(0))
        .cast("long")
        .alias("total_wellness_days"),
        F.round(
            F.sum(
                F.when(qs, sal * WELLNESS_DAYS_AWARDED / WORKDAYS_PER_YEAR).otherwise(0.0)
            ),
            2,
        ).alias("total_equiv_salary"),
        F.round(F.sum(F.when(qc, sal * PRIME_RATE).otherwise(0.0)), 2).alias(
            "total_prime_sportive"
        ),
    )
