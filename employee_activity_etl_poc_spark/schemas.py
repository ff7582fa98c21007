"""Canonical schemas and the FR->EN normalization map (SURVEY §1.2-1.3).

The reference's column names drifted across three generations (accent-free
``ID_salarie`` in the generator/DB — ``Strava_Data/strava_like_data.ipynb:105-114``;
accented ``ID_salarié``/``Type``/``Distance`` in the validator —
``sport_benefits.py:30-44``; space-separated ``ID salarié`` in the XLSX dims —
``gold/bronzeToGold.py:117``). We canonicalize to one snake_case English
schema at ingest and keep the alias map as data, so legacy inputs in any of
the three dialects normalize to the same DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Canonical domain schemas
# ---------------------------------------------------------------------------

# employee_activities: Postgres DDL Strava_Data/import_to_postgre.ipynb:60-68,
# Spark StructType prototype bronze/consume_data2.py:13-21.
ACTIVITIES = T.StructType(
    [
        T.StructField("activity_id", T.LongType(), False),
        T.StructField("employee_id", T.LongType(), False),
        T.StructField("start_ts", T.TimestampType(), False),
        T.StructField("sport_type", T.StringType(), False),
        T.StructField("distance_m", T.LongType(), True),
        T.StructField("end_ts", T.TimestampType(), False),
        T.StructField("comment", T.StringType(), True),
    ]
)

# Bronze adds an ingest timestamp (bronze/redPandaToDeltaLake.py:86).
BRONZE_ACTIVITIES = T.StructType(
    ACTIVITIES.fields + [T.StructField("processing_ts", T.TimestampType(), False)]
)

# HR dimension (DonneesRH.xlsx, 161 rows): find_unique_employee.ipynb:260,
# gold/2test1.py:123-138, google_map/gmap_commute.py:185-210.
EMPLOYEES = T.StructType(
    [
        T.StructField("employee_id", T.LongType(), False),
        T.StructField("last_name", T.StringType(), True),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("home_address", T.StringType(), True),
        T.StructField("transport_mode", T.StringType(), True),
        T.StructField("birth_date", T.DateType(), True),
        T.StructField("bu", T.StringType(), True),
        T.StructField("hire_date", T.DateType(), True),
        T.StructField("salary", T.DoubleType(), True),
        T.StructField("contract_type", T.StringType(), True),
        T.StructField("vacation_days", T.IntegerType(), True),
    ]
)

# Sports declaration dimension (DonneesSportive.xlsx): gold/bronzeToGold.py:104,217.
SPORTS_DECLARATION = T.StructType(
    [
        T.StructField("employee_id", T.LongType(), False),
        T.StructField("practices_sport", T.StringType(), True),
    ]
)

# Debezium CDC envelope over Kafka (bronze/redPandaToDeltaLake.py:72-89,
# slack_bot/slack_notifier.py:110-122): payload.op / payload.after with
# timestamps as int64 epoch-microseconds.
CDC_AFTER = T.StructType(
    [
        T.StructField("activity_id", T.LongType(), True),
        T.StructField("employee_id", T.LongType(), True),
        T.StructField("start_us", T.LongType(), True),
        T.StructField("sport_type", T.StringType(), True),
        T.StructField("distance_m", T.LongType(), True),
        T.StructField("end_us", T.LongType(), True),
        T.StructField("comment", T.StringType(), True),
    ]
)

CDC_ENVELOPE = T.StructType(
    [
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField("op", T.StringType(), True),
                    T.StructField("before", CDC_AFTER, True),
                    T.StructField("after", CDC_AFTER, True),
                ]
            ),
            True,
        )
    ]
)

# ---------------------------------------------------------------------------
# Legacy-name alias maps (any dialect -> canonical)
# ---------------------------------------------------------------------------

ACTIVITY_ALIASES: dict[str, str] = {
    # generator / Postgres dialect (strava_like_data.ipynb:105-114)
    "ID": "activity_id",
    "ID_salarie": "employee_id",
    "Date_de_debut": "start_ts",
    "Sport_type": "sport_type",
    "Distance_m": "distance_m",
    "Date_de_fin": "end_ts",
    "Commentaire": "comment",
    # validator dialect (sport_benefits.py:30-44)
    "ID_salarié": "employee_id",
    "Date_de_début": "start_ts",
    "Type": "sport_type",
    "Distance": "distance_m",
    # bronze metadata (redPandaToDeltaLake.py:86)
    "processing_timestamp": "processing_ts",
}

EMPLOYEE_ALIASES: dict[str, str] = {
    # XLSX dialect (gold/bronzeToGold.py:117, gmap_commute.py:193-210)
    "ID salarié": "employee_id",
    "Nom": "last_name",
    "Prénom": "first_name",
    "Adresse du domicile": "home_address",
    "Moyen de déplacement": "transport_mode",
    "Date de naissance": "birth_date",
    "BU": "bu",
    "Date d'embauche": "hire_date",
    "Salaire brut": "salary",
    "Nombre de jours de CP": "vacation_days",
}


def canonicalize(df: DataFrame, aliases: dict[str, str]) -> DataFrame:
    """Rename legacy columns to canonical snake_case (operator F10).

    Mirrors the rename cell ``find_unique_employee.ipynb`` cell ``b0cab438``;
    unknown columns pass through untouched so schema evolution is additive.
    """
    present = {old: new for old, new in aliases.items() if old in df.columns}
    return df.withColumnsRenamed(present)


# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
