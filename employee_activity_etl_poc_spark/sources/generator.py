"""S15: seeded synthetic activity generator, Spark-first and oracle-portable.

The reference generates Strava-like activities with Python ``random`` seeded
at 42 (``Strava_Data/strava_like_data.ipynb:16-120``): per-sport speed and
duration ranges (``:21``), per-employee activity counts conditioned on
transport mode (``:91-94``), ~30% comment fill (``:65``), distance =
speed × duration clamped (``:43-70``), contiguous id assignment (``:110``).

We reproduce the *capability* — a deterministic, conditioned activity
corpus — as pure column expressions over ``spark.range(n)``. Randomness is
**md5-derived per row** (not ``rand(seed)``): ``u(salt, id)`` hashes
``salt|id`` and scales the first 8 hex digits to [0,1). That makes every
generated value reproducible in ANY engine with md5 — the DuckDB oracle
re-derives the identical corpus, so the generator itself sits inside the
correctness gate. (Spark's ``rand(seed)`` is partition-dependent and
engine-private — unusable for cross-engine verification and unstable under
repartitioning; the md5 scheme is stable under any partitioning, which is
also the property you want at 100 TB.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Per-sport generation profile: (speed_min_kmh, speed_max_kmh, dur_min_s,
# dur_max_s, has_distance). Mirrors the shape of the reference's SPORT_TYPES
# dict (strava_like_data.ipynb:21) with our own canonical sport names.
GEN_SPORTS: dict[str, tuple[float, float, int, int, bool]] = {
    "Vélo": (15.0, 35.0, 1200, 10800, True),
    "Course à pied": (8.0, 16.0, 900, 7200, True),
    "Marche": (3.0, 7.0, 1800, 14400, True),
    "Natation": (2.0, 5.0, 900, 5400, True),
    "Escalade": (0.0, 0.0, 1800, 10800, False),
    "Tennis": (0.0, 0.0, 1800, 7200, False),
}

GEN_EPOCH_S = 1704067200  # 2024-01-01 00:00:00 UTC
GEN_SPAN_S = 365 * 86400
COMMENT_RATE = 0.30  # strava_like_data.ipynb:65


def uniform(salt: str, id_col: Column) -> Column:
    """Deterministic uniform [0,1) from (salt, id): first 8 md5 hex digits
    of ``salt|id`` scaled by 2^32. Identical formula in the DuckDB oracle:
    ``CAST('0x'||substr(md5(salt||'|'||id),1,8) AS BIGINT)/4294967296.0``."""
    h = F.md5(F.concat(F.lit(salt), F.lit("|"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)


def synthetic_activities(
    spark: SparkSession, n: int, n_employees: int = 161, seed: str = "42"
) -> DataFrame:
    """Generate ``n`` activities with the canonical ACTIVITIES schema.

    Fully distributed (``spark.range`` partitions the id space; every column
    derives from the id alone, so generation scales linearly and repartition
    never changes values)."""
    from .readers import _ensure_session_conf

    _ensure_session_conf(spark)  # UTC: µs-epoch -> formatted strings
    ids = spark.range(n)  # id: 0..n-1
    rid = F.col("id")

    def u(salt: str) -> Column:
        return uniform(f"{seed}_{salt}", rid)

    names = list(GEN_SPORTS)
    sport_idx = F.floor(u("sport") * len(names)).cast("int")
    sport = F.element_at(F.array(*[F.lit(s) for s in names]), sport_idx + 1)

    def per_sport(vals: list[float | int]) -> Column:
        return F.element_at(F.array(*[F.lit(float(v)) for v in vals]), sport_idx + 1)

    smin = per_sport([GEN_SPORTS[s][0] for s in names])
    smax = per_sport([GEN_SPORTS[s][1] for s in names])
    dmin = per_sport([GEN_SPORTS[s][2] for s in names])
    dmax = per_sport([GEN_SPORTS[s][3] for s in names])
    has_dist = per_sport([1.0 if GEN_SPORTS[s][4] else 0.0 for s in names])

    duration_s = (dmin + F.floor(u("dur") * (dmax - dmin))).cast("long")
    speed_kmh = smin + u("speed") * (smax - smin)
    start_s = F.lit(GEN_EPOCH_S) + F.floor(u("start") * GEN_SPAN_S).cast("long")

    return ids.select(
        (rid + 1).alias("activity_id"),
        (F.floor(u("emp") * n_employees).cast("long") + 1).alias("employee_id"),
        F.timestamp_micros(start_s * 1_000_000).alias("start_ts"),
        sport.alias("sport_type"),
        F.when(
            has_dist > 0.0,
            F.floor(speed_kmh * duration_s.cast("double") / 3.6).cast("long"),
        ).alias("distance_m"),
        F.timestamp_micros((start_s + duration_s) * 1_000_000).alias("end_ts"),
        F.when(
            u("cmt") < COMMENT_RATE,
            F.concat(F.lit("Sortie "), sport, F.lit(" #"), (rid + 1).cast("string")),
        ).alias("comment"),
    )


def generator_oracle_sql(n: int, n_employees: int = 161, seed: str = "42") -> str:
    """DuckDB SQL computing the identical corpus (for oracle queries)."""
    names = list(GEN_SPORTS)
    name_list = ", ".join(f"'{s}'" for s in names)

    def arr(vals: list[float]) -> str:
        return "[" + ", ".join(str(float(v)) for v in vals) + "]"

    return f"""
      WITH ids AS (SELECT range AS id FROM range({n})),
      u AS (
        SELECT id,
          CAST('0x' || substr(md5('{seed}_sport|' || id::VARCHAR), 1, 8) AS BIGINT) / 4294967296.0 AS u_sport,
          CAST('0x' || substr(md5('{seed}_emp|'   || id::VARCHAR), 1, 8) AS BIGINT) / 4294967296.0 AS u_emp,
          CAST('0x' || substr(md5('{seed}_dur|'   || id::VARCHAR), 1, 8) AS BIGINT) / 4294967296.0 AS u_dur,
          CAST('0x' || substr(md5('{seed}_speed|' || id::VARCHAR), 1, 8) AS BIGINT) / 4294967296.0 AS u_speed,
          CAST('0x' || substr(md5('{seed}_start|' || id::VARCHAR), 1, 8) AS BIGINT) / 4294967296.0 AS u_start,
          CAST('0x' || substr(md5('{seed}_cmt|'   || id::VARCHAR), 1, 8) AS BIGINT) / 4294967296.0 AS u_cmt
        FROM ids
      ),
      g AS (
        SELECT id,
          CAST(floor(u_sport * {len(names)}) AS INT) + 1 AS si,
          u_emp, u_dur, u_speed, u_start, u_cmt
        FROM u
      ),
      act AS (
        SELECT id + 1 AS activity_id,
          CAST(floor(u_emp * {n_employees}) AS BIGINT) + 1 AS employee_id,
          ([{name_list}])[si] AS sport_type,
          CAST(({arr([GEN_SPORTS[s][2] for s in names])})[si]
               + floor(u_dur * (({arr([GEN_SPORTS[s][3] for s in names])})[si]
                                - ({arr([GEN_SPORTS[s][2] for s in names])})[si])) AS BIGINT) AS duration_s,
          ({arr([GEN_SPORTS[s][0] for s in names])})[si]
            + u_speed * (({arr([GEN_SPORTS[s][1] for s in names])})[si]
                         - ({arr([GEN_SPORTS[s][0] for s in names])})[si]) AS speed_kmh,
          {GEN_EPOCH_S} + CAST(floor(u_start * {GEN_SPAN_S}) AS BIGINT) AS start_s,
          ({arr([1.0 if GEN_SPORTS[s][4] else 0.0 for s in names])})[si] AS has_dist,
          u_cmt
        FROM g
      )
      SELECT activity_id, employee_id,
             make_timestamp(start_s * 1000000) AS start_ts,
             sport_type,
             CASE WHEN has_dist > 0.0
                  THEN CAST(floor(speed_kmh * duration_s / 3.6) AS BIGINT) END AS distance_m,
             make_timestamp((start_s + duration_s) * 1000000) AS end_ts,
             CASE WHEN u_cmt < {COMMENT_RATE}
                  THEN 'Sortie ' || sport_type || ' #' || activity_id::VARCHAR END AS comment
      FROM act
    """


TRANSPORT_MODES = (  # the 4 real values, google_map/gmap_commute.py:185-190
    "Transports en commun",
    "véhicule thermique/électrique",
    "Marche/running",
    "Vélo/Trottinette/Autres",
)
BUSINESS_UNITS = ("Sales", "Engineering", "Operations")


def synthetic_employees(
    spark: SparkSession, n: int = 161, seed: str = "42"
) -> DataFrame:
    """HR-dim generator (161 employees like DonneesRH.xlsx), same md5
    scheme — the DuckDB oracle re-derives it, see
    :func:`employees_oracle_sql`. One partition: it's a broadcast-sized dim,
    and fanning 161 rows across 32 tasks just pays 32 task/Python-worker
    startups in every downstream mapInPandas."""
    from .readers import _ensure_session_conf

    _ensure_session_conf(spark)
    ids = spark.range(0, n, 1, numPartitions=1)
    rid = F.col("id")

    def u(salt: str) -> Column:
        return uniform(f"{seed}_hr_{salt}", rid)

    mode_idx = F.floor(u("mode") * len(TRANSPORT_MODES)).cast("int")
    bu_idx = F.floor(u("bu") * len(BUSINESS_UNITS)).cast("int")
    address = F.concat(
        (F.floor(u("addr") * 999).cast("long") + 1).cast("string"),
        F.lit(" rue de la Paix, Ville "),
        F.floor(u("city") * 50).cast("long").cast("string"),
    )
    return ids.select(
        (rid + 1).alias("employee_id"),
        address.alias("home_address"),
        F.element_at(
            F.array(*[F.lit(m) for m in TRANSPORT_MODES]), mode_idx + 1
        ).alias("transport_mode"),
        F.element_at(
            F.array(*[F.lit(b) for b in BUSINESS_UNITS]), bu_idx + 1
        ).alias("bu"),
        F.round(F.lit(25000.0) + u("sal") * 50000.0, 2).alias("salary"),
    )


def employees_oracle_sql(n: int = 161, seed: str = "42") -> str:
    modes = ", ".join(f"'{m}'" for m in TRANSPORT_MODES)
    bus = ", ".join(f"'{b}'" for b in BUSINESS_UNITS)
    return f"""
      SELECT range + 1 AS employee_id,
        (CAST(floor(CAST('0x' || substr(md5('{seed}_hr_addr|' || range::VARCHAR), 1, 8) AS BIGINT)
                    / 4294967296.0 * 999) AS BIGINT) + 1)::VARCHAR
          || ' rue de la Paix, Ville '
          || CAST(floor(CAST('0x' || substr(md5('{seed}_hr_city|' || range::VARCHAR), 1, 8) AS BIGINT)
                    / 4294967296.0 * 50) AS BIGINT)::VARCHAR AS home_address,
        ([{modes}])[CAST(floor(CAST('0x' || substr(md5('{seed}_hr_mode|' || range::VARCHAR), 1, 8) AS BIGINT)
                    / 4294967296.0 * {len(TRANSPORT_MODES)}) AS INT) + 1] AS transport_mode,
        ([{bus}])[CAST(floor(CAST('0x' || substr(md5('{seed}_hr_bu|' || range::VARCHAR), 1, 8) AS BIGINT)
                    / 4294967296.0 * {len(BUSINESS_UNITS)}) AS INT) + 1] AS bu,
        round(25000.0 + CAST('0x' || substr(md5('{seed}_hr_sal|' || range::VARCHAR), 1, 8) AS BIGINT)
                    / 4294967296.0 * 50000.0, 2) AS salary
      FROM range({n})
    """


def to_cdc_json(activities: DataFrame, op: Column | None = None) -> DataFrame:
    """Wrap activities as Debezium-style JSON envelopes (one ``value`` string
    column), the wire shape the bronze consumer reads
    (``bronze/redPandaToDeltaLake.py:72-89``). Timestamps become int64
    epoch-µs exactly as Debezium emits them."""
    payload = F.struct(
        (F.lit("c") if op is None else op).alias("op"),
        F.lit(None).cast("string").alias("before"),
        F.struct(
            F.col("activity_id"),
            F.col("employee_id"),
            F.unix_micros("start_ts").alias("start_us"),
            F.col("sport_type"),
            F.col("distance_m"),
            F.unix_micros("end_ts").alias("end_us"),
            F.col("comment"),
        ).alias("after"),
    ).alias("payload")
    return activities.select(F.to_json(F.struct(payload)).alias("value"))
