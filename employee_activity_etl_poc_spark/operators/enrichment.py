"""External-service enrichment (SURVEY §2.9 / §7 step 8): the Google-Maps
commute pipeline rebuilt as a ``mapInPandas`` pass over an injected client.

Reference behavior (``google_map/gmap_commute.py``): for each employee,
geocode the home address and fetch directions to the office for their
transport mode under two scenarios (typical + rush hour), with per-mode
dispatch (``:185-190``), failure rows marked ``Commute_Success=False``
(``:196-233``), an in-memory geocode cache (``:25-35``) and a 2-3 s
rate-limit sleep per employee (``:316``).

Spark-first decomposition:

- the **API call** is the only thing that needs Python: a ``mapInPandas``
  pass whose batches amortize Arrow transfer; the client is injected so
  tests/oracles use :class:`FakeCommuteClient` and production passes a real
  HTTP client (never called in tests — SURVEY §7 risk register).
- the API returns raw *text* fields exactly as Google does ("24.6 km",
  "1 hours 36 mins"); all parsing/derivation (F16 quantity parsing, F15
  hh:mm:ss, F7/F8 flags) happens AFTER, as column expressions — the Python
  boundary stays minimal and the rest of the plan is codegen'd.
- the memo-cache becomes a persisted enrichment *table* keyed by
  (address, mode): enrich once, join everywhere — at 100 TB you never
  re-call an API per row.
- rate limiting: ``df.coalesce(n_workers)`` bounds concurrent clients;
  the client itself throttles. (The fake needs no throttle.)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Protocol

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import scalars as S

# transport_mode (HR dim) -> directions API mode, gmap_commute.py:185-190
TRANSPORT_TO_API_MODE = {
    "Transports en commun": "transit",
    "véhicule thermique/électrique": "driving",
    "Marche/running": "walking",
    "Vélo/Trottinette/Autres": "bicycling",
}

OFFICE_ADDRESS = "1 place du Travail, Paris"

COMMUTE_RESULT_SCHEMA = (
    "employee_id long, api_mode string, "
    "distance_text_typical string, duration_text_typical string, "
    "distance_text_rush string, duration_text_rush string, "
    "commute_success boolean"
)


class CommuteClient(Protocol):
    """Directions client interface: returns (distance_text, duration_text)
    or None on failure (unroutable address, quota...)."""

    def directions(
        self, origin: str, destination: str, mode: str, scenario: str
    ) -> tuple[str, str] | None: ...


class FakeCommuteClient:
    """Deterministic stand-in: every value derives from md5 of the request
    key — reproducible across engines (the DuckDB oracle re-derives it, see
    ``plans/etl_queries.py::commute_enrichment``) and across partitionings.

    Speeds (km/h) per mode; rush hour slows driving/transit by 1/1.4.
    ~1 in 20 origins fails entirely (the reference's failed-geocode rows).
    """

    SPEEDS = {"transit": 25.0, "driving": 40.0, "walking": 4.5, "bicycling": 15.0}
    RUSH_SLOWDOWN = {"driving": 1.4, "transit": 1.4}

    @staticmethod
    def _u32(key: str) -> int:
        return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)

    def directions(
        self, origin: str, destination: str, mode: str, scenario: str
    ) -> tuple[str, str] | None:
        if self._u32(f"gmapfail|{origin}") % 20 == 0:
            return None
        u = self._u32(f"gmap|{origin}|{destination}|{mode}") / 4294967296.0
        km = float(int(u * 400 + 5)) / 10.0  # 0.5 .. 40.4, one decimal
        mins = km / self.SPEEDS[mode] * 60.0
        if scenario == "rush_hour":
            mins *= self.RUSH_SLOWDOWN.get(mode, 1.0)
        mins_i = int(mins)
        if mins_i >= 60:
            duration = f"{mins_i // 60} hours {mins_i % 60} mins"
        else:
            duration = f"{mins_i} mins"
        return (f"{km:.1f} km", duration)


def fetch_commutes(
    employees: DataFrame,
    client_factory,
    office: str = OFFICE_ADDRESS,
    id_col: str = "employee_id",
    address_col: str = "home_address",
    transport_col: str = "transport_mode",
) -> DataFrame:
    """The mapInPandas API pass: one row per employee with RAW text results
    for both scenarios. ``client_factory`` is called once per Python worker
    (per partition iterator), not per row — connection reuse, like the
    reference's single client instance (``gmap_commute.py:20-23``)."""

    def call(client, origin, mode, scenario):
        """A real HTTP client THROWS (quota, timeout, unroutable); a failed
        call must become a failure ROW, not a dead task — one poisoned
        address would otherwise kill the partition and, after retries, the
        job (the reference had per-row try/except for the same reason,
        gmap_commute.py:196-233)."""
        if mode is None:
            return None
        try:
            return client.directions(origin, office, mode, scenario)
        except Exception:
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                rd = row._asdict()
                mode = TRANSPORT_TO_API_MODE.get(rd[transport_col])
                typ = call(client, rd[address_col], mode, "typical")
                rush = call(client, rd[address_col], mode, "rush_hour")
                out.append(
                    {
                        "employee_id": rd[id_col],
                        "api_mode": mode,
                        "distance_text_typical": typ[0] if typ else None,
                        "duration_text_typical": typ[1] if typ else None,
                        "distance_text_rush": rush[0] if rush else None,
                        "duration_text_rush": rush[1] if rush else None,
                        "commute_success": typ is not None and rush is not None,
                    }
                )
            yield pd.DataFrame(out)

    cols = [id_col, address_col, transport_col]
    return employees.select(*cols).mapInPandas(run, schema=COMMUTE_RESULT_SCHEMA)


def derive_commute_metrics(raw: DataFrame) -> DataFrame:
    """Column-expression post-pass (F15/F16): parse the API text into km and
    hh:mm:ss per scenario — the ``employee_commutes`` output shape
    (``gmap_commute.py:319-323``)."""
    out = raw
    for scenario in ("typical", "rush"):
        dist = F.col(f"distance_text_{scenario}")
        dur = F.col(f"duration_text_{scenario}")
        out = out.withColumns(
            {
                f"distance_km_{scenario}": F.round(S.parse_distance_km(dist), 4),
                f"duration_hhmmss_{scenario}": F.when(
                    dur.isNotNull(), S.hhmmss(S.parse_duration_seconds(dur))
                ),
            }
        )
    return out
