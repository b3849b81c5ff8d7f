"""Synthetic JHU-style fixtures (FIXTURES.md Part A).

Four simulated days over five countries exercising: both CSV header
epochs, country-name normalization, NULL counters, a decreasing
cumulative counter (clamp), a country missing from population (join
miss), and alert-threshold crossings.

Populations: France 1,000,000 · United States 10,000,000 ·
Russian Federation 5,000,000 · Germany 2,500,000 (chosen so Germany's
deltas sit strictly below alert thresholds — no exact-threshold edges). "Atlantis" reports
cases but has no population row → NULL location_key in fact, dropped by
the mart inner join. "Nullland" has population 0 → filtered by mart
guards.
"""

from __future__ import annotations

import os

DAYS = ("2021-03-01", "2021-03-02", "2021-03-03", "2021-03-04")

# Cumulative counters per (country-as-reported, day):
#   (confirmed, deaths, recovered)
# Germany's confirmed DECREASES on 03-03 (clamp to 0 in mart).
# France spikes on 03-03: +200 cases (≥ all 4 alert thresholds at pop 1M),
# +20 deaths.
SERIES = {
    "US": [(1000, 100, 500), (1100, 101, 550), (1150, 102, 600), (1200, 103, 650)],
    "Russia": [(500, 50, 200), (520, 51, 210), (540, 52, 220), (560, 53, 230)],
    "France": [(300, 30, 100), (340, 31, 120), (540, 51, 140), (560, 52, 160)],
    "Germany": [(800, 20, 300), (900, 21, 350), (850, 22, 400), (950, 23, 450)],
    "Atlantis": [(10, 1, 2), (20, 2, 4), (30, 3, 6), (40, 4, 8)],
}

POPULATION_ROWS = [
    ("United States", "USA", y, 10_000_000) for y in range(2020, 2025)
] + [
    ("Russian Federation", "RUS", y, 5_000_000) for y in range(2020, 2025)
] + [
    ("France", "FRA", y, 1_000_000) for y in range(2020, 2025)
] + [
    ("Germany", "DEU", y, 2_500_000) for y in range(2020, 2025)
] + [
    ("Nullland", "NUL", y, 0) for y in range(2020, 2025)
]


def _early_epoch_csv(day_idx: int) -> str:
    """2020-style 8-column header with aliased names and M/d/yyyy H:mm
    timestamps; one province row per country plus a NULL-counter row."""
    lines = [
        "Province/State,Country/Region,Last Update,Confirmed,Deaths,Recovered,Latitude,Longitude"
    ]
    for country, series in SERIES.items():
        c, d, r = series[day_idx]
        lines.append(f"ProvA,{country},3/{day_idx + 1}/2021 10:00,{c},{d},{r},1.5,2.5")
    # NULL Confirmed exercises sum(coalesce(x,0)).
    lines.append(f"ProvB,US,3/{day_idx + 1}/2021 10:00,,,50,1.5,2.5")
    return "\n".join(lines) + "\n"


def _late_epoch_csv(day_idx: int) -> str:
    """Post-2020-03 14-column header, yyyy-MM-dd HH:mm:ss timestamps."""
    lines = [
        "FIPS,Admin2,Province_State,Country_Region,Last_Update,Lat,Long_,"
        "Confirmed,Deaths,Recovered,Active,Combined_Key,Incident_Rate,Case_Fatality_Ratio"
    ]
    day = DAYS[day_idx]
    for country, series in SERIES.items():
        c, d, r = series[day_idx]
        lines.append(
            f"1,Adm,ProvA,{country},{day} 10:00:00,1.5,2.5,{c},{d},{r},"
            f"{c - d - r},\"ProvA, {country}\",12.5,1.1"
        )
    lines.append(f"2,Adm,ProvB,US,{day} 10:00:00,1.5,2.5,,,50,,\"ProvB, US\",,")
    return "\n".join(lines) + "\n"


def write_day_csvs(tmpdir: str) -> dict[str, str]:
    """Write one CSV per day (day 1 in the early-epoch format, rest late);
    returns {report_date: csv_path}. File names carry the date — the ods
    layer re-derives report_date from the path."""
    paths = {}
    for i, day in enumerate(DAYS):
        body = _early_epoch_csv(i) if i == 0 else _late_epoch_csv(i)
        path = os.path.join(tmpdir, f"{day}.csv")
        with open(path, "w") as f:
            f.write(body)
        paths[day] = path
    return paths


def population_df(spark):
    from covid_data_pipeline_spark.plans.schemas import POPULATION_SCHEMA

    return spark.createDataFrame(POPULATION_ROWS, schema=POPULATION_SCHEMA)
