"""Shared fixtures: one session-scoped SparkSession (small local mode —
tests verify semantics; scale behavior is bench.py's job) and the tiny
station dim + raw-line builders from FIXTURES.md §1-§3."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from alaska_etl_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def locations(spark):
    return spark.createDataFrame(
        [
            ("Fairbanks_11_NE", "26494", -147.5, 64.9),
            ("Utqiagvik", "27516", -156.6, 71.3),
            ("Sitka_1_NE", "25379", -135.3, 57.1),
        ],
        "station_location string, wbanno string, longitude double, latitude double",
    )


def uscrn_line(
    wbanno="26494",
    utc_date=20230115,
    utc_time=1200,
    lst_date=20230115,
    lst_time=300,
    crx_vn="2.623",
    lon=-147.5,
    lat=64.9,
    t_calc=-10.0,
    t_hr_avg=-11.5,
    t_max=-9.0,
    t_min=-12.0,
    p_calc=0.0,
    solarad=120.0,
    sur_temp=-15.0,
    rh=70.0,
):
    """One raw 38-field USCRN hourly line (FIXTURES §1 layout)."""
    fields = [
        wbanno, utc_date, utc_time, lst_date, lst_time, crx_vn, lon, lat,
        t_calc, t_hr_avg, t_max, t_min, p_calc,
        solarad, 0, solarad, 0, solarad, 0,          # solarad + max/min with flags
        "R", sur_temp, 0, sur_temp, 0, sur_temp, 0,  # sur_temp type/max/min + flags
        rh, 0,                                        # rh + flag
        -99.0, -99.0, -99.0, -99.0, -99.0,            # soil moisture 5..100
        -9999.0, -9999.0, -9999.0, -9999.0, -9999.0,  # soil temp 5..100
    ]
    assert len(fields) == 38
    return " ".join(str(f) for f in fields)


def wind_line(wbanno="26494", utc_date=20230115, utc_time=1205, wind=3.4, flag="0"):
    """Subhourly wind line: keys at positions 0-4, wind fields last."""
    lst_date, lst_time = utc_date, (utc_time + 1500) % 2400  # value irrelevant to tests
    return f"{wbanno} {utc_date} {utc_time} {lst_date} {lst_time} 2.623 -147.5 64.9 1.2 {wind} {flag}"
