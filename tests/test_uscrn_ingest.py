"""USCRN hourly ingest: S4/S5 parse + filter, F2 sentinel/convert,
F3 datetime compose, P2 soil drop, J1 dim join, A5 deterministic dedup
(FIXTURES §5 invariants 1, 4, 6)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from alaska_etl_spark.sources.uscrn import parse_uscrn_lines
from tests.conftest import uscrn_line


def _lines(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "value string")


def test_parse_basic_row(spark, locations):
    df = parse_uscrn_lines(_lines(spark, [uscrn_line()]), locations)
    row = df.collect()[0]
    assert row.station_location == "Fairbanks_11_NE"
    assert row.wbanno == "26494"
    assert row.crx_vn == "2.623"
    assert row.utc_datetime == dt.datetime(2023, 1, 15, 12, 0)
    assert row.lst_datetime == dt.datetime(2023, 1, 15, 3, 0)
    # -10 C -> 14 F (intended semantics; reference never assigned, SURVEY §7.4)
    assert abs(row.t_calc - 14.0) < 1e-9
    assert abs(row.rh_hr_avg - 70.0) < 1e-9


def test_soil_columns_dropped(spark, locations):
    df = parse_uscrn_lines(_lines(spark, [uscrn_line()]), locations)
    assert not [c for c in df.columns if "soil" in c]
    assert len(df.columns) == 27  # 28-col table minus the audit column


def test_prefix_filter_drops_unknown_wbanno(spark, locations):
    rows = [uscrn_line(), uscrn_line(wbanno="99999")]
    df = parse_uscrn_lines(_lines(spark, rows), locations)
    assert df.count() == 1


def test_malformed_line_dropped(spark, locations):
    rows = [uscrn_line(), "26494 20230115 1200 truncated"]
    df = parse_uscrn_lines(_lines(spark, rows), locations)
    assert df.count() == 1


def test_sentinel_never_wins_max(spark, locations):
    """FIXTURES §5 invariant 1: a -9999 must not survive conversion nor
    win a max."""
    rows = [
        uscrn_line(utc_time=1100, t_max=-9999.0),
        uscrn_line(utc_time=1200, t_max=-5.0),
    ]
    df = parse_uscrn_lines(_lines(spark, rows), locations)
    vals = {r.utc_datetime.hour: r.t_max for r in df.collect()}
    assert vals[11] is None
    mx = df.agg(F.max("t_max")).collect()[0][0]
    assert abs(mx - (-5.0 * 9 / 5 + 32)) < 1e-9


def test_convert_flag_off_keeps_celsius(spark, locations):
    df = parse_uscrn_lines(_lines(spark, [uscrn_line(t_calc=10.0)]), locations, convert_to_f=False)
    assert abs(df.collect()[0].t_calc - 10.0) < 1e-9


def test_dedup_deterministic(spark, locations):
    """FIXTURES §5 invariant 4: one row per (wbanno, utc_datetime),
    lowest (lst_datetime, crx_vn) kept regardless of input order."""
    a = uscrn_line(crx_vn="2.623", t_calc=1.0)
    b = uscrn_line(crx_vn="1.001", t_calc=2.0)
    for rows in ([a, b], [b, a]):
        df = parse_uscrn_lines(_lines(spark, rows), locations)
        out = df.collect()
        assert len(out) == 1
        assert out[0].crx_vn == "1.001"
