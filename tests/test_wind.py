"""Wind subhourly ingest: S6 watermark, P6 QC routing, A1 hourly mean
(FIXTURES §5 invariant 2)."""

from __future__ import annotations

import datetime as dt

from alaska_etl_spark.sources.wind import hourly_wind_avg, parse_wind_lines, split_bad_rows
from tests.conftest import wind_line


def _lines(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "value string")


def test_bad_row_routing(spark, locations):
    rows = [
        wind_line(utc_time=1205, wind=3.0, flag="0"),
        wind_line(utc_time=1210, wind=-1.0, flag="0"),  # negative speed
        wind_line(utc_time=1215, wind=4.0, flag="3"),   # QC fail
    ]
    parsed = parse_wind_lines(_lines(spark, rows), locations)
    good, bad = split_bad_rows(parsed)
    assert good.count() == 1
    assert bad.count() == 2


def test_watermark_filter(spark, locations):
    rows = [wind_line(utc_time=1155), wind_line(utc_time=1205)]
    parsed = parse_wind_lines(
        _lines(spark, rows), locations, watermark=dt.datetime(2023, 1, 15, 12, 0)
    )
    out = parsed.collect()
    assert len(out) == 1
    assert out[0].utc_datetime == dt.datetime(2023, 1, 15, 12, 5)


def test_hourly_mean_excludes_bad_first(spark, locations):
    """Invariant 2: the mean is over kept readings only, rounded 3."""
    rows = [
        wind_line(utc_time=1205, wind=2.0),
        wind_line(utc_time=1210, wind=3.0),
        wind_line(utc_time=1215, wind=4.0),
        wind_line(utc_time=1220, wind=100.0, flag="3"),  # excluded
        wind_line(utc_time=1305, wind=10.0),             # next hour
    ]
    parsed = parse_wind_lines(_lines(spark, rows), locations)
    out = {r.utc_datetime: r.wind_hr_avg for r in hourly_wind_avg(parsed).collect()}
    assert out[dt.datetime(2023, 1, 15, 12, 0)] == 3.0
    assert out[dt.datetime(2023, 1, 15, 13, 0)] == 10.0


def test_mean_rounding(spark, locations):
    rows = [wind_line(utc_time=1205, wind=1.0), wind_line(utc_time=1210, wind=2.0)]
    parsed = parse_wind_lines(_lines(spark, rows), locations)
    assert hourly_wind_avg(parsed).collect()[0].wind_hr_avg == 1.5
