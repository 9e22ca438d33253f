"""Generate the checked-in NWS MapClick "digital" HTML fixtures
(tests/fixtures/nws_digital_ahead{0,48,96}.html).

The layout mirrors forecast.weather.gov/MapClick.php?...&FcstType=digital
as the reference scraper depends on it (utils/utils.py:165-211):

- five assorted header/nav tables BEFORE the forecast table, one of
  them nested (find_all("table") document-order indexing must count the
  nested table, or index 5 lands on the wrong table);
- a ``Last Update:`` td with the AKST page timestamp;
- the forecast table at find_all index 5: a colspan divider row, 17
  attribute rows × 24 hour columns (font-wrapped cells, header cell
  bold inside the font), the SAME divider row again, then the second
  24-hour half-table.

Deterministic synthetic values; the date window (Dec 30 → Jan 1)
deliberately crosses a year boundary to exercise the rollover logic the
reference's wall-clock year injection gets wrong (nws_dag.py:97-100).

Run: python tools/make_nws_fixture.py  (idempotent)
"""

from __future__ import annotations

import pathlib
from datetime import datetime, timedelta

ATTRS = [
    "Date",
    "Hour (AKST)",
    "Temperature (°F)",
    "Dewpoint (°F)",
    "Wind Chill (°F)",
    "Surface Wind (mph)",
    "Wind Dir",
    "Gust",
    "Sky Cover (%)",
    "Precipitation Potential (%)",
    "Relative Humidity (%)",
    "Rain",
    "Thunder",
    "Snow",
    "Freezing Rain",
    "Sleet",
    "Fog",
]

DIRS = ["N", "NE", "E", "SE", "S", "SW", "W", "NW"]
START = datetime(2023, 12, 30, 16)  # first forecast hour of AheadHour=0
LAST_UPDATE = "3:03 pm AKST Dec 30, 2023"


def _value(attr: str, ts: datetime, prev_day: int | None) -> str:
    h = ts.hour + ts.day * 24 + ts.month * 744
    if attr == "Date":
        return f"{ts.month}/{ts.day}" if ts.day != prev_day else ""
    if attr == "Hour (AKST)":
        return f"{ts.hour:02d}"
    if attr == "Temperature (°F)":
        return str(-10 + (h * 7) % 25)
    if attr == "Dewpoint (°F)":
        return str(-15 + (h * 5) % 20)
    if attr == "Wind Chill (°F)":
        return str(-20 + (h * 3) % 22)
    if attr == "Surface Wind (mph)":
        return str(2 + (h * 11) % 14)
    if attr == "Wind Dir":
        return DIRS[h % 8]
    if attr == "Gust":
        return str(20 + h % 9) if h % 5 == 0 else ""
    if attr == "Sky Cover (%)":
        return str((h * 13) % 101)
    if attr == "Precipitation Potential (%)":
        return str((h * 17) % 101)
    if attr == "Relative Humidity (%)":
        return str(40 + (h * 19) % 60)
    # outlook flag columns
    return "--" if h % 4 else ""


def _half_table_rows(start: datetime) -> list[str]:
    hours = [start + timedelta(hours=i) for i in range(24)]
    rows = []
    for attr in ATTRS:
        cells = [
            f'<td class="grey" width="5%"><font size="-1"><b>{attr}</b></font></td>'
        ]
        prev_day = start.day - 1 if attr == "Date" else None
        for ts in hours:
            v = _value(attr, ts, prev_day)
            if attr == "Date" and v:
                prev_day = ts.day
            cells.append(f'<td align="center"><font size="-1">{v}</font></td>')
        rows.append("<tr align=\"center\">" + "".join(cells) + "</tr>")
    return rows


DIVIDER = '<tr><td colspan="25" class="divider">&nbsp;</td></tr>'


def make_page(ahead_hour: int) -> str:
    start = START + timedelta(hours=ahead_hour)
    fc_rows = [DIVIDER, *_half_table_rows(start), DIVIDER,
               *_half_table_rows(start + timedelta(hours=24))]
    forecast_table = '<table cellspacing="2" width="100%">' + "".join(fc_rows) + "</table>"
    return f"""<!DOCTYPE html>
<html><head><title>NWS - tabular forecast</title></head>
<body>
<!-- table 0: banner, contains nested table 1 -->
<table width="100%" class="header"><tr><td>
  <table class="nav"><tr><td><a href="https://www.weather.gov">weather.gov</a></td></tr></table>
</td><td>National Weather Service</td></tr></table>
<!-- table 2: search bar -->
<table class="search"><tr><td><form>Local forecast by "City, St"</form></td></tr></table>
<!-- table 3: location + last update -->
<table width="100%"><tr>
  <td><b>Fairbanks AK</b><br>64.84&deg;N 147.72&deg;W (Elev. 446 ft)</td>
  <td align="right">Last Update: {LAST_UPDATE}</td>
</tr></table>
<!-- table 4: period selector -->
<table><tr><td><a href="MapClick.php?AheadHour={ahead_hour - 48}">&lt;&lt; Previous 2 Days</a></td>
<td><a href="MapClick.php?AheadHour={ahead_hour + 48}">Next 2 Days &gt;&gt;</a></td></tr></table>
<!-- table 5: the forecast landscape -->
{forecast_table}
<p>Forecast prepared by NWS Fairbanks</p>
</body></html>
"""


def main() -> None:
    outdir = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"
    outdir.mkdir(parents=True, exist_ok=True)
    for hr in (0, 48, 96):
        (outdir / f"nws_digital_ahead{hr}.html").write_text(make_page(hr), encoding="utf-8")
        print(f"wrote nws_digital_ahead{hr}.html")


if __name__ == "__main__":
    main()
