"""Fetch-side operators, fully hermetic (injected fetcher, no network):
domain preflight, listing crawl, watermark filter, url/station columns."""

from __future__ import annotations

from datetime import datetime

from alaska_etl_spark.sources.fetch import (
    check_domain,
    crawl_file_urls,
    new_file_urls,
    nws_url,
    station_name_from_url,
)

BASE = "https://www.ncei.noaa.gov/pub/data/uscrn/products/hourly02"

INDEX = '<a href="2022/">2022/</a> <a href="2023/">2023/</a> <a href="docs/">docs/</a>'
YEAR = (
    '<a href="CRNH0203-2023-AK_Fairbanks_11_NE.txt">f</a>'
    '<a href="CRNH0203-2023-AK_St._Paul_4_NE.txt">p</a>'
    '<a href="CRNH0203-2023-TX_Austin_33_NW.txt">tx</a>'
    '<a href="readme.txt">r</a>'
)
UPDATES = """
<tr><td><a href="CRNH0203-2023-AK_A.txt">a</a></td><td>2023-06-01 10:00</td></tr>
<tr><td><a href="CRNH0203-2023-AK_B.txt">b</a></td><td>2023-06-02 10:00</td></tr>
"""


def test_check_domain():
    assert check_domain(f"{BASE}/2023/")
    assert check_domain("https://forecast.weather.gov/MapClick.php?lat=1")
    assert not check_domain("https://evil.example.com/x")
    assert not check_domain("https://ncei.noaa.gov.evil.com/x")
    assert not check_domain("not a url")


def test_crawl_file_urls():
    def fetch(url):
        return INDEX if url == BASE else YEAR

    urls = crawl_file_urls(fetch, BASE)
    assert len(urls) == 4  # 2 AK files × 2 years; TX + readme excluded
    assert f"{BASE}/2023/CRNH0203-2023-AK_Fairbanks_11_NE.txt" in urls


def test_new_file_urls_watermark():
    got = new_file_urls(UPDATES, BASE, datetime(2023, 6, 1, 12, 0))
    assert got == [f"{BASE}/CRNH0203-2023-AK_B.txt"]
    assert new_file_urls(UPDATES, BASE, datetime(2023, 6, 3, 0, 0)) == []


def test_station_name_from_url(spark):
    df = spark.createDataFrame(
        [
            (f"{BASE}/2023/CRNH0203-2023-AK_Fairbanks_11_NE.txt",),
            (f"{BASE}/2023/CRNH0203-2023-AK_St._Paul_4_NE.txt",),
            (f"{BASE}/2023/CRNH0203-2023-AK_Utqiagvik_formerly_Barrow_4_ENE.txt",),
        ],
        "url string",
    )
    got = [r.s for r in df.select(station_name_from_url("url").alias("s")).collect()]
    assert got == ["Fairbanks_11_NE", "St._Paul_4_NE", "Utqiagvik"]


def test_nws_url_column(spark):
    df = spark.createDataFrame([(64.9, -147.5)], "latitude double, longitude double")
    got = df.select(nws_url("latitude", "longitude").alias("u")).collect()[0].u
    assert got == (
        "https://forecast.weather.gov/MapClick.php?lat=64.9000&lon=-147.5000"
        "&lg=english&&FcstType=digital"
    )


def test_rate_limited_sleeps_before_every_request():
    from alaska_etl_spark.sources.fetch import rate_limited

    slept, fetched = [], []
    f = rate_limited(lambda u: fetched.append(u) or "<html/>", 1.5, sleep=slept.append)
    assert f("http://a") == "<html/>" and f("http://b") == "<html/>"
    assert slept == [1.5, 1.5]
    assert fetched == ["http://a", "http://b"]
