"""Fetch-side operators (SURVEY §2.1 S1-S3, §2.9 F8/F9, §2.13 C2),
network-isolated: every function takes either plain strings or an
injected ``fetch`` callable (url → html text), so the whole layer is
hermetic in tests and swappable for any HTTP client in production
(reference airflow/dags/utils/utils.py:14-25 get_soup; the politeness
delay is the caller's concern, reference :22).

These run driver-side by design: directory listings are tiny (hundreds
of entries); the *files* they point at are what Spark reads in
parallel (`spark.read.text(urls)` / file-source streams). Nothing here
touches a DataFrame except the two column builders at the bottom.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from datetime import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F

Fetch = Callable[[str], str]


def rate_limited(fetch: Fetch, delay: float, *, sleep: Callable[[float], None] | None = None) -> Fetch:
    """S1 politeness wrapper: a fetcher that sleeps ``delay`` seconds
    before every request (reference get_soup's ``delay`` param,
    utils/utils.py:14-25). ``sleep`` is injectable so tests don't wait."""
    if sleep is None:
        import time

        sleep = time.sleep

    def _fetch(url: str) -> str:
        sleep(delay)
        return fetch(url)

    return _fetch

#: domains the reference allows (utils/utils.py:27-42 check_connection)
DEFAULT_ALLOWED_DOMAINS = ("ncei.noaa.gov", "forecast.weather.gov")


def check_domain(url: str, allowed: tuple[str, ...] = DEFAULT_ALLOWED_DOMAINS) -> bool:
    """C2 connection preflight: is the url's host on the allowlist
    (exact domain or subdomain)?"""
    m = re.match(r"https?://([^/:]+)", url)
    if not m:
        return False
    host = m.group(1).lower()
    return any(host == d or host.endswith("." + d) for d in allowed)


_HREF = re.compile(r'href="([^"]+)"')


def list_year_dirs(index_html: str, base_url: str) -> list[str]:
    """S2 step 1: year subdirectories (e.g. ``2023/``) from a directory
    listing page (reference _get_year_urls, utils/utils.py:71-94)."""
    out = []
    for href in _HREF.findall(index_html):
        if re.fullmatch(r"(19|20)\d{2}/", href):
            out.append(base_url.rstrip("/") + "/" + href)
    return out


def list_ak_files(year_html: str, year_url: str, *, prefix: str = "CRNH0203") -> list[str]:
    """S2 step 2: Alaska data files within one year page — the
    reference keeps ``AK*.txt`` links (get_file_urls,
    utils/utils.py:96-120; files are named ``CRNH0203-<year>-AK_...txt``)."""
    out = []
    for href in _HREF.findall(year_html):
        if href.endswith(".txt") and "AK" in href and href.startswith(prefix):
            out.append(year_url.rstrip("/") + "/" + href)
    return out


def crawl_file_urls(fetch: Fetch, base_url: str, **kwargs) -> list[str]:
    """S2 composed: listing crawl across years via the injected fetcher."""
    urls = []
    for year_url in list_year_dirs(fetch(base_url), base_url):
        urls.extend(list_ak_files(fetch(year_url), year_url, **kwargs))
    return urls


_LISTING_ROW = re.compile(
    r'href="(?P<name>[^"]+\.txt)"[^\n]*?(?P<mod>\d{4}-\d{2}-\d{2} \d{2}:\d{2})'
)


def new_file_urls(
    updates_html: str, base_url: str, last_added: datetime
) -> list[str]:
    """S3: updates-page scan with watermark — keep files whose
    ``Last modified`` is strictly newer than ``last_added`` (reference
    get_new_file_urls, uscrn_dag.py:114-131: ``pd.read_html`` +
    timestamp filter; here a listing-row regex, same semantics)."""
    out = []
    for m in _LISTING_ROW.finditer(updates_html):
        mod = datetime.strptime(m.group("mod"), "%Y-%m-%d %H:%M")
        if mod > last_added:
            out.append(base_url.rstrip("/") + "/" + m.group("name"))
    return out


#: F8: station name from an AK file url (reference station_name regex,
#: utils/utils.py:122-135) — e.g. ``...-AK_Fairbanks_11_NE.txt`` →
#: ``Fairbanks_11_NE``; legacy suffixes stripped.
_STATION_RE = r".*-AK_((?:St\._)?[A-Za-z][A-Za-z0-9_.]*?)(?:_formerly_Barrow[^.]*)?\.txt$"


def station_name_from_url(url_col: Column | str) -> Column:
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.regexp_extract(c, _STATION_RE, 1)


#: F9: NWS MapClick url template from lat/lon (reference get_nws_url,
#: utils/utils.py:151-163 — a row-wise pandas apply; here one native
#: format_string, no UDF).
_NWS_TEMPLATE = (
    "https://forecast.weather.gov/MapClick.php?lat=%s&lon=%s"
    "&lg=english&&FcstType=digital"
)


def nws_url(lat_col: Column | str, lon_col: Column | str) -> Column:
    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lon = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    return F.format_string(
        _NWS_TEMPLATE, lat.cast("decimal(8,4)").cast("string"), lon.cast("decimal(9,4)").cast("string")
    )
