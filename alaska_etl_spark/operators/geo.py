"""Geospatial radius/kNN join with grid-cell blocking.

The reference's domain is weather stations: "which station covers this
point" is its implicit join (the MapClick URL bakes lat/lon —
/root/reference/airflow/dags/utils/utils.py get_url_from_lat_lon). The
distributed form of that question is a DISTANCE join, and the naive
plan is a cartesian product with a haversine filter — N·M pairs, the
one shape that cannot scale.

Grid blocking makes it an EQUI-join: bucket both sides into 1°×1°
cells, explode the SMALLER side to every cell a match could possibly
live in (the neighbor window that covers ``radius_km``), join on the
cell id, then compute the exact haversine only for co-celled pairs.
Candidates drop from N·M to Σ_cell |L_cell|·|R_cell·window| — the same
candidates-then-verify contract as the similarity joins
(operators/simjoin.py), with geometry instead of set overlap providing
the blocking guarantee:

- 1° latitude is a constant 111.045 km, so ``⌈R/111.045⌉`` lat cells
  always cover R.
- 1° longitude is 111.045·cos(lat) km; the window is sized at the
  WORST latitude the data can reach (``max_abs_lat``), so the cover
  holds everywhere — callers with polar data must widen
  ``max_abs_lat`` (at 60° the lon window is 2× the equator's).
- The antimeridian needs no special case: longitude cells join modulo
  360, and haversine's half-angle sin² is itself periodic
  (sin(180°−x) = sin x), so Δλ = 359° measures like 1°.

Exactness: the blocked result EQUALS the brute-force distance join
(tests pin it), so DuckDB oracles the query with the cartesian form at
oracle scale (qb1). Distances are rounded before the threshold compare
and the rank order is (distance, right id) — total, engine-stable.

The testdata carries no coordinate columns, so :func:`pseudo_coords`
derives deterministic lat/lon from integer keys with pure integer
arithmetic (same expression in the SQL twin) — a stand-in for real
station coordinates that keeps every pair replayable.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pseudo_coords", "pseudo_coords_sql", "haversine_km", "knn_join", "radius_pairs"]

_EARTH_KM = 6371.0
_KM_PER_DEG_LAT = 111.045


def pseudo_coords(key: Column | str, *, max_abs_lat: float = 60.0) -> tuple[Column, Column]:
    """Deterministic (lat, lon) from an integral key: integer-affine
    scatter into [−max_abs_lat, max_abs_lat) × [−180, 180), exact in
    any engine. |lat| is capped so the longitude cell window stays
    bounded (see module doc)."""
    k = (F.col(key) if isinstance(key, str) else key).cast("bigint")
    lat_span = int(2 * max_abs_lat * 100)
    lat = (((k * 9973) % lat_span) / F.lit(100.0)) - F.lit(max_abs_lat)
    lon = (((k * 7919) % 36000) / F.lit(100.0)) - F.lit(180.0)
    return lat, lon


def pseudo_coords_sql(key: str, *, max_abs_lat: float = 60.0) -> tuple[str, str]:
    """The identical derivation as ANSI SQL."""
    lat_span = int(2 * max_abs_lat * 100)
    return (
        f"((({key} * 9973) % {lat_span}) / 100.0 - {max_abs_lat})",
        f"((({key} * 7919) % 36000) / 100.0 - 180.0)",
    )


def haversine_km(lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column) -> Column:
    """Great-circle distance in km — pure codegen trig."""
    rl1, rl2 = F.radians(lat_a), F.radians(lat_b)
    dphi = F.radians(lat_b - lat_a) / 2
    dlam = F.radians(lon_b - lon_a) / 2
    h = F.sin(dphi) ** 2 + F.cos(rl1) * F.cos(rl2) * F.sin(dlam) ** 2
    return F.lit(2 * _EARTH_KM) * F.asin(F.sqrt(h))


def haversine_km_sql(lat_a: str, lon_a: str, lat_b: str, lon_b: str) -> str:
    """The identical distance as ANSI SQL."""
    return (
        f"2 * {_EARTH_KM} * asin(sqrt("
        f"pow(sin(radians(({lat_b}) - ({lat_a})) / 2), 2) + "
        f"cos(radians({lat_a})) * cos(radians({lat_b})) * "
        f"pow(sin(radians(({lon_b}) - ({lon_a})) / 2), 2)))"
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str,
    right_id: str,
    k: int,
    radius_km: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 60.0,
    round_digits: int = 3,
) -> DataFrame:
    """For every left row, its ``k`` nearest right rows within
    ``radius_km``, via the grid-cell blocking described in the module
    doc. Both inputs must carry ``lat_col``/``lon_col`` (degrees) and
    |lat| ≤ ``max_abs_lat``. The RIGHT side is the one exploded to
    neighbor cells — pass the smaller relation there.

    Returns (left_id, right_id, distance_km, rank), rank 1..k by
    (rounded distance, right id)."""
    a_cells = int(math.ceil(radius_km / _KM_PER_DEG_LAT)) + 1
    km_per_deg_lon = _KM_PER_DEG_LAT * math.cos(math.radians(max_abs_lat))
    b_cells = int(math.ceil(radius_km / km_per_deg_lon)) + 1

    lcell = left.select(
        F.col(left_id),
        F.col(lat_col).alias("_lat_l"),
        F.col(lon_col).alias("_lon_l"),
        F.floor(lat_col).alias("_cy"),
        F.pmod(F.floor(lon_col), F.lit(360)).alias("_cx"),
    )
    offsets = F.explode(
        F.array(
            *[
                F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
                for dy in range(-a_cells, a_cells + 1)
                for dx in range(-b_cells, b_cells + 1)
            ]
        )
    ).alias("_o")
    rcell = (
        right.select(
            F.col(right_id),
            F.col(lat_col).alias("_lat_r"),
            F.col(lon_col).alias("_lon_r"),
            F.floor(lat_col).alias("_ry"),
            F.floor(lon_col).alias("_rx"),
        )
        .select("*", offsets)
        .select(
            right_id,
            "_lat_r",
            "_lon_r",
            (F.col("_ry") + F.col("_o.dy")).alias("_cy"),
            F.pmod(F.col("_rx") + F.col("_o.dx"), F.lit(360)).alias("_cx"),
        )
    )
    dist = F.round(
        haversine_km(F.col("_lat_l"), F.col("_lon_l"), F.col("_lat_r"), F.col("_lon_r")),
        round_digits,
    )
    w = Window.partitionBy(left_id).orderBy("distance_km", right_id)
    return (
        lcell.join(rcell, ["_cy", "_cx"])
        .withColumn("distance_km", dist)
        .filter(F.col("distance_km") <= radius_km)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(left_id, right_id, "distance_km", "rank")
    )


def radius_pairs(
    points: DataFrame,
    id_col: str,
    *,
    radius_km: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 60.0,
    round_digits: int = 3,
) -> DataFrame:
    """ALL point pairs within ``radius_km`` (id_a < id_b) via the same
    grid-cell blocking as :func:`knn_join` — the edge builder for
    density clustering (ε-neighborhood graphs): candidates are
    co-celled pairs only, the exact haversine verifies. Self-join
    form: one side explodes to the neighbor-cell window, the other
    stays put; the ``id_a < id_b`` filter keeps each unordered pair
    once (the blocked candidate set is symmetric, so orientation
    doesn't lose pairs). Returns ``(id_a, id_b, distance_km)``.
    """
    a_cells = int(math.ceil(radius_km / _KM_PER_DEG_LAT)) + 1
    km_per_deg_lon = _KM_PER_DEG_LAT * math.cos(math.radians(max_abs_lat))
    b_cells = int(math.ceil(radius_km / km_per_deg_lon)) + 1

    anchor = points.select(
        F.col(id_col).alias("id_a"),
        F.col(lat_col).alias("_lat_a"),
        F.col(lon_col).alias("_lon_a"),
        F.floor(lat_col).alias("_cy"),
        F.pmod(F.floor(lon_col), F.lit(360)).alias("_cx"),
    )
    offsets = F.explode(
        F.array(
            *[
                F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
                for dy in range(-a_cells, a_cells + 1)
                for dx in range(-b_cells, b_cells + 1)
            ]
        )
    ).alias("_o")
    probe = (
        points.select(
            F.col(id_col).alias("id_b"),
            F.col(lat_col).alias("_lat_b"),
            F.col(lon_col).alias("_lon_b"),
            F.floor(lat_col).alias("_ry"),
            F.floor(lon_col).alias("_rx"),
        )
        .select("*", offsets)
        .select(
            "id_b",
            "_lat_b",
            "_lon_b",
            (F.col("_ry") + F.col("_o.dy")).alias("_cy"),
            F.pmod(F.col("_rx") + F.col("_o.dx"), F.lit(360)).alias("_cx"),
        )
    )
    dist = F.round(
        haversine_km(F.col("_lat_a"), F.col("_lon_a"), F.col("_lat_b"), F.col("_lon_b")),
        round_digits,
    )
    return (
        anchor.join(probe, ["_cy", "_cx"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance_km", dist)
        .filter(F.col("distance_km") <= radius_km)
        .select("id_a", "id_b", "distance_km")
    )
