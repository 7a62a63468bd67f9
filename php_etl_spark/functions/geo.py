"""Geospatial primitives in exact integer / Catalyst expression form.

The reference has no geo library; this module supplies the spatial
family a 100 TB analytics engine needs (geofencing, proximity joins,
spatial clustering keys) in the house style:

- Coordinates are INTEGER MICRO-DEGREES (1e-6 deg), so every grid,
  Morton, and containment computation is exact int64 arithmetic —
  bit-identical across Spark and any SQL oracle, immune to float
  reduction-order drift.
- Spherical distances (haversine) are the one float path; results are
  rounded to whole METERS, ~9 orders of magnitude above the ulp-level
  error of ``sin``/``cos``, so cross-engine hashes still agree.
- Planar distances use ``sqrt`` on an exact integer sum of squares —
  IEEE ``sqrt`` is correctly rounded, so the double (and its
  micro-degree rounding) is deterministic everywhere.
- The scale primitives are CELL KEYS, not geometry objects: grid cell
  ids bucket a proximity join to 3x3 neighborhoods (no all-pairs
  cross join), and Morton/geohash codes give a locality-preserving
  sort key for range-clustered layouts (sources/maintenance.zorder
  generalizes the same idea to arbitrary columns).

Everything here returns Catalyst ``Column``s built from built-in
functions — whole-stage codegen, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Knuth multiplicative hash constant — same one the split/sampling
# queries use for deterministic key-derived pseudo-randomness.
_KNUTH = 2654435761

LAT_SPAN = 180_000_000  # micro-degrees
LON_SPAN = 360_000_000

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def synth_lat_micro(key: Column | str) -> Column:
    """Deterministic latitude in micro-degrees derived from an integer
    key: ``(key * KNUTH) % 180e6 - 90e6``. The test tables carry no
    coordinates, so geo queries derive them; the SAME formula appears
    verbatim in each query's oracle SQL, keeping both sides exact."""
    return (_c(key) * F.lit(_KNUTH)) % F.lit(LAT_SPAN) - F.lit(LAT_SPAN // 2)


def synth_lon_micro(key: Column | str) -> Column:
    """Deterministic longitude in micro-degrees: a second Knuth round
    with an odd salt decorrelates it from the latitude stream."""
    return (_c(key) * F.lit(40503) % F.lit(LON_SPAN)) * F.lit(
        _KNUTH
    ) % F.lit(LON_SPAN) - F.lit(LON_SPAN // 2)


def grid_cell(
    lat_micro: Column, lon_micro: Column, cell_micro: int
) -> tuple[Column, Column]:
    """(cell_x, cell_y) integer grid coordinates for a point; floor
    division on non-negative shifted coordinates, exact int64."""
    cx = F.floor((lon_micro + F.lit(LON_SPAN // 2)) / F.lit(cell_micro))
    cy = F.floor((lat_micro + F.lit(LAT_SPAN // 2)) / F.lit(cell_micro))
    return cx, cy


def planar_dist_micro(
    lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column
) -> Column:
    """Planar (equirectangular-grid) distance in micro-degrees:
    ``round(sqrt(dlat² + dlon²))``. The sum of squares is exact int64
    (|coord| ≤ 1.8e8 → squares ≤ 1.3e17 < 2^63); int→double and IEEE
    sqrt are both deterministic, so the rounded result hashes
    identically across engines."""
    d2 = (lat_a - lat_b) * (lat_a - lat_b) + (lon_a - lon_b) * (lon_a - lon_b)
    return F.round(F.sqrt(d2.cast("double"))).cast("long")


def haversine_m(
    lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column
) -> Column:
    """Great-circle distance in whole meters between micro-degree
    points (R = 6 371 000 m). ``sin``/``cos`` carry ~1 ulp of libm
    slack; at earth scale that is ~1e-9 m, so rounding to meters is
    engine-stable. Inputs are converted micro-deg → radians once."""
    to_rad = F.lit(3.141592653589793 / 180_000_000.0)
    la, lb = lat_a * to_rad, lat_b * to_rad
    dlat = (lat_b - lat_a) * to_rad / F.lit(2.0)
    dlon = (lon_b - lon_a) * to_rad / F.lit(2.0)
    h = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(la) * F.cos(lb) * F.sin(dlon) * F.sin(dlon)
    )
    return F.round(
        F.lit(2.0 * 6_371_000.0) * F.asin(F.least(F.sqrt(h), F.lit(1.0)))
    ).cast("long")


def _spread15(v: str) -> str:
    """SQL fragment spreading the low 15 bits of ``{v}`` to even bit
    positions (Morton/Z-order bit interleave, the standard
    magic-number cascade). Returned as a SQL string so the identical
    text runs under Spark SQL and DuckDB."""
    s = f"(({v} | ({v} << 8)) & 16711935)"
    s = f"(({s} | ({s} << 4)) & 252645135)"
    s = f"(({s} | ({s} << 2)) & 858993459)"
    s = f"(({s} | ({s} << 1)) & 1431655765)"
    return s


def morton30_sql(lat_micro_sql: str, lon_micro_sql: str) -> str:
    """SQL text for the 30-bit Morton (Z-order) code of a point:
    15-bit quantization of each axis, lon bits in the odd (MSB-side)
    positions — exactly the geohash bit order. Valid Spark SQL and
    DuckDB SQL alike (``&``, ``|``, ``<<`` are common syntax)."""
    ix = f"CAST(floor((({lon_micro_sql}) + {LON_SPAN // 2}) * 32768.0 / {LON_SPAN}) AS BIGINT)"
    iy = f"CAST(floor((({lat_micro_sql}) + {LAT_SPAN // 2}) * 32768.0 / {LAT_SPAN}) AS BIGINT)"
    return f"({_spread15(iy)} | ({_spread15(ix)} << 1))"


def geohash6_sql(morton_sql: str) -> str:
    """SQL text mapping a 30-bit Morton code to its 6-character
    geohash (base32, 5 bits per char, MSB first)."""
    parts = []
    for i in range(6):
        shift = 25 - 5 * i
        parts.append(
            f"substr('{GEOHASH32}', "
            f"CAST(((({morton_sql}) >> {shift}) & 31) AS INT) + 1, 1)"
        )
    return " || ".join(parts)


def convex_contains_sql(
    lat_sql: str, lon_sql: str, vertices: list[tuple[int, int]]
) -> str:
    """SQL boolean: point inside (or on the boundary of) a CONVEX
    polygon given as CCW ``(lat_micro, lon_micro)`` vertices. One
    exact integer cross product per edge, unrolled — no iteration, no
    floats; |coords| ≤ 1.8e8 keeps every product well inside int64."""
    terms = []
    n = len(vertices)
    for i in range(n):
        (y1, x1) = vertices[i]
        (y2, x2) = vertices[(i + 1) % n]
        cross = (
            f"(({x2 - x1}) * (({lat_sql}) - ({y1})) "
            f"- ({y2 - y1}) * (({lon_sql}) - ({x1})))"
        )
        terms.append(f"{cross} >= 0")
    return "(" + " AND ".join(terms) + ")"


def bbox_cells(
    lat_lo: Column,
    lat_hi: Column,
    lon_lo: Column,
    lon_hi: Column,
    cell_micro: int,
) -> Column:
    """Array of (cx, cy) grid cells covering a bounding box — the
    spatial-index side of a grid join: explode this over a geometry
    table (fences, regions) and EQUI-join points on their single
    cell. Any point inside the geometry lies inside its bbox, whose
    covering cells are all emitted, so recall is exact. Cell count
    per geometry is bounded by (bbox/cell + 1)^2 — size the cell to
    the typical geometry, exactly like geo_grid_knn sizes it to point
    density."""
    cx_lo = F.floor((lon_lo + F.lit(LON_SPAN // 2)) / F.lit(cell_micro))
    cx_hi = F.floor((lon_hi + F.lit(LON_SPAN // 2)) / F.lit(cell_micro))
    cy_lo = F.floor((lat_lo + F.lit(LAT_SPAN // 2)) / F.lit(cell_micro))
    cy_hi = F.floor((lat_hi + F.lit(LAT_SPAN // 2)) / F.lit(cell_micro))
    return F.flatten(
        F.transform(
            F.sequence(cx_lo, cx_hi),
            lambda x: F.transform(
                F.sequence(cy_lo, cy_hi),
                lambda y: F.struct(x.alias("cx"), y.alias("cy")),
            ),
        )
    )
