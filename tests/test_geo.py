"""Geo family tests: Morton/geohash encodings against an independent
pure-Python reference, exact point-in-polygon half-plane checks,
haversine against a known real-world distance, and grid-KNN
completeness against an in-neighborhood brute force."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from php_etl_spark.functions import geo


# --- pure-Python references ------------------------------------------------


def _spread15_py(v: int) -> int:
    v &= 0x7FFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def _morton30_py(lat_micro: int, lon_micro: int) -> int:
    ix = int(math.floor((lon_micro + 180_000_000) * 32768.0 / 360_000_000))
    iy = int(math.floor((lat_micro + 90_000_000) * 32768.0 / 180_000_000))
    return _spread15_py(iy) | (_spread15_py(ix) << 1)


def _geohash6_py(m: int) -> str:
    return "".join(
        geo.GEOHASH32[(m >> (25 - 5 * i)) & 31] for i in range(6)
    )


def _contains_py(lat: int, lon: int, verts) -> bool:
    n = len(verts)
    for i in range(n):
        y1, x1 = verts[i]
        y2, x2 = verts[(i + 1) % n]
        if (x2 - x1) * (lat - y1) - (y2 - y1) * (lon - x1) < 0:
            return False
    return True


PENTAGON = [
    (-30_000_000, -60_000_000),
    (-30_000_000, 60_000_000),
    (30_000_000, 90_000_000),
    (60_000_000, 0),
    (30_000_000, -90_000_000),
]


# --- tests -----------------------------------------------------------------


class TestMortonGeohash:
    def test_known_geohash(self, spark):
        # Classic geohash test vector: (57.64911, 10.40744) -> u4pruy
        # at 6 characters (15 bits per axis == 30 bits == 6 chars).
        df = spark.createDataFrame(
            [Row(glat=57_649_110, glon=10_407_440)]
        )
        m = geo.morton30_sql("glat", "glon")
        out = df.select(
            F.expr(m).alias("m"),
            F.expr(geo.geohash6_sql(m)).alias("gh"),
        ).first()
        assert out["gh"] == "u4pruy"
        assert out["m"] == _morton30_py(57_649_110, 10_407_440)

    def test_matches_python_reference_grid(self, spark):
        pts = [
            Row(glat=lat, glon=lon)
            for lat in (-89_999_999, -45_000_001, 0, 12_345_678, 89_999_999)
            for lon in (-179_999_999, -1, 0, 98_765_432, 179_999_999)
        ]
        df = spark.createDataFrame(pts)
        m = geo.morton30_sql("glat", "glon")
        rows = df.select(
            "glat", "glon",
            F.expr(m).alias("m"),
            F.expr(geo.geohash6_sql(m)).alias("gh"),
        ).collect()
        for r in rows:
            ref = _morton30_py(r["glat"], r["glon"])
            assert r["m"] == ref, (r["glat"], r["glon"])
            assert r["gh"] == _geohash6_py(ref)

    def test_morton_locality(self, spark):
        # Two points in the same ~5.5km quantization cell share the
        # full Morton code; a far-away point does not.
        df = spark.createDataFrame(
            [
                Row(glat=10_000_000, glon=10_000_000),
                Row(glat=10_001_000, glon=10_001_000),
                Row(glat=-70_000_000, glon=150_000_000),
            ]
        )
        m = [
            r["m"]
            for r in df.select(
                F.expr(geo.morton30_sql("glat", "glon")).alias("m")
            ).collect()
        ]
        assert m[0] == m[1]
        assert m[0] != m[2]


class TestContains:
    def test_matches_python_reference(self, spark):
        pts = [
            Row(glat=lat, glon=lon)
            for lat in (-40_000_000, -30_000_000, 0, 30_000_000, 59_000_000)
            for lon in (-95_000_000, -60_000_000, 0, 60_000_000, 91_000_000)
        ]
        df = spark.createDataFrame(pts)
        rows = df.select(
            "glat", "glon",
            F.expr(
                geo.convex_contains_sql("glat", "glon", PENTAGON)
            ).alias("inside"),
        ).collect()
        hits = 0
        for r in rows:
            ref = _contains_py(r["glat"], r["glon"], PENTAGON)
            assert r["inside"] == ref, (r["glat"], r["glon"])
            hits += int(ref)
        assert 0 < hits < len(rows)  # both classes exercised

    def test_boundary_is_inside(self, spark):
        # Vertices and edge midpoints satisfy cross >= 0 (closed fence).
        verts = [Row(glat=y, glon=x) for (y, x) in PENTAGON]
        mids = [
            Row(
                glat=(PENTAGON[i][0] + PENTAGON[(i + 1) % 5][0]) // 2,
                glon=(PENTAGON[i][1] + PENTAGON[(i + 1) % 5][1]) // 2,
            )
            for i in range(5)
        ]
        df = spark.createDataFrame(verts + mids)
        rows = df.select(
            F.expr(
                geo.convex_contains_sql("glat", "glon", PENTAGON)
            ).alias("inside")
        ).collect()
        assert all(r["inside"] for r in rows)


class TestDistances:
    def test_haversine_paris_london(self, spark):
        # Paris (48.8566, 2.3522) to London (51.5074, -0.1278): the
        # great-circle distance is ~343.5 km; assert within 1 km.
        df = spark.createDataFrame(
            [
                Row(
                    alat=48_856_600, alon=2_352_200,
                    blat=51_507_400, blon=-127_800,
                )
            ]
        )
        d = df.select(
            geo.haversine_m(
                F.col("alat"), F.col("alon"), F.col("blat"), F.col("blon")
            ).alias("d")
        ).first()["d"]
        assert abs(d - 343_500) < 1_000

    def test_haversine_zero_and_antipode(self, spark):
        df = spark.createDataFrame(
            [
                Row(alat=10_000_000, alon=20_000_000,
                    blat=10_000_000, blon=20_000_000),
                Row(alat=0, alon=0, blat=0, blon=180_000_000),
            ]
        )
        rows = df.select(
            geo.haversine_m(
                F.col("alat"), F.col("alon"), F.col("blat"), F.col("blon")
            ).alias("d")
        ).collect()
        assert rows[0]["d"] == 0
        # Half circumference of the R=6371km sphere: pi * R.
        assert abs(rows[1]["d"] - round(math.pi * 6_371_000)) <= 1

    def test_planar_dist_is_exact_rounding(self, spark):
        df = spark.createDataFrame(
            [Row(alat=3, alon=4, blat=0, blon=0),
             Row(alat=1, alon=1, blat=0, blon=0)]
        )
        rows = df.select(
            geo.planar_dist_micro(
                F.col("alat"), F.col("alon"), F.col("blat"), F.col("blon")
            ).alias("d")
        ).collect()
        assert rows[0]["d"] == 5
        assert rows[1]["d"] == round(math.sqrt(2))


class TestGridKnn:
    def test_top1_matches_bruteforce_in_neighborhood(self, spark):
        """For each query point, the operator's nearest neighbor must
        equal the brute-force nearest among all points in the 3x3 cell
        neighborhood (the operator's declared candidate set)."""
        from php_etl_spark.queries import QUERIES

        out = QUERIES["geo_grid_knn"](spark, "/root/testdata/sf0.001")
        top1 = {
            r["query_id"]: (r["neighbor_id"], r["dist_micro"])
            for r in out.filter(F.col("rn") == 1).collect()
        }
        # Brute force in Python over the same synthetic points.
        import duckdb

        con = duckdb.connect()
        pts = con.execute(
            """
            SELECT c_custkey AS id,
                   (c_custkey * 2654435761) % 180000000 - 90000000 AS glat,
                   ((c_custkey * 40503) % 360000000) * 2654435761
                     % 360000000 - 180000000 AS glon
            FROM read_parquet('/root/testdata/sf0.001/customer.parquet')
            """
        ).fetchall()
        cell = 8_388_608
        by_cell: dict[tuple[int, int], list] = {}
        for pid, glat, glon in pts:
            key = (
                (glon + 180_000_000) // cell,
                (glat + 90_000_000) // cell,
            )
            by_cell.setdefault(key, []).append((pid, glat, glon))
        for pid, glat, glon in pts:
            if pid % 20 != 0:
                continue
            cx = (glon + 180_000_000) // cell
            cy = (glat + 90_000_000) // cell
            best = None
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for nid, nlat, nlon in by_cell.get(
                        (cx + dx, cy + dy), []
                    ):
                        if nid == pid:
                            continue
                        d = round(
                            math.sqrt(
                                float(
                                    (glat - nlat) ** 2 + (glon - nlon) ** 2
                                )
                            )
                        )
                        if best is None or (d, nid) < best:
                            best = (d, nid)
            if best is None:
                assert pid not in top1
            else:
                assert top1[pid] == (best[1], best[0])
