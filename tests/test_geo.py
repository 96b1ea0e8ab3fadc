"""Geo operator battery (beats_spark/geo.py): the Morton-quantizer
geohash pinned against the textbook bisection algorithm and the
published test vector, grid aggregation against a pure-Python oracle,
and the antimeridian-wrapping bounding box."""

import random

from pyspark.sql import functions as F

from beats_spark.geo import (
    GEOHASH32,
    geo_bounding_box_udeg,
    geohash_encode_py,
    geohash_grid,
    geohash_udeg,
    geohash_udeg_sql,
)


def test_published_vector():
    # en.wikipedia.org/wiki/Geohash: (57.64911, 10.40744) -> u4pruydqqvj
    assert geohash_encode_py(57_649_110, 10_407_440, 11) == "u4pruydqqvj"
    # prefix-hierarchy property
    assert geohash_encode_py(57_649_110, 10_407_440, 4) == "u4pr"


def test_quantize_morton_equals_bisection_brute_force():
    """The load-bearing equivalence, pure Python (no Spark): the
    quantize + Morton-interleave construction == the textbook
    alternating-bisection algorithm on 20k random points at random
    precisions 1..12 (the same arithmetic geohash_udeg/`_sql` render
    into both engines)."""
    rng = random.Random(7)
    for _ in range(20_000):
        lat = rng.randint(-90_000_000, 90_000_000)
        lon = rng.randint(-180_000_000, 180_000_000)
        p = rng.randint(1, 12)
        pe = p + (p % 2)
        b = 5 * pe // 2
        latq = min(((lat + 90_000_000) << b) // 180_000_000, (1 << b) - 1)
        lonq = min(((lon + 180_000_000) << b) // 360_000_000, (1 << b) - 1)
        h = 0
        for i in range(b):
            h += ((latq >> i) & 1) << (2 * i)
            h += ((lonq >> i) & 1) << (2 * i + 1)
        got = "".join(
            GEOHASH32[(h >> (5 * (pe - 1 - c))) & 31] for c in range(p)
        )
        assert got == geohash_encode_py(lat, lon, p), (lat, lon, p)


def _rand_points(n, seed):
    rng = random.Random(seed)
    return [
        (
            i,
            rng.randint(-90_000_000, 90_000_000),
            rng.randint(-180_000_000, 180_000_000),
        )
        for i in range(n)
    ]


def test_spark_encode_matches_bisection(spark):
    pts = _rand_points(300, seed=11)
    df = spark.createDataFrame(pts, "i long, lat long, lon long")
    for p in (1, 2, 3, 5, 12):  # odd AND even precisions
        got = {
            r.i: r.gh
            for r in df.select(
                "i", geohash_udeg("lat", "lon", p).alias("gh")
            ).collect()
        }
        for i, lat, lon in pts:
            assert got[i] == geohash_encode_py(lat, lon, p), (i, lat, lon, p)


def test_duckdb_sql_twin_matches(spark):
    import duckdb

    pts = _rand_points(200, seed=23)
    con = duckdb.connect()
    con.execute("CREATE TABLE p(i BIGINT, lat BIGINT, lon BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?)", pts)
    for p in (2, 3, 4):
        expr = geohash_udeg_sql("lat", "lon", p)
        for i, gh in con.execute(f"SELECT i, {expr} FROM p").fetchall():
            lat, lon = pts[i][1], pts[i][2]
            assert gh == geohash_encode_py(lat, lon, p)


def test_poles_and_antimeridian_clamp(spark):
    edge = [
        (0, 90_000_000, 180_000_000),
        (1, -90_000_000, -180_000_000),
        (2, 90_000_000, -180_000_000),
        (3, 0, 0),
    ]
    df = spark.createDataFrame(edge, "i long, lat long, lon long")
    got = {
        r.i: r.gh
        for r in df.select(
            "i", geohash_udeg("lat", "lon", 6).alias("gh")
        ).collect()
    }
    for i, lat, lon in edge:
        assert got[i] == geohash_encode_py(lat, lon, 6)
    assert got[0] == "z" * 6  # north-east corner is the all-ones cell
    assert got[1] == "0" * 6
    assert set(got[0]) <= set(GEOHASH32)


def test_bounding_box_wrap(spark):
    rows = [
        (0, 10_000_000, 160_000_000, True),  # inside, east arm
        (1, 10_000_000, -150_000_000, True),  # inside, west arm (wrapped)
        (2, 10_000_000, 0, False),  # outside the wrap
        (3, 85_000_000, 160_000_000, False),  # above top
    ]
    df = spark.createDataFrame(rows, "i long, lat long, lon long, want boolean")
    got = df.select(
        "want",
        geo_bounding_box_udeg(
            F.col("lat"),
            F.col("lon"),
            top=80_000_000,
            left=150_000_000,
            bottom=-75_000_000,
            right=-120_000_000,
        ).alias("got"),
    ).collect()
    for r in got:
        assert r.got == r.want


def test_grid_against_python_oracle(spark):
    pts = _rand_points(500, seed=5)
    rows = [(i, lat, lon, (i * 37) % 1000 - 300) for i, lat, lon in pts]
    df = spark.createDataFrame(rows, "i long, lat long, lon long, v long")
    out = geohash_grid(
        df, "lat", "lon", precision=2, value_col="v", child_precision=4
    ).collect()
    # pure-python twin (floor-div centroids, possibly-negative sums)
    agg = {}
    for i, lat, lon, v in rows:
        gh4 = geohash_encode_py(lat, lon, 4)
        a = agg.setdefault(gh4[:2], [0, 0, set(), 0, 0])
        a[0] += 1
        a[1] += v
        a[2].add(gh4)
        a[3] += lat
        a[4] += lon
    assert len(out) == len(agg)
    for r in out:
        n, sv, kids, slat, slon = agg[r.geohash]
        assert (r.n, r.sum_v, r.child_cells) == (n, sv, len(kids))
        assert r.c_lat_udeg == slat // n  # python // IS floor
        assert r.c_lon_udeg == slon // n
