"""Temporal joins (beats_spark/joins.py) vs hand oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.joins import asof_join, range_join


def _left(spark):
    return spark.createDataFrame(
        [
            (1, "u1", "2024-01-01 00:00:00"),
            (2, "u1", "2024-01-01 01:00:00"),
            (3, "u1", "2024-01-01 02:00:00"),
            (4, "u2", "2024-01-01 01:30:00"),
            (5, "u3", "2024-01-01 05:00:00"),
        ],
        "event_id long, user_id string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def _dim(spark):
    return spark.createDataFrame(
        [
            ("u1", "2024-01-01 01:00:00", "gold"),
            ("u1", "2024-01-01 01:30:00", "platinum"),
            ("u2", "2024-01-01 02:00:00", "basic"),
        ],
        "user_id string, valid_from string, plan string",
    ).withColumn("valid_from", F.to_timestamp("valid_from"))


def test_asof_backward_latest_at_or_before(spark):
    out = asof_join(
        _left(spark), _dim(spark), on=("user_id",),
        left_ts="ts", right_ts="valid_from", right_cols=("plan",),
    )
    got = {r.event_id: r.plan for r in out.collect()}
    assert got == {
        1: None,        # before u1's first version
        2: "gold",      # equal timestamp matches (>=)
        3: "platinum",  # latest of the two preceding versions
        4: None,        # u2's version is later
        5: None,        # u3 has no versions
    }
    # left rows are never multiplied or lost
    assert out.count() == 5


def test_asof_strict_excludes_equal_ts(spark):
    out = asof_join(
        _left(spark), _dim(spark), on=("user_id",),
        left_ts="ts", right_ts="valid_from", right_cols=("plan",), strict=True,
    )
    got = {r.event_id: r.plan for r in out.collect()}
    assert got[2] is None  # 01:00 == 01:00 no longer matches
    assert got[3] == "platinum"


def test_asof_collision_raises(spark):
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            _left(spark),
            _dim(spark).withColumnRenamed("plan", "ts"),
            on=("user_id",), left_ts="ts", right_ts="valid_from",
            right_cols=("ts",),
        )


def _intervals(spark):
    return spark.createDataFrame(
        [
            ("u1", 10, "2024-01-01 00:30:00", "2024-01-01 01:30:00"),
            ("u1", 11, "2024-01-01 01:00:00", "2024-01-01 09:00:00"),
            ("u2", 12, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
        ],
        "user_id string, incident_id long, start_ts string, end_ts string",
    ).withColumn("start_ts", F.to_timestamp("start_ts")).withColumn(
        "end_ts", F.to_timestamp("end_ts")
    )


@pytest.mark.parametrize("bucket", [60, 3600, 86400])
def test_range_join_bucket_invariant(spark, bucket):
    """Same pairs for any bucket size (incl. buckets much smaller and
    much larger than the intervals) — each pair meets in exactly one
    bucket, so there are no duplicates to dedupe."""
    out = range_join(
        _left(spark), _intervals(spark),
        left_ts="ts", right_start="start_ts", right_end="end_ts",
        on=("user_id",), bucket_seconds=bucket,
    )
    got = sorted((r.event_id, r.incident_id) for r in out.collect())
    # e2 (u1 01:00) in both u1 intervals (inclusive bounds); e3 (02:00)
    # only in the long one; e4 (u2 01:30) outside u2's window
    assert got == [(2, 10), (2, 11), (3, 11)]


def test_range_join_python_oracle_on_events(spark):
    """Cross-check the bucketed formulation against a brute-force
    pandas filter on a real slice of the events table."""
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "event_id", "ts")
    )
    inc = ev.filter(F.col("event_id") % 20 == 0).select(
        "user_id",
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 36 HOURS")).alias("end_ts"),
    )
    out = range_join(
        ev, inc, left_ts="ts", right_start="start_ts", right_end="end_ts",
        on=("user_id",), bucket_seconds=7200,
    )
    got = sorted((r.event_id, r.incident_id) for r in out.collect())

    epdf = ev.toPandas()
    ipdf = inc.toPandas()
    want = sorted(
        (int(e.event_id), int(i.incident_id))
        for i in ipdf.itertuples()
        for e in epdf[epdf.user_id == i.user_id].itertuples()
        if i.start_ts <= e.ts <= i.end_ts
    )
    assert got == want and len(want) > 0
