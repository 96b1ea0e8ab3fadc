"""Temporal joins (beats_spark/joins.py) vs hand oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.harness import pin_file_order

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


def _clicks(spark):
    return spark.createDataFrame(
        [
            ("u1", 1, "2024-01-01 00:00:00"),
            ("u1", 2, "2024-01-01 01:00:00"),
            ("u2", 3, "2024-01-01 00:30:00"),
        ],
        "user_id string, click_id long, click_ts string",
    ).withColumn("click_ts", F.to_timestamp("click_ts"))


def _buys(spark):
    return spark.createDataFrame(
        [
            ("u1", 101, "2024-01-01 00:00:00"),
            ("u1", 102, "2024-01-01 00:45:00"),
            ("u1", 103, "2024-01-01 02:59:00"),
            ("u2", 104, "2024-01-01 03:00:00"),
            ("u2", 105, "2024-01-01 02:30:00"),
        ],
        "user_id string, buy_id long, buy_ts string",
    ).withColumn("buy_ts", F.to_timestamp("buy_ts"))


IJ_KW = dict(
    on=("user_id",), left_ts="click_ts", right_ts="buy_ts",
    lower_seconds=0, upper_seconds=7200,
)


@pytest.mark.parametrize("bucket", [60, 7200, 86400])
def test_interval_join_bounds_and_bucket_invariance(spark, bucket):
    from beats_spark.joins import interval_join

    out = interval_join(
        _clicks(spark), _buys(spark),
        include_lower=False, bucket_seconds=bucket, **IJ_KW,
    )
    got = sorted((r.click_id, r.buy_id) for r in out.collect())
    # (1,101) excluded: gap 0 with exclusive lower; (1,103) gap 2:59 > 2h;
    # (3,105) gap exactly 2h with inclusive upper; (3,104) gap 2:30 out
    assert got == [(1, 102), (2, 103), (3, 105)]


def test_interval_join_bound_strictness(spark):
    from beats_spark.joins import interval_join

    incl = interval_join(_clicks(spark), _buys(spark), **IJ_KW)
    got = sorted((r.click_id, r.buy_id) for r in incl.collect())
    assert (1, 101) in got  # gap 0 matches with inclusive lower

    open_upper = interval_join(
        _clicks(spark), _buys(spark), include_upper=False, **IJ_KW
    )
    got = sorted((r.click_id, r.buy_id) for r in open_upper.collect())
    assert (3, 105) not in got  # gap exactly 2h excluded


def test_interval_join_python_oracle_on_events(spark):
    """Cross-check the bucketed formulation against a brute-force
    pandas filter on a real slice of the events table."""
    from beats_spark.joins import interval_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("buy_id"),
        F.col("ts").alias("buy_ts"),
    )
    out = interval_join(
        clicks, buys, include_lower=False, bucket_seconds=600, **IJ_KW
    )
    got = sorted((r.click_id, r.buy_id) for r in out.collect())

    import pandas as pd

    cp, bp = clicks.toPandas(), buys.toPandas()
    want = sorted(
        (int(c.click_id), int(b.buy_id))
        for c in cp.itertuples()
        for b in bp[bp.user_id == c.user_id].itertuples()
        if c.click_ts < b.buy_ts <= c.click_ts + pd.Timedelta(seconds=7200)
    )
    assert got == want and len(want) > 0


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join over multi-file
    micro-batches emits exactly the batch pair set — state buffers
    each side until the other's window closes, no pair lost or
    duplicated across batch boundaries."""
    import os

    import pandas as pd

    from beats_spark.joins import interval_join, interval_join_stream

    csrc, bsrc = str(tmp_path / "clicks"), str(tmp_path / "buys")
    os.makedirs(csrc), os.makedirs(bsrc)
    cp = _clicks(spark).toPandas()
    bp = _buys(spark).toPandas()
    # split each side across two files → at least 4 micro-batches with
    # maxFilesPerTrigger=1; pairs whose sides land in different
    # batches must come out of the join state, not the same batch
    for i, part in enumerate([cp.iloc[:2], cp.iloc[2:]]):
        part.to_json(f"{csrc}/f{i}.json", orient="records", lines=True,
                     date_format="iso")
    for i, part in enumerate([bp.iloc[:2], bp.iloc[2:]]):
        part.to_json(f"{bsrc}/f{i}.json", orient="records", lines=True,
                     date_format="iso")
    pin_file_order(csrc)
    pin_file_order(bsrc)

    def stream(path, schema, ts_col):
        return (
            spark.readStream.format("json").schema(schema)
            .option("maxFilesPerTrigger", 1).load(path)
            .withColumn(ts_col, F.to_timestamp(ts_col))
        )

    joined = interval_join_stream(
        stream(csrc, "user_id string, click_id long, click_ts string", "click_ts"),
        stream(bsrc, "user_id string, buy_id long, buy_ts string", "buy_ts"),
        watermark="4 hours", include_lower=False, **IJ_KW,
    )
    rows = []
    q = (
        joined.writeStream.foreachBatch(lambda df, _: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted((r.click_id, r.buy_id) for r in rows)

    batch = interval_join(
        _clicks(spark), _buys(spark), include_lower=False, **IJ_KW
    )
    want = sorted((r.click_id, r.buy_id) for r in batch.collect())
    assert got == want and len(want) == 3
