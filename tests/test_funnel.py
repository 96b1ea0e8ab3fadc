"""Ordered funnel (beats_spark/funnel.py) vs hand oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.harness import pin_file_order

from beats_spark.funnel import funnel_counts, funnel_depth

STAGES = ("view", "click", "purchase")


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id string, eid long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))


def _depths(spark, rows, **kw):
    df = funnel_depth(
        _ev(spark, rows), "user_id", "ts", "event_type", STAGES,
        tiebreak_col="eid", **kw,
    )
    return {r.user_id: r.depth for r in df.collect()}


def test_funnel_order_matters(spark):
    rows = [
        # u1: full chain in order
        ("u1", 1, "2024-01-01 00:00:00", "view"),
        ("u1", 2, "2024-01-01 01:00:00", "click"),
        ("u1", 3, "2024-01-01 02:00:00", "purchase"),
        # u2: purchase BEFORE the click chain completes → depth 2
        ("u2", 4, "2024-01-01 00:00:00", "view"),
        ("u2", 5, "2024-01-01 00:30:00", "purchase"),
        ("u2", 6, "2024-01-01 01:00:00", "click"),
        # u3: click with no prior view → depth 0
        ("u3", 7, "2024-01-01 00:00:00", "click"),
        ("u3", 8, "2024-01-01 01:00:00", "purchase"),
        # u4: stage events at the SAME timestamp do not chain
        # (strictly-after via the [unbounded, -1) frame + eid tiebreak)
        ("u4", 9, "2024-01-01 00:00:00", "view"),
        ("u4", 10, "2024-01-01 00:00:00", "click"),
    ]
    got = _depths(spark, rows)
    assert got == {"u1": 3, "u2": 2, "u3": 0, "u4": 2}
    # u4 = 2 because the click row sorts after the view row (eid
    # tiebreak) — same µs still counts as strictly after


def test_funnel_within_budget(spark):
    rows = [
        ("u1", 1, "2024-01-01 00:00:00", "view"),
        ("u1", 2, "2024-01-03 00:00:00", "click"),      # 48h later
        ("u1", 3, "2024-01-03 01:00:00", "purchase"),
        # u2 stays inside the budget
        ("u2", 4, "2024-01-01 00:00:00", "view"),
        ("u2", 5, "2024-01-01 12:00:00", "click"),
        ("u2", 6, "2024-01-01 23:00:00", "purchase"),
    ]
    got = _depths(spark, rows, within_seconds=24 * 3600)
    assert got == {"u1": 1, "u2": 3}
    # budget anchors at the FIRST view: a later re-view doesn't reset
    rows.append(("u1", 7, "2024-01-02 23:30:00", "view"))
    got = _depths(spark, rows, within_seconds=24 * 3600)
    assert got["u1"] == 1


def test_funnel_counts_monotone(spark):
    rows = [
        ("u1", 1, "2024-01-01 00:00:00", "view"),
        ("u1", 2, "2024-01-01 01:00:00", "click"),
        ("u1", 3, "2024-01-01 02:00:00", "purchase"),
        ("u2", 4, "2024-01-01 00:00:00", "view"),
        ("u2", 5, "2024-01-01 01:00:00", "click"),
        ("u3", 6, "2024-01-01 00:00:00", "view"),
        ("u4", 7, "2024-01-01 00:00:00", "error"),
    ]
    out = funnel_counts(
        _ev(spark, rows), "user_id", "ts", "event_type", STAGES,
        tiebreak_col="eid",
    ).collect()
    assert [(r.stage, r.stage_name, r.n_users) for r in out] == [
        (1, "view", 3), (2, "click", 2), (3, "purchase", 1),
    ]


def test_funnel_plan_single_exchange(spark):
    """All chained windows share one partitioning+sort: exactly one
    exchange before the per-user aggregate."""
    rows = [("u1", 1, "2024-01-01 00:00:00", "view")]
    df = funnel_depth(
        _ev(spark, rows), "user_id", "ts", "event_type", STAGES,
        tiebreak_col="eid",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    # one for the windows; the groupBy reuses the user_id partitioning
    assert n_exchanges <= 2, plan


def test_retention_triangle_hand_oracle(spark):
    from beats_spark.funnel import retention_triangle

    rows = [
        # u1 first Jan1 08:00 → offsets 0 (12h), 1 (25h), 2 (71h)
        ("u1", "2024-01-01 08:00:00"),
        ("u1", "2024-01-01 20:00:00"),
        ("u1", "2024-01-02 09:00:00"),
        ("u1", "2024-01-04 07:00:00"),
        # u2 first Jan3 12:00 → cohort floor(2.5) = 2
        ("u2", "2024-01-03 12:00:00"),
        # u3: offsets anchor at ITS first event, not calendar days —
        # the 22:00 next-day event is 23h later → still offset 0
        ("u3", "2024-01-01 23:00:00"),
        ("u3", "2024-01-02 22:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = retention_triangle(df, "user_id", "ts", period_seconds=86_400)
    got = {(r.cohort, r.offset): r.n_users for r in out.collect()}
    assert got == {
        (0, 0): 2,   # u1 + u3 within 24h of their firsts
        (0, 1): 1,   # u1 at 25h
        (0, 2): 1,   # u1 at 71h
        (2, 0): 1,   # u2
    }


def test_session_paths_hand_oracle(spark):
    """Gap splits, tie-broken order at equal timestamps, the 5-event
    opening cap, and the (n desc, path) total order — against a
    hand-computed expectation."""
    from beats_spark.funnel import session_paths

    us = 1_700_000_000_000_000
    H12 = 43_200_000_000
    rows = [
        # u1 session 1: a>b  (tie at identical ts: event_id orders b after a)
        (1, us, 10, "a"), (1, us, 11, "b"),
        # u1 session 2 (gap > 12h): 7 events -> path capped at first 5
        *[(1, us + H12 + (1 + i) * 1_000_000, 20 + i, t)
          for i, t in enumerate(["a", "b", "c", "d", "e", "f", "g"])],
        # u2: single-event session with path 'a>b'-colliding? no: 'a'
        (2, us, 30, "a"),
        # u2 second session: a>b again (shared path with u1 s1)
        (2, us + 2 * H12, 31, "a"), (2, us + 2 * H12 + 5_000_000, 32, "b"),
    ]
    df = spark.createDataFrame(
        [(u, t // 1_000_000, e, ty) for u, t, e, ty in rows],
        "user_id long, sec long, event_id long, event_type string",
    ).select("user_id", F.timestamp_seconds("sec").alias("ts"), "event_id",
             "event_type")
    got = [(r.path, r.n_sessions) for r in session_paths(df).collect()]
    assert got == [("a>b", 2), ("a", 1), ("a>b>c>d>e", 1)]
    plan = session_paths(df)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_streaming_funnel_matches_batch_across_microbatches(spark, tmp_path):
    """Verdict-r04 item 9: the GroupState funnel automaton ends at
    EXACTLY the batch engine's per-user depth, with stage transitions
    split across micro-batch files (u1's click lands in file 2, its
    purchase in file 3; u3's purchase arrives BEFORE its click and
    must not count; u4's click blows the within-budget)."""
    import os

    from beats_spark.streaming import streaming_funnel_depth

    rows = [
        ("u1", 1, "2024-01-01 00:00:00", "view"),
        ("u2", 2, "2024-01-01 00:00:01", "view"),
        ("u3", 3, "2024-01-01 00:00:02", "purchase"),   # out of order
        ("u1", 4, "2024-01-01 00:10:00", "click"),
        ("u3", 5, "2024-01-01 00:10:01", "view"),
        ("u4", 6, "2024-01-01 00:10:02", "view"),
        ("u1", 7, "2024-01-01 00:20:00", "purchase"),
        ("u3", 8, "2024-01-01 00:20:01", "click"),
        ("u4", 9, "2024-01-01 02:20:02", "click"),      # past 1h budget
        ("u2", 10, "2024-01-01 00:20:03", "unknown"),
    ]
    within = 3600.0
    batch = funnel_depth(
        _ev(spark, rows), "user_id", "ts", "event_type", STAGES,
        within_seconds=within, tiebreak_col="eid",
    )
    want = {r.user_id: r.depth for r in batch.collect()}

    src = str(tmp_path / "src")
    os.makedirs(src)
    pdf = (
        _ev(spark, rows)
        .withColumn("ts_us", F.unix_micros("ts"))
        .select("user_id", "eid", "ts_us", "event_type")
        .toPandas()
        .sort_values("eid")
    )
    for i, part in enumerate([pdf.iloc[:4], pdf.iloc[4:7], pdf.iloc[7:]]):
        part.to_json(f"{src}/f{i}.json", orient="records", lines=True)
    pin_file_order(src)

    stream = (
        spark.readStream.format("json")
        .schema("user_id string, eid long, ts_us long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    out = streaming_funnel_depth(
        stream, user_col="user_id", ts_us_col="ts_us",
        type_col="event_type", stages=list(STAGES),
        within_seconds=within, tiebreak_col="eid",
    )
    emitted = []
    q = (
        out.writeStream.foreachBatch(lambda df, _: emitted.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    # final emission per user == batch depth
    final: dict = {}
    for r in emitted:
        final[r.user] = r.depth  # later micro-batches overwrite
    assert final == want, (final, want)
    assert want == {"u1": 3, "u2": 1, "u3": 2, "u4": 1}
    # intermediate emissions are monotone non-decreasing per user
    seen: dict = {}
    for r in emitted:
        assert r.depth >= seen.get(r.user, 0)
        seen[r.user] = r.depth
