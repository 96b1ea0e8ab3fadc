"""Ordered event funnel (ClickHouse windowFunnel / ES sequence analog).

How deep into an ordered stage chain (view → click → purchase …) does
each user get? Stage k counts only when a stage-k event occurs
STRICTLY AFTER some event that completed stage k−1, optionally within
a time budget of the user's first stage-0 event. Beats ships the raw
events and leaves journeys to the store; this is the in-pipeline form.

Spark-first shape: the stage automaton unrolls into k chained window
expressions over ONE (user, time) partition — `reached_k(row) =
type == stages[k] AND max(reached_{k-1}) over [unbounded, -1] = 1`.
All windows share the same partitioning and sort, so the plan is one
exchange + one sort feeding k Window operators back-to-back (no
re-exchange, no re-sort — verified in the physical plan). A hot user
is one sorted run bounded by that user's events; no row multiplies,
and there is no per-user collect_list (which would materialize whole
user histories as single rows).

Determinism: window order carries an integer tiebreak (µs timestamps
collide in real data), and every emitted quantity is a count.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(ts_col: str) -> Column:
    return F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))


def funnel_depth(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
    within_seconds: float | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-user funnel depth: one row per user with `depth` = the
    number of consecutive stages completed in order (0 = never did
    stage 0). With `within_seconds`, stages past the first must also
    land within that budget of the user's FIRST stage-0 event
    (windowFunnel's window argument)."""
    if len(stages) < 2:
        raise ValueError("funnel_depth: need at least 2 stages")
    order = [_us(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w_prev = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = F.col(type_col)
    out = df
    reached_cur = (t == stages[0]).cast("int")
    out = out.withColumn("__r0__", reached_cur)
    if within_seconds is not None:
        # earliest stage-0 µs among strictly-previous rows
        first0 = F.min(F.when(t == stages[0], _us(ts_col))).over(w_prev)
        budget_us = F.lit(int(within_seconds * 1_000_000))
    for k in range(1, len(stages)):
        prev_done = F.coalesce(F.max(F.col(f"__r{k-1}__")).over(w_prev), F.lit(0))
        cond = (t == stages[k]) & (prev_done == 1)
        if within_seconds is not None:
            cond = cond & (_us(ts_col) <= first0 + budget_us)
        out = out.withColumn(f"__r{k}__", cond.cast("int"))
    agg = [
        F.max(F.col(f"__r{k}__")).alias(f"__s{k}__") for k in range(len(stages))
    ]
    per_user = out.groupBy(user_col).agg(*agg)
    # depth = longest prefix of completed stages (reached_k already
    # implies reached_{k-1} happened earlier, so the sum IS the prefix)
    depth = sum(F.col(f"__s{k}__") for k in range(len(stages)))
    return per_user.select(F.col(user_col), depth.cast("int").alias("depth"))


def retention_triangle(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period_seconds: int,
    epoch_us: int = 1_704_067_200_000_000,  # 2024-01-01 UTC
) -> DataFrame:
    """Cohort retention triangle: users bucketed by the period of
    their FIRST event (`cohort`), counted distinct in each period
    `offset` after it — the classic product-analytics rollup.

    Scale shape: the user's first-event time comes from a window min
    over the (user) partition — ONE exchange of the facts, no join
    against a user-dimension table (users grow ∝ corpus, so the
    firsts table is never broadcastable; the window avoids shuffling
    it at all). The distinct-count rollup's output is
    |cohorts| × |offsets| rows — bounded by (time range / period)²,
    independent of corpus size.

    Determinism: period indices divide exact integer µs as IEEE
    doubles then floor — both engines round identically (quotient
    error ≪ the 1 µs integer gap to the nearest period boundary)."""
    us = _us(ts_col)
    w = Window.partitionBy(user_col)
    fu = F.min(us).over(w)
    per = F.lit(int(period_seconds) * 1_000_000)
    return (
        df.select(
            F.col(user_col),
            F.floor((fu - F.lit(int(epoch_us))) / per).alias("cohort"),
            F.floor((us - fu) / per).alias("offset"),
        )
        .groupBy("cohort", "offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
        .orderBy("cohort", "offset")
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
    within_seconds: float | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Funnel rollup: one row per stage with `stage` (1-based),
    `stage_name`, and `n_users` = users whose depth reaches it —
    non-increasing down the chain by construction."""
    depths = funnel_depth(
        df, user_col, ts_col, type_col, stages, within_seconds, tiebreak_col
    )
    spark = df.sparkSession
    stage_rows = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(stages)], "stage int, stage_name string"
    )
    # |stages| × |users after agg| — the depth table is already the
    # small side of the pipeline; broadcast the stage dimension
    return (
        depths.join(F.broadcast(stage_rows), F.col("depth") >= F.col("stage"))
        .groupBy("stage", "stage_name")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("stage")
    )


def session_paths(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    type_col: str = "event_type",
    gap_us: int = 43_200_000_000,
    max_len: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k session opening paths — the clickstream path-mining
    rollup: sessionize per key by inactivity gap, take each session's
    first `max_len` event types in (time, tiebreak) order, join them
    into a '>'-separated path string, count sessions per path, return
    the k most common under a total order (n desc, path asc).

    Built on first-principles lag+cumsum session ids (not
    F.session_window) because the within-session ORDER matters here:
    the tiebreak column makes the order total on both engines (µs
    timestamps collide ~13x at sf0.1), which session_window's
    unordered aggregation never exposes.

    Scale shape: the lag, the running session-id sum and the
    per-session row_number all share ONE hash exchange on `key`
    (partitionBy(key, sid) is subset-clustered by key; only an
    in-partition re-sort is added). The (key, sid) path build is also
    exchange-free for the same reason; the path-count aggregate then
    moves one row per session, and top-k is TakeOrderedAndProject.
    Three window ops + one aggregate = 2 exchanges total.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    base = df.select(F.col(key), us.alias("us"), F.col(tiebreak_col), F.col(type_col))
    w = Window.partitionBy(key).orderBy("us", tiebreak_col)
    # window expressions don't nest: materialize the session-open flag,
    # then run the cumulative sum over it (same two levels as the SQL twin)
    new_s = F.when(
        F.lag("us").over(w).isNull() | ((F.col("us") - F.lag("us").over(w)) > gap_us),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wk = Window.partitionBy(key, "sid").orderBy("us", tiebreak_col)
    r = (
        base.withColumn("new_s", new_s)
        .withColumn("sid", F.sum("new_s").over(run))
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= max_len)
    )
    paths = r.groupBy(key, "sid").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", type_col))),
                lambda x: x[type_col],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(k)
    )
