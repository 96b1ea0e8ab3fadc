"""Event-time windowed rollups: tumbling metrics + user sessionization.

Beats ships raw events and delegates time rollups to the downstream
store (ES date_histogram aggregations; metricbeat's period collector,
`metricbeat/mb/module/wrapper.go` startPeriodicFetching) — the pipeline
itself only keeps pipeline-level counters (SURVEY §2.10). A Spark-first
engine expresses the rollups natively and identically over batch tables
and streams: `F.window` / `F.session_window` group-bys that run
unchanged under readStream with `withWatermark` bounding late data.

Both operators here are shuffle-once hash/sort aggregations keyed by
(window, dims) — at 100 TB the cardinality after aggregation is
bounded by (time-range / window) × |dims| (tumbling) or by the session
count (sessions partition by user_id, so skew follows the per-user
event distribution; a hot user is one sort partition, bounded by that
user's events, not the corpus).

Oracle portability (CLAUDE.md): all emitted numerics are integers —
epoch MICROSECONDS via unix_micros (DuckDB epoch_us), window starts as
epoch seconds, and value sums as floor(value·1000) "milli-units"
(IEEE double multiply + floor is bit-identical across engines; float
SUMS are order-dependent and never cross an oracle boundary).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _value_milli(value_col: str) -> Column:
    # floor(v*1000) as BIGINT: deterministic across engines AND across
    # summation orders (integer addition is associative; double sums
    # are not)
    return F.floor(F.col(value_col) * 1000).cast("long")


def _ltz(ts_col: str) -> Column:
    # NTZ parquet timestamps can't reach epoch math directly; session
    # tz is UTC so LTZ == naive-epoch semantics (flow.py precedent)
    return F.col(ts_col).cast("timestamp_ltz")


def tumbling_metrics(
    df: DataFrame,
    ts_col: str = "ts",
    every: str = "1 hour",
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
    distinct_col: str | None = None,
    watermark: str | None = None,
    slide: str | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """Fixed tumbling (or, with `slide`, overlapping sliding)
    event-time windows (ES date_histogram analog): per (window, *keys)
    → n_events, sum_value_milli (+ n_distinct when `distinct_col` is
    given). `window_start` is emitted as epoch seconds (BIGINT;
    `F.window` aligns buckets to the 1970 epoch, so for "1 hour" it
    equals floor(epoch/3600)·3600 — the arithmetic a SQL oracle
    re-derives without engine-specific bucket origins; with a slide,
    each event lands in every/slide aligned windows, which the oracle
    re-derives by unnesting the aligned start range per event).

    Streaming: pass `watermark` (e.g. "10 minutes") on a readStream
    frame — append-mode emits each window once, when the watermark
    passes its end; events arriving later than the watermark bound are
    dropped from closed windows (the documented late-data contract).
    Exact count_distinct is batch-only (Spark disallows exact distinct
    in streaming aggs) — set `approx_distinct=True` to count via
    approx_count_distinct (HLL++), which streams AND removes the
    two-phase distinct-expand exchange from the batch plan (the
    recommended 100 TB form)."""
    ts = _ltz(ts_col)
    if watermark is not None:
        df = df.withColumn("__ts_ltz__", ts).withWatermark("__ts_ltz__", watermark)
        ts = F.col("__ts_ltz__")
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_value_milli(value_col)).alias("sum_value_milli"),
    ]
    if distinct_col is not None:
        dc = (
            F.approx_count_distinct(F.col(distinct_col))
            if approx_distinct
            else F.count_distinct(F.col(distinct_col))
        )
        aggs.append(dc.alias("n_distinct"))
    win = F.window(ts, every, slide) if slide is not None else F.window(ts, every)
    out = df.groupBy(win.alias("__w__"), *[F.col(k) for k in keys]).agg(*aggs)
    return out.select(
        F.col("__w__.start").cast("timestamp_ltz").cast("double").cast("long").alias(
            "window_start"
        ),
        *[F.col(k) for k in keys],
        *[F.col(a) for a in ("n_events", "sum_value_milli")],
        *([F.col("n_distinct")] if distinct_col is not None else []),
    )


def user_sessions(
    df: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    gap: str = "12 hours",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessionization via `F.session_window`: consecutive
    events of one `key` closer than `gap` merge into one session row →
    (key, session_start_us, session_end_us, n_events,
    sum_value_milli). Start/end are min/max event times in epoch
    MICROSECONDS (integer; session_window's own `end` is last-event
    + gap — we emit the observed extent, which a lag/cumsum SQL oracle
    reproduces exactly. Events exactly `gap` apart split — Spark
    merges on interval OVERLAP, [t, t+gap) half-open — matching a
    strict `>` gap test in the oracle).

    Streaming: pass `watermark`; session windows require it in
    append mode and each session emits once it can no longer grow."""
    ts = _ltz(ts_col)
    if watermark is not None:
        df = df.withColumn("__ts_ltz__", ts).withWatermark("__ts_ltz__", watermark)
        ts = F.col("__ts_ltz__")
    us = F.unix_micros(ts)
    return (
        df.groupBy(F.session_window(ts, gap).alias("__s__"), F.col(key))
        .agg(
            F.min(us).alias("session_start_us"),
            F.max(us).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_value_milli(value_col)).alias("sum_value_milli"),
        )
        .drop("__s__")
        .select(
            F.col(key),
            "session_start_us",
            "session_end_us",
            "n_events",
            "sum_value_milli",
        )
    )
