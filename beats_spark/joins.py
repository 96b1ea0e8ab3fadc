"""Temporal joins Spark lacks natively: as-of join and range join.

Log-pipeline enrichment is usually point-lookup (processors/enrich.py
Lookup = broadcast hash join; the reference's translate_* family), but
two temporal shapes come up constantly in event analytics and neither
is a Spark built-in:

- **as-of join**: each left event picks the LATEST right-side version
  at-or-before its timestamp (slowly-changing dimension, price-at-time,
  config-at-time). The cache processor (enrich.py Cache) is the
  degenerate single-table form — this is the general two-table one.
- **range join**: match events to intervals containing them (incident
  windows, maintenance windows, sessions from another system).

Both have naive formulations that die at scale (a theta-join explodes
into BroadcastNestedLoopJoin / cartesian + filter). The formulations
here are the shuffle-bounded ones:

- as-of: UNION the tagged sides, ONE shuffle keyed by the join key,
  per-key sort, `last(value, ignorenulls)` running window fills each
  left row from the latest preceding right row. Cost = one exchange of
  (left + right) rows carrying only the projected columns; a hot key
  is one sorted run bounded by that key's rows. No row ever multiplies.
- range: bucket time into `bucket_seconds` cells; the right side
  explodes one row per covered bucket (factor ≈ interval/bucket, bounded
  and chosen by the caller), the left maps to exactly one bucket, then
  an EQUI-join on (keys, bucket) + exact predicate refine. Each
  qualifying pair meets in exactly one bucket — the left row's — so no
  dedup pass is needed. Cost = hash join on a key that parallelizes by
  time, never a nested-loop.
- interval (event-to-event within a time window, e.g. click→purchase
  correlation): batch uses the same bucketing — a plain equi-join on
  the key followed by a range filter materializes EVERY within-key
  pair before filtering, which is quadratic on a hot key; adding the
  time bucket to the equi-join key bounds each hash cell by the
  window span. Streaming uses Spark's native watermarked
  stream-stream join (StreamingSymmetricHashJoin): the range
  condition on the two event-time columns lets Spark derive a state
  watermark and evict buffered rows once no future match is possible
  — the physically right strategy for unbounded input, where
  bucketing would buffer forever anyway.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def _us(col) -> "F.Column":
    # NTZ → LTZ before epoch math (session tz is UTC); integer µs so
    # comparisons and bucket floors are exact
    return F.unix_micros(col.cast("timestamp_ltz"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """Backward as-of LEFT join: every left row gains `right_cols`
    from the right row with the greatest `right_ts` <= `left_ts`
    (< when `strict`) within the same `on` key — NULLs when no right
    row precedes it. Matches DuckDB/pandas ASOF JOIN semantics
    including the equal-timestamp case (>= matches; the union-window
    realizes it by sorting right rows before left ones at equal
    timestamps, after left ones when strict).

    Ties among MULTIPLE right rows with identical (key, right_ts) are
    engine-order-dependent (as in every asof implementation) — dedupe
    the right side first if that can occur.
    """
    lcols = left.columns
    dup = [c for c in right_cols if c in lcols]
    if dup:
        raise ValueError(f"asof_join: right_cols collide with left columns: {dup}")
    r_prio = 2 if strict else 0  # left rows sort at 1
    l = left.select(
        *lcols,
        _us(F.col(left_ts)).alias("__ts__"),
        F.lit(1).alias("__prio__"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        *[F.col(k) for k in on],
        _us(F.col(right_ts)).alias("__ts__"),
        F.lit(r_prio).alias("__prio__"),
        *[F.col(c) for c in right_cols],
    ).select(*lcols, "__ts__", "__prio__", *right_cols)

    from pyspark.sql import Window

    w = (
        Window.partitionBy(*[F.col(k) for k in on])
        .orderBy("__ts__", "__prio__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        *lcols,
        "__prio__",
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    return filled.filter(F.col("__prio__") == 1).drop("__prio__")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    on: Sequence[str] = (),
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join of left events to right intervals containing them:
    `right_start <= left_ts <= right_end` (inclusive bounds) plus
    equality on `on`. Output columns = left columns + right columns
    (names must not collide; project/rename first).

    `bucket_seconds` trades the right side's fan-out (≈ interval
    length / bucket, +1) against join-key selectivity — set it near
    the typical interval length. Correct for any value: each
    qualifying pair meets in exactly one bucket (the left row's), so
    the result needs no deduplication."""
    dup = [c for c in right.columns if c in left.columns and c not in on]
    if dup:
        raise ValueError(f"range_join: overlapping column names: {dup}")
    b = F.lit(int(bucket_seconds) * 1_000_000)
    l = left.withColumn("__bkt__", F.floor(_us(F.col(left_ts)) / b))
    r = right.withColumn(
        "__bkt__",
        F.explode(
            F.sequence(
                F.floor(_us(F.col(right_start)) / b),
                F.floor(_us(F.col(right_end)) / b),
            )
        ),
    )
    joined = l.join(r, on=[*on, "__bkt__"], how="inner").filter(
        (_us(F.col(left_ts)) >= _us(F.col(right_start)))
        & (_us(F.col(left_ts)) <= _us(F.col(right_end)))
    )
    return joined.drop("__bkt__")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    include_lower: bool = True,
    include_upper: bool = True,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Inner event-to-event interval join: pair (l, r) when
    `l.left_ts + lower_seconds <= r.right_ts <= l.left_ts +
    upper_seconds` within the same `on` key (bound strictness per the
    `include_*` flags). The click→purchase / request→response
    correlation shape.

    Formulation: equivalently `r.right_ts - upper <= l.left_ts <=
    r.right_ts - lower`, i.e. a range join where each right event
    carries a derived interval over left time — so the same bucketed
    equi-join applies: left maps to its one time bucket, right
    explodes over the ≤ `(upper-lower)/bucket + 1` buckets its derived
    interval covers, join on (keys, bucket), refine on the exact µs
    delta. Each qualifying pair meets in exactly one bucket (the left
    row's), no dedup. Never a per-key cartesian: a hot key's hash cell
    is bounded by the window span, not the key's row count.

    Default `bucket_seconds` = the window span (right fan-out exactly
    2). Output = left columns + right columns (non-`on` names must not
    collide). For unbounded streams use `interval_join_stream`."""
    if upper_seconds < lower_seconds:
        raise ValueError("interval_join: upper_seconds < lower_seconds")
    dup = [c for c in right.columns if c in left.columns and c not in on]
    if dup:
        raise ValueError(f"interval_join: overlapping column names: {dup}")
    if bucket_seconds is None:
        bucket_seconds = max(1, int(upper_seconds - lower_seconds))
    b = F.lit(int(bucket_seconds) * 1_000_000)
    lo = F.lit(int(lower_seconds * 1_000_000))
    hi = F.lit(int(upper_seconds * 1_000_000))
    l = left.withColumn("__bkt__", F.floor(_us(F.col(left_ts)) / b))
    r = right.withColumn(
        "__bkt__",
        F.explode(
            F.sequence(
                F.floor((_us(F.col(right_ts)) - hi) / b),
                F.floor((_us(F.col(right_ts)) - lo) / b),
            )
        ),
    )
    delta = _us(F.col(right_ts)) - _us(F.col(left_ts))
    cond = (delta >= lo) if include_lower else (delta > lo)
    cond = cond & ((delta <= hi) if include_upper else (delta < hi))
    return l.join(r, on=[*on, "__bkt__"], how="inner").filter(cond).drop("__bkt__")


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    watermark: str = "1 hour",
    include_lower: bool = True,
    include_upper: bool = True,
) -> DataFrame:
    """Streaming twin of `interval_join` over two `readStream` inputs,
    same match semantics, built on Spark's native watermarked
    stream-stream inner join. Both sides get `withWatermark` on their
    event-time column; the join condition carries the time range
    BETWEEN the two event-time columns directly, which is what lets
    Spark derive per-side state watermarks and evict buffered rows as
    soon as no future match is possible (state ∝ watermark delay +
    window span, not stream length).

    `watermark` bounds how out-of-order each side may arrive and
    still match: a row later than that against its side's max event
    time can be dropped from the join state before its partner shows
    up. Works under `trigger(availableNow=True)` for drain-and-stop
    jobs (matches emit as both sides arrive; inner join needs no
    window-close wait). Ref analog: the reference has no cross-stream
    correlation — events pair only in ES after indexing; this is the
    in-pipeline form."""
    dup = [c for c in right.columns if c in left.columns and c not in on]
    if dup:
        raise ValueError(f"interval_join_stream: overlapping column names: {dup}")
    l = left.withWatermark(left_ts, watermark).alias("__L__")
    r = right.withWatermark(right_ts, watermark).alias("__R__")
    lts = F.col(f"__L__.{left_ts}")
    rts = F.col(f"__R__.{right_ts}")
    lo_bound = lts + F.expr(f"INTERVAL {int(lower_seconds)} SECONDS")
    hi_bound = lts + F.expr(f"INTERVAL {int(upper_seconds)} SECONDS")
    cond = (rts >= lo_bound) if include_lower else (rts > lo_bound)
    cond = cond & ((rts <= hi_bound) if include_upper else (rts < hi_bound))
    for k in on:
        cond = cond & (F.col(f"__L__.{k}") == F.col(f"__R__.{k}"))
    return l.join(r, cond, "inner").select(
        *[F.col(f"__L__.{c}").alias(c) for c in left.columns],
        *[F.col(f"__R__.{c}").alias(c) for c in right.columns if c not in on],
    )
