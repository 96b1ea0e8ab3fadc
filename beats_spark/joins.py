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
