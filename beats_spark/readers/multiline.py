"""Multiline merge: lines → events (libbeat/reader/multiline/).

Reference modes:
- pattern (pattern.go:43-133): merge by before/after regex predicate,
  `negate`, `match: after|before`, flush_pattern; defaults max_lines=500.
- count (counter.go): merge every N lines.
- while_pattern (while.go): merge while the pattern matches.

Batch semantics (order defined by (group_col, order_col) — the file/
offset analog): classic sessionization — mark event-start lines, running
sum over an ordered window assigns an event id, then
groupBy(event id) + concat_ws(separator, collect_list). ONE shuffle on
the group column; within-group ordering via the window sort. At scale
the window partitions by file/source, so skew follows file size — the
same physics as one Filebeat harvester per file.

Streaming: the same start-marker logic applies per key inside
applyInPandasWithState (streaming.py, later round).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from beats_spark.regex import jvm_safe

DEFAULT_MAX_LINES = 500  # pattern.go:52-58


def _start_marker(line: Column, cfg: dict[str, Any]) -> Column:
    """True where a NEW event starts (first line of a bundle)."""
    mode = cfg.get("type", "pattern")
    if mode == "pattern":
        pat = jvm_safe(cfg["pattern"])
        matched = line.rlike(pat)
        if cfg.get("negate", False):
            matched = ~matched
        match = cfg.get("match", "after")
        if match == "after":
            # lines MATCHING the (possibly negated) pattern are
            # continuations appended after the previous line
            return ~matched
        # match=before: a matching line belongs to the FOLLOWING line;
        # a new event starts where the *previous* line did not match —
        # handled by the caller via lag()
        return matched
    raise ValueError(f"multiline: unknown type {mode}")


def merge_lines(
    df: DataFrame,
    cfg: dict[str, Any],
    line_col: str = "message",
    group_col: str = "source",
    order_col: str = "offset",
    separator: str = "\n",
) -> DataFrame:
    """Lines frame → merged-events frame.

    Output: (group_col, event_index, message, n_lines, first_<order>,
    last_<order>) — offsets carried like harvester state.
    """
    line = F.col(line_col)
    mode = cfg.get("type", "pattern")
    w = Window.partitionBy(group_col).orderBy(order_col)
    if mode == "count":
        n = int(cfg["count"])
        rn = F.row_number().over(w) - 1
        df2 = df.withColumn("__evt__", F.floor(rn / n))
    elif mode == "while_pattern":
        # merge runs of matching lines; a non-matching line is its own
        # event, and a matching line after a non-matching one starts a
        # NEW run (while.go)
        matched = line.rlike(jvm_safe(cfg["pattern"]))
        if cfg.get("negate", False):
            matched = ~matched
        prev_matched = F.lag(matched, 1, False).over(w)
        start = ~matched | ~F.coalesce(prev_matched, F.lit(False))
        df2 = df.withColumn("__evt__", F.sum(start.cast("long")).over(w))
    elif mode == "pattern" and cfg.get("match", "after") == "before":
        # line matching pattern (xor negate) joins the NEXT line:
        # a new event starts when the PREVIOUS line was not a joiner
        matched = line.rlike(jvm_safe(cfg["pattern"]))
        if cfg.get("negate", False):
            matched = ~matched
        prev_joiner = F.lag(matched, 1, False).over(w)
        start = ~F.coalesce(prev_joiner, F.lit(False))
        df2 = df.withColumn("__evt__", F.sum(start.cast("long")).over(w))
    else:
        start = _start_marker(line, cfg)
        # flush_pattern (pattern.go:98-108): a line matching it closes
        # the current bundle — the FOLLOWING line starts a new event
        # regardless of its continuation status
        if cfg.get("flush_pattern"):
            prev_flush = F.lag(line.rlike(jvm_safe(cfg["flush_pattern"])), 1, False).over(w)
            start = start | F.coalesce(prev_flush, F.lit(False))
        # the very first line of a group always starts an event
        rn = F.row_number().over(w)
        start = start | (rn == 1)
        df2 = df.withColumn("__evt__", F.sum(start.cast("long")).over(w))
    max_lines = int(cfg.get("max_lines", DEFAULT_MAX_LINES))
    # enforce max_lines by sub-splitting oversized bundles
    wl = Window.partitionBy(group_col, "__evt__").orderBy(order_col)
    df2 = df2.withColumn(
        "__evt2__",
        F.concat_ws(
            "#", F.col("__evt__"), F.floor((F.row_number().over(wl) - 1) / max_lines)
        ),
    )
    out = (
        df2.groupBy(group_col, "__evt2__")
        .agg(
            # collect_list gives no ordering guarantee after a shuffle:
            # sort (offset, line) structs, then join the line parts
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col(order_col).alias("o"), line.alias("l"))
                        )
                    ),
                    lambda s: s.getField("l"),
                ),
                separator,
            ).alias("message"),
            F.count(F.lit(1)).alias("n_lines"),
            F.min(order_col).alias("first_offset"),
            F.max(order_col).alias("last_offset"),
        )
        .withColumnRenamed("__evt2__", "event_index")
    )
    return out
