"""Log template mining: mask variable tokens, group, rank.

The standard first pass of log analytics (Drain / Spell lineage):
replace the variable parts of a message — timestamps, IPs, UUIDs, hex
ids, numbers — with typed placeholders, so the millions of raw lines
collapse onto the handful of emitting call sites, then count per
template. Beats itself never does this (it ships raw `message` and
leaves clustering to ES ML categorization); this is the in-pipeline
form.

Spark-first shape: the mask is a chain of `regexp_replace` expressions
— one whole-stage-codegen span, no Python — and the rollup is a
groupBy on the masked string. Map-side partial aggregation collapses
each scan partition to its template set before the shuffle, so the
exchange carries ~|templates| rows per task regardless of corpus
size; the top-k with an explicit total order compiles to
TakeOrderedAndProject (no global sort).

Pattern portability: masks are authored in the RE2 ∩ java.util.regex
common subset (`\\d`, `\\b`, bounded braces, non-capturing groups) so
a DuckDB oracle can run the identical chain with the 'g' flag.
Ordering matters and is part of the contract: timestamps before IPs
before hex before bare digits — each later mask would otherwise eat
pieces of the earlier shapes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement), applied in order. Keep RE2-compatible.
DEFAULT_MASKS: tuple[tuple[str, str], ...] = (
    (r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?Z?", "<TS>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (
        r"\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
        r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\b",
        "<UUID>",
    ),
    (r"\b0x[0-9a-fA-F]+\b", "<HEX>"),
    (r"\b[0-9a-f]{8,}\b", "<HEX>"),
    (r"\d+", "<N>"),
)


def mask_message(
    col: Column, masks: Sequence[tuple[str, str]] = DEFAULT_MASKS
) -> Column:
    """The template of one message: `col` with every mask applied in
    order (regexp_replace replaces ALL occurrences)."""
    out = col
    for pat, repl in masks:
        out = F.regexp_replace(out, pat, repl)
    return out


def mine_templates(
    df: DataFrame,
    message_col: str,
    masks: Sequence[tuple[str, str]] = DEFAULT_MASKS,
    k: int | None = None,
    distinct_col: str | None = None,
) -> DataFrame:
    """Collapse `message_col` onto its templates: one row per template
    with `n` (line count) and `example` (the lexicographically first
    raw line — deterministic), plus `n_distinct` over `distinct_col`
    when given. Ordered by (n DESC, template) — a total order, so a
    `k` cutoff selects the same rows in any engine."""
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.min(F.col(message_col)).alias("example"),
    ]
    if distinct_col is not None:
        aggs.append(F.count_distinct(F.col(distinct_col)).alias("n_distinct"))
    out = (
        df.groupBy(mask_message(F.col(message_col), masks).alias("template"))
        .agg(*aggs)
        .orderBy(F.col("n").desc(), F.col("template"))
    )
    return out.limit(int(k)) if k is not None else out
