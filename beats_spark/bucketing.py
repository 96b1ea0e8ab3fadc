"""Storage bucketing: pre-shuffled tables for exchange-free joins.

The biggest repeated cost in a 100 TB pipeline is re-shuffling the
same fact table on the same key for every downstream join or
aggregation. Bucketing pays that shuffle ONCE at write time: rows are
hash-clustered into a fixed number of bucket files per partition
(`df.write.bucketBy(n, key)`), and Spark's scan reports the bucket
spec as its output partitioning — so a join of two tables bucketed on
the join key with the same bucket count plans with NO Exchange on
either side (and with `sortBy`, no Sort either: the sort-merge join
streams the bucket files directly).

When it pays: a table joined/aggregated on one hot key by many
consumers (the enrichment dimension pattern, dedup-by-doc_id chains,
repeated fact-to-fact correlation). When it doesn't: one-shot joins
(the write-side shuffle is the same shuffle you were avoiding) or
keys you rarely join on. Bucket count is fixed at write time — size
it so one bucket ≈ one task's memory at the biggest consumer
(reference point: 100 TB / 4096 buckets ≈ 25 GB per bucket per
partition-slice; combine with date partitioning to keep files sane).

Reference analog: none — Beats ships events to ES, where routing
shards play this role (`libbeat/outputs/elasticsearch`); in a
Spark-first engine the table layout IS the routing.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a parquet table hash-bucketed by `keys` (and
    sorted within buckets by them when `sort`, enabling sort-free
    SMJ). Bucketing metadata lives in the session catalog, so readers
    must go through `spark.table(table)` — a plain path read sees
    only parquet files and loses the layout guarantee."""
    w = df.write.mode(mode).format("parquet").bucketBy(int(num_buckets), *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket keys with a
    sort-merge hint (broadcast would hide the layout win at test
    scale; at real scale SMJ is what you'd get anyway). With matching
    bucket specs the physical plan contains ZERO Exchange operators —
    asserted in tests/test_bucketing.py."""
    l = spark.table(left_table).hint("merge")
    r = spark.table(right_table)
    return l.join(r, on=list(on))
