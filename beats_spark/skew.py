"""Explicit skew mitigation on the `source` column (BASELINE north_rule).

The synthetic table gives one source ~40% of all rows (FIXTURES.md §1).
Anything that shuffles on `source` (per-source aggregation, source-
partitioned sinks) would put 40% of the data in one task. Two tools:

1. `salted(df, col, buckets)` — adds `__salt__ = pmod(xxhash64(doc_id),
   buckets)`; aggregate in two phases: groupBy(source, __salt__) partial
   → groupBy(source) final. Classic two-stage skew-proof aggregation;
   the first stage is map-side-combinable so the hot key fans out over
   `buckets` reducers.
2. `repartition_salted(df, n, col)` — co-locates data for a write by
   (source, salt) instead of raw source, bounding any one task's share
   of the hot key to 1/buckets.

AQE's skewJoin handles *joins* at runtime; these handle aggregations
and writes, which AQE does not rebalance (pre-Spark-4 rebalancing only
applies to AQE shuffle reads, not partitionBy file writes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt__"


def salted(df: DataFrame, salt_src: str = "doc_id", buckets: int = 32) -> DataFrame:
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(F.col(salt_src)), F.lit(buckets)))


def salted_count(
    df: DataFrame, keys: list[str], salt_src: str = "doc_id", buckets: int = 32
) -> DataFrame:
    """Two-phase skew-proof count: partial per (keys, salt) then final
    per keys. The partial stage gets map-side combine; the hot key is
    spread over `buckets` partitions."""
    partial = (
        salted(df, salt_src, buckets)
        .groupBy(*keys, SALT_COL)
        .agg(F.count(F.lit(1)).alias("__c__"))
    )
    return partial.groupBy(*keys).agg(F.sum("__c__").alias("events"))


def repartition_salted(
    df: DataFrame, num_partitions: int, key: str, salt_src: str = "doc_id", buckets: int = 32
) -> DataFrame:
    out = salted(df, salt_src, buckets).repartition(
        num_partitions, F.col(key), F.col(SALT_COL)
    )
    return out.drop(SALT_COL)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_src: str = "doc_id",
    buckets: int = 32,
) -> DataFrame:
    """Skew-proof equi-join for a dim too big to broadcast: the fact
    side salts each row (hash of `salt_src`, NOT of the join key — the
    hot key must spread), the dim side replicates each row across all
    `buckets` salts (explode of a sequence literal — one codegen
    Generate, no shuffle of its own), and the join runs on
    (on, __salt__), fanning the hot key over `buckets` reducers.

    Cost model: dim moves `buckets`× — use only when
    |dim| * buckets << |fact partition skew saved|, i.e. medium dims
    joined on keys where one value holds >> 1/parallelism of the
    facts. AQE's skew-join split handles this adaptively when it can;
    this form is for when it can't: bucketed layouts it would break,
    sort-merge plans feeding a downstream co-partitioned op, or
    deterministic plan shape for regression-tested jobs."""
    dup = [c for c in dim.columns if c in fact.columns and c != on]
    if dup:
        raise ValueError(f"salted_join: overlapping column names: {dup}")
    if SALT_COL in fact.columns or SALT_COL in dim.columns:
        raise ValueError(
            f"salted_join: an input already carries {SALT_COL!r} — "
            "drop or rename it first (it would be silently clobbered)"
        )
    f = salted(fact, salt_src, buckets)
    d = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>"))
    )
    return f.join(d, on=[on, SALT_COL]).drop(SALT_COL)
