"""Z-order (Morton-curve) multi-dimensional layout clustering — the
Delta/Iceberg `OPTIMIZE ZORDER BY` analog for the manifest sink's
parquet files.

A 1-D sorted layout prunes on its lead column only: a file-stats scan
over data sorted by `user_id` must read EVERY file for a time-slice
predicate, because each file's ts min/max spans the whole domain.
Interleaving the bits of k rank-bucketed dimensions into one Morton
key and range-partitioning on it gives every file a small rectangle
in k-space, so min/max footer stats prune on ANY dimension
(`checkpoint.collect_file_stats` feeds the manifest reader's
`col_bounds` pruning — the existing read side).
Public background: Morton 1966; the Delta Lake OPTIMIZE ZORDER and
Iceberg sort-order rewrite documents describe the identical
write-side device.

Everything is BIGINT arithmetic — bucket = (v - lo) * 2^bits div
(hi - lo + 1), then bit interleave — so a DuckDB twin reproduces the
keys bit-for-bit (`zvalue_sql` renders the same expression in ANSI
SQL). No floats: a double divide would round differently from the
integer div at bucket boundaries (the q63 lesson).

SCALE SHAPE: the z-key is pure scan-stage codegen (shift/and/add on
two columns); the only movement is the ONE repartitionByRange
exchange every layout rewrite needs anyway. Range boundaries come
from Spark's reservoir sample of the key — at 100 TB that is the
same mechanism a sort would use, and AQE coalesces skewed ranges.
Reference analog: Beats has no storage layout surface; this belongs
to the engine's Iceberg-semantics sink (checkpoint.py) the way
bucketing.py does.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue", "zvalue_sql", "zorder_key", "write_zordered"]


def zvalue(buckets: Sequence[Column], bits: int) -> Column:
    """Interleave the low `bits` bits of k non-negative rank columns:
    bit i of column j lands at position i*k + j (LSB-first round
    robin), the classic Morton construction. Disjoint targets, so the
    combine is a plain sum — one codegen span, no UDF."""
    k = len(buckets)
    if k < 2:
        raise ValueError(f"zvalue: need >= 2 dimensions, got {k}")
    if bits * k > 62:
        raise ValueError(f"zvalue: {bits} bits x {k} dims overflows BIGINT")
    out: Column | None = None
    for j, c in enumerate(buckets):
        for i in range(bits):
            term = F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j)
            out = term if out is None else out + term
    return out


def zvalue_sql(bucket_exprs: Sequence[str], bits: int) -> str:
    """The DuckDB/ANSI twin of `zvalue` over rendered bucket
    expressions — identical shift/and arithmetic, so oracle keys
    match Spark's bit-for-bit."""
    # each term fully parenthesized: DuckDB/Postgres bind `+` TIGHTER
    # than `<<`, so a bare `a << 5 + b << 7` parses as ((a << (5+b)) << 7)
    terms = []
    for j, e in enumerate(bucket_exprs):
        for i in range(bits):
            terms.append(f"(((({e}) >> {i}) & 1) << {i * len(bucket_exprs) + j})")
    return "(" + " + ".join(terms) + ")"


def _bucket_expr(col: str, lo: int, hi: int, bits: int) -> str:
    """(v - lo) * 2^bits div span as a rendered Spark-SQL expression —
    integer div, never a rounded double (Spark `div` and DuckDB `//`
    agree on the non-negative operands here; the oracle renders the
    `//` form itself)."""
    span = hi - lo + 1
    return f"(({col} - {lo}) * {1 << bits}) div {span}"


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 12,
    key_col: str = "__zkey__",
    keep_buckets: bool = False,
) -> DataFrame:
    """Add the Morton key over `cols` (non-negative BIGINT dims).
    Per-column min/max come from one 2-row aggregate collected
    driver-side (two scalars per dim — bounded, the n=count()
    pattern), then the key is literal-folded scan-stage arithmetic.
    keep_buckets=True also materializes the per-dim rank columns
    (`__zb_<col>__`) for callers that report rectangle bounds."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
    stats = df.agg(*aggs).collect()[0]
    buckets = []
    for c in cols:
        lo, hi = int(stats[f"lo_{c}"]), int(stats[f"hi_{c}"])
        buckets.append(F.expr(_bucket_expr(c, lo, hi, bits)))
    out = df.withColumn(key_col, zvalue(buckets, bits))
    if keep_buckets:
        for c, b in zip(cols, buckets):
            out = out.withColumn(f"__zb_{c}__", b)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 12,
    num_files: int = 16,
) -> None:
    """Rewrite `df` as `num_files` parquet files clustered on the
    Morton curve of `cols`: range-partition + in-partition sort on
    the key, key dropped before write (internal `__*` column). Each
    file's footer min/max for EVERY z-ordered column then covers a
    small rectangle — `collect_file_stats` + a rectangle predicate
    prune files on any dimension, not just a lead sort column."""
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(num_files, F.col("__zkey__"))
        .sortWithinPartitions("__zkey__")
        .drop("__zkey__")
        .write.mode("overwrite")
        .parquet(path)
    )
