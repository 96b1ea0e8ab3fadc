"""Geo operators — the ES geo_point aggregation surface over events:
geohash encode, geohash_grid aggregation, geo_bounding_box filter and
geo_centroid, as exact integer MICRODEGREE (udeg) arithmetic.

Reference analog: Beats ships `host.geo.location` / client.geo fields
via add_host_metadata and the geoip-style enrichments
(libbeat/processors/add_host_metadata/add_host_metadata.go,
docs/fields: *.geo.location), and every Kibana map panel aggregates
them with Elasticsearch geohash_grid / geo_centroid over a
geo_bounding_box filter. This module is that aggregation stack,
Spark-first.

Exactness doctrine (the repo rule): coordinates are carried as int64
microdegrees, so the quantizer `(v + off) * 2^b div span` and the
Morton interleave are pure BIGINT arithmetic a DuckDB twin reproduces
bit-for-bit — no float ever touches a value an oracle must hash.
(Degrees-as-double inputs convert at the boundary with
floor(v * 1e6), the same convention the testdata synthesizers use.)

Geohash construction: the canonical alternating-bisection algorithm
(Niemeyer 2008, public domain; en.wikipedia.org/wiki/Geohash) is
equivalent to quantizing each axis to its bit budget and interleaving
MSB-first starting with longitude. With the axes quantized to b bits
each, that interleave IS the 2-D Morton key `layout.zvalue([latq,
lonq], b)` (lon lands on the odd bit positions), so this module
reuses the z-order primitives. Odd precisions use the geohash
hierarchy property — the precision-p hash is the first p characters
of the precision-(p+1) hash — computing at the next even precision
and taking the prefix.

SCALE SHAPE: encode is scan-stage codegen (shift/and/add on two
columns — no UDF); geohash_grid is ONE map-side-combined groupBy
whose key cardinality is bounded by 32^precision regardless of input
rows, exactly why ES caps map tiles the same way. geo_bounding_box is
a scan-stage predicate that pushes to parquet row-group stats when
lat/lon are stored columns. Nothing here shuffles more than
(cell, partial-aggregate) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.layout import zvalue, zvalue_sql

__all__ = [
    "GEOHASH32",
    "geohash_udeg",
    "geohash_udeg_sql",
    "geo_bounding_box_udeg",
    "geohash_grid",
    "geohash_encode_py",
]

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"

_LAT_SPAN = 180_000_000
_LON_SPAN = 360_000_000


def _plan(precision: int) -> tuple[int, int]:
    """(even compute precision, per-axis bits). Geohash precision p
    uses 5p bits alternating lon-first; odd p is the prefix of p+1."""
    if not 1 <= precision <= 12:
        raise ValueError(f"geohash precision must be 1..12, got {precision}")
    pe = precision + (precision % 2)
    return pe, 5 * pe // 2


def _quant(expr: str, offset: int, span: int, b: int, dialect: str) -> str:
    """Quantize a udeg expression to b bits: (v + offset) * 2^b div
    span, clamped to 2^b - 1 (the +90/+180 pole/antimeridian edge maps
    into the last cell, as the canonical bisection does). Rendered for
    either engine — `div` vs `//` agree here (non-negative operands).
    The input is widened to BIGINT first: microdegrees FIT int32, so
    INT-typed geo columns are natural, and without the cast the
    * 2^b product overflows 32-bit arithmetic for every precision
    (ANSI Spark throws, DuckDB traps)."""
    d = "div" if dialect == "spark" else "//"
    return (
        f"least(((CAST({expr} AS BIGINT) + {offset}) * {1 << b})"
        f" {d} {span}, {(1 << b) - 1})"
    )


def geohash_udeg(lat_expr: str, lon_expr: str, precision: int) -> Column:
    """Geohash string of (lat, lon) integer-microdegree SQL
    expressions. Pure codegen: two quantizers, one Morton interleave,
    base32 chars via element_at on a literal array."""
    pe, b = _plan(precision)
    latq = F.expr(_quant(lat_expr, 90_000_000, _LAT_SPAN, b, "spark"))
    lonq = F.expr(_quant(lon_expr, 180_000_000, _LON_SPAN, b, "spark"))
    h = zvalue([latq, lonq], b)
    alpha = F.array(*[F.lit(c) for c in GEOHASH32])
    chars = [
        F.element_at(
            alpha,
            (F.shiftright(h, 5 * (pe - 1 - c)).bitwiseAND(F.lit(31)) + 1).cast(
                "int"
            ),
        )
        for c in range(precision)
    ]
    return chars[0] if precision == 1 else F.concat(*chars)


def geohash_udeg_sql(lat_expr: str, lon_expr: str, precision: int) -> str:
    """The DuckDB twin of `geohash_udeg` — identical quantize +
    interleave arithmetic rendered as one ANSI expression (callers
    put it in a CTE once; the hash integer is inlined per character,
    so keep precision small in oracles)."""
    pe, b = _plan(precision)
    latq = _quant(lat_expr, 90_000_000, _LAT_SPAN, b, "duckdb")
    lonq = _quant(lon_expr, 180_000_000, _LON_SPAN, b, "duckdb")
    h = zvalue_sql([latq, lonq], b)
    chars = [
        f"substr('{GEOHASH32}', CAST((({h} >> {5 * (pe - 1 - c)}) & 31) "
        f"+ 1 AS INTEGER), 1)"
        for c in range(precision)
    ]
    return chars[0] if precision == 1 else "(" + " || ".join(chars) + ")"


def geo_bounding_box_udeg(
    lat: Column,
    lon: Column,
    top: int,
    left: int,
    bottom: int,
    right: int,
) -> Column:
    """ES geo_bounding_box over udeg columns: inclusive edges; a box
    with left > right wraps the antimeridian (ES semantics)."""
    latp = (lat <= F.lit(top)) & (lat >= F.lit(bottom))
    if left <= right:
        return latp & (lon >= F.lit(left)) & (lon <= F.lit(right))
    return latp & ((lon >= F.lit(left)) | (lon <= F.lit(right)))


def geohash_grid(
    df: DataFrame,
    lat_expr: str,
    lon_expr: str,
    precision: int,
    value_col: str | None = None,
    child_precision: int | None = None,
    cell_col: str = "geohash",
) -> DataFrame:
    """ES geohash_grid + geo_centroid in one pass: group by the
    precision-p cell, emit n, optional exact value sum, the centroid
    as exact floor-divided udeg (pmod-subtraction floor — sums can be
    negative, and engine `div`/`//` truncate toward zero, the q63
    lesson), and optionally the number of DISTINCT occupied child
    cells at a finer precision (one substring groupBy thanks to the
    prefix-hierarchy property). Output ≤ 32^precision rows.

    Plan shape (verified via explain): zero Python UDFs; without
    child_precision it is the single map-side-combined groupBy; with
    it, Spark's exact-distinct expansion adds one exchange keyed on
    (cell, child-cell) — but the partial aggregate before it reduces
    the shuffle to ≤ occupied child cells (≤ 32^child_precision rows)
    regardless of input size, so both shapes are cell-bounded, never
    row-bounded."""
    gp = precision if child_precision is None else child_precision
    if gp < precision:
        raise ValueError("child_precision must be >= precision")
    keyed = df.select(
        geohash_udeg(lat_expr, lon_expr, gp).alias("__gh"),
        F.expr(lat_expr).cast("long").alias("__lat"),
        F.expr(lon_expr).cast("long").alias("__lon"),
        *([F.col(value_col).alias("__v")] if value_col else []),
    )
    aggs = [
        F.count("*").alias("n"),
        F.sum("__lat").alias("__slat"),
        F.sum("__lon").alias("__slon"),
    ]
    if value_col:
        aggs.append(F.sum("__v").alias("sum_v"))
    if child_precision is not None:
        aggs.append(F.count_distinct("__gh").alias("child_cells"))
    cell = (
        F.col("__gh")
        if child_precision is None
        else F.substring("__gh", 1, precision)
    )
    out = keyed.groupBy(cell.alias(cell_col)).agg(*aggs)
    # exact floor centroid: (s - pmod(s, n)) is divisible by n, so the
    # truncating integer div IS the floor — no double ever involved
    floordiv = "(({s} - pmod({s}, n)) div n)"
    return out.select(
        cell_col,
        "n",
        *(["sum_v"] if value_col else []),
        *(["child_cells"] if child_precision is not None else []),
        F.expr(floordiv.format(s="__slat")).alias("c_lat_udeg"),
        F.expr(floordiv.format(s="__slon")).alias("c_lon_udeg"),
    )


def geohash_encode_py(lat_udeg: int, lon_udeg: int, precision: int) -> str:
    """Pure-Python reference: the canonical alternating-bisection
    geohash (lon bit first), on the same udeg grid. Bounds are scaled
    by 2^64 so every midpoint is exact (naive integer mids drift after
    ~8 halvings — 180e6 = 2^8 · 703125). Used by tests to pin the
    Morton construction against the textbook algorithm and the
    published test vector."""
    S = 1 << 64
    lat_v, lon_v = lat_udeg * S, lon_udeg * S
    lat_lo, lat_hi = -90_000_000 * S, 90_000_000 * S
    lon_lo, lon_hi = -180_000_000 * S, 180_000_000 * S
    out, bit, ch, even = [], 0, 0, True
    while len(out) < precision:
        v, lo, hi = (lon_v, lon_lo, lon_hi) if even else (lat_v, lat_lo, lat_hi)
        mid = (lo + hi) // 2
        if v >= mid:
            ch, lo = ch * 2 + 1, mid
        else:
            ch, hi = ch * 2, mid
        if even:
            lon_lo, lon_hi = lo, hi
        else:
            lat_lo, lat_hi = lo, hi
        even = not even
        bit += 1
        if bit == 5:
            out.append(GEOHASH32[ch])
            bit, ch = 0, 0
    return "".join(out)
