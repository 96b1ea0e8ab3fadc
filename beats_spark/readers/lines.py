"""Line-level reading (libbeat/reader/readfile/): text files → line
frames with offsets, charset decode, max_bytes truncation, and
include/exclude message filtering.

The harvester's byte-offset state (line.go:41-57) maps to
(file path, line number) lineage — Spark's text source is already
line-framed, so "offset" is the per-file line ordinal, recoverable and
monotonic exactly like Offset in filebeat/input/file/state.go:34.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def read_lines(
    spark: SparkSession,
    path: str,
    encoding: str = "utf-8",
    max_bytes: int | None = None,
    include_lines: list[str] | None = None,
    exclude_lines: list[str] | None = None,
) -> DataFrame:
    """spark.read.text + harvester-equivalent line handling.

    Output: (source, offset, message [, truncated flag via _flags]).
    Line-number offsets come from a per-file window over the input
    order. include/exclude run BEFORE anything else, matching
    harvester.go:496-519 (dropped lines still advance the offset).
    """
    if encoding.lower().replace("-", "") in ("utf8", "ascii"):
        df = spark.read.text(path).select(
            F.col("value").alias("message"),
            F.input_file_name().alias("source"),
        )
    else:
        # charset decode path (readfile/encode.go): read bytes of each
        # line lazily as binary-ish text then decode
        df = (
            spark.read.format("text")
            .option("encoding", encoding)
            .load(path)
            .select(
                F.col("value").alias("message"),
                F.input_file_name().alias("source"),
            )
        )
    w = Window.partitionBy("source").orderBy(F.monotonically_increasing_id())
    df = df.withColumn("offset", F.row_number().over(w))
    if max_bytes is not None:
        df = df.withColumn(
            "message",
            F.when(
                F.octet_length("message") > max_bytes,
                F.substring(F.col("message").cast("binary"), 1, max_bytes).cast(
                    "string"
                ),
            ).otherwise(F.col("message")),
        )
    if include_lines or exclude_lines:
        df = df.filter(
            line_keep_predicate(
                F.col("message"), include=include_lines, exclude=exclude_lines
            )
        )
    return df


def line_keep_predicate(
    line: F.Column,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> F.Column:
    """The harvester's shouldExportLine predicate
    (filebeat/input/log/harvester.go:496-519): a line is kept iff it
    matches ANY include pattern (MatchAny — include patterns are OR,
    not AND) and NO exclude pattern. Empty include list ⇒ keep all."""
    keep = F.lit(True)
    if include:
        keep = F.lit(False)
        for p in include:
            keep = keep | F.coalesce(line.rlike(p), F.lit(False))
    for p in exclude or []:
        keep = keep & ~F.coalesce(line.rlike(p), F.lit(False))
    return keep


def include_message(df: DataFrame, patterns: list[str], line_col: str = "message") -> DataFrame:
    """Parser-level include_message filter (libbeat/reader/filter/,
    parser.go:125-131): keep lines matching ANY pattern."""
    return df.filter(line_keep_predicate(F.col(line_col), include=patterns))
