"""Output family (SURVEY.md §2.9): codecs + file/console/kafka/discard
sinks on top of the fan-out writer (sinks.py holds the primary
per-sink-table path; these are the alternate wire formats).

- codec json (outputs/codec/json/json.go:53-67): event → one JSON
  line. `F.to_json(struct(*))` — pretty/escape_html off by default like
  the reference.
- codec format (outputs/codec/format/): event format string → line.
- file output (fileout/file.go:117-167): NDJSON lines per sink dir —
  the reference's golden-output sink, used by our tests the same way.
- console (console/console.go:46): codec lines to stdout (driver).
- kafka (kafka/kafka.go:37): df.write.format("kafka") with the topic
  column from routing and key from a format string; partitioning via
  hash keys mirrors partition.go:64-112 (hash mode). Gated behind the
  kafka connector being on the classpath.
- discard (discard/discard.go:31): noop sink (format "noop").
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.routing import format_string_col
from beats_spark.sinks import SINK_COL, strip_internal


def codec_json(df: DataFrame, escape_html: bool = False) -> Column:
    """Event → JSON line (codec/json). NULL fields dropped like
    structform's omitempty behavior."""
    body = F.to_json(F.struct(*[F.col(f"`{c}`") for c in df.columns]), {"ignoreNullFields": "true"})
    if escape_html:
        for ch, esc in (("<", "\\u003c"), (">", "\\u003e"), ("&", "\\u0026")):
            body = F.replace(body, F.lit(ch), F.lit(esc))
    return body


def codec_format(df: DataFrame, fmt: str) -> Column:
    """Event format-string codec (codec/format)."""
    return format_string_col(df, fmt)


def write_file_ndjson(
    df: DataFrame,
    path: str,
    per_sink: bool = True,
    mode: str = "overwrite",
) -> None:
    """File output: NDJSON lines, one directory per sink when routed.
    Spark's json writer IS newline-delimited JSON — same bytes the
    reference's file output emits (minus rotation, which Spark's
    file-per-task layout replaces)."""
    out = strip_internal(df)
    writer = out.write.mode(mode)
    if per_sink and SINK_COL in out.columns:
        writer = writer.partitionBy(SINK_COL)
    writer.json(path)


def write_console(df: DataFrame, codec: str = "json", fmt: str | None = None, limit: int = 20) -> None:
    """Console output (debug): codec-encoded lines to driver stdout."""
    line = codec_json(df) if codec == "json" else codec_format(df, fmt or "%{[message]}")
    for r in df.select(line.alias("line")).limit(limit).collect():
        print(r.line)


def write_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic_col: str = SINK_COL,
    key_format: str | None = None,
    partition_keys: list[str] | None = None,
    num_partitions: int | None = None,
) -> None:
    """Kafka output. topic from the routing column (client.go:226-246),
    key from an event format string (config.go:58), hash partitioning
    by repartitioning on the key fields (partition.go:64-112 'hash').
    Requires the spark-sql-kafka connector on the classpath."""
    out = df
    if partition_keys and num_partitions:
        out = out.repartition(num_partitions, *[F.col(k) for k in partition_keys])
    cols = [
        F.col(topic_col).alias("topic"),
        codec_json(strip_internal(out)).alias("value"),
    ]
    if key_format:
        cols.append(format_string_col(out, key_format).alias("key"))
    (
        out.select(*cols)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .save()
    )


def write_discard(df: DataFrame) -> None:
    """Null output: materialize without persisting (noop sink)."""
    df.write.format("noop").mode("overwrite").save()
