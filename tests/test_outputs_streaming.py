"""Outputs (codecs, file NDJSON, discard), line reader, metadata lookup
aliases, and the Structured Streaming mode."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from beats_spark.outputs import codec_format, codec_json, write_discard, write_file_ndjson
from beats_spark.processors import compile_one
from beats_spark.readers.lines import include_message, read_lines


def test_codec_json_drops_nulls(spark):
    df = spark.createDataFrame([("a", None)], "x string, y string")
    line = df.select(codec_json(df).alias("l")).collect()[0].l
    assert json.loads(line) == {"x": "a"}


def test_codec_format(spark):
    df = spark.createDataFrame([("world", 3)], "who string, n int")
    line = df.select(codec_format(df, "hello %{[who]} #%{[n]}").alias("l")).collect()[0].l
    assert line == "hello world #3"


def test_file_ndjson_per_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "s1"), ("b", "s2")], "msg string, sink string"
    )
    out = str(tmp_path / "nd")
    write_file_ndjson(df, out)
    back = spark.read.json(out)
    assert back.count() == 2
    assert sorted(os.listdir(out))[0].startswith("sink=") or any(
        d.startswith("sink=") for d in os.listdir(out)
    )


def test_discard(spark):
    write_discard(spark.range(10))  # must not raise


def test_read_lines_offsets_and_filters(spark, tmp_path):
    p = tmp_path / "log1.txt"
    p.write_text("keep one\ndrop me\nkeep two longer than limit\n")
    df = read_lines(
        spark,
        str(tmp_path),
        max_bytes=13,
        include_lines=[r"^keep"],
    )
    rows = sorted((r.offset, r.message) for r in df.collect())
    assert rows == [(1, "keep one"), (3, "keep two long")]
    assert df.schema["source"].dataType.typeName() == "string"


def test_include_message(spark):
    df = spark.createDataFrame([("abc",), ("xyz",)], "message string")
    assert include_message(df, ["^a", "^q"]).count() == 1


def test_metadata_alias_lookup(spark):
    dim = spark.createDataFrame(
        [("c1", "nginx", "web")], "container_id string, image string, role string"
    )
    df = spark.createDataFrame([("c1",), ("c2",)], "container string")
    out = compile_one(
        {
            "add_docker_metadata": {
                "table": dim,
                "key_field": "container",
                "match_field": "container_id",
                "target": "container_meta",
            }
        }
    )(df)
    rows = {r.container: r for r in out.collect()}
    assert rows["c1"]["container_meta"]["image"] == "nginx"
    assert rows["c2"]["container_meta"]["image"] is None


def test_streaming_pipeline_availablenow(spark, tmp_path):
    from beats_spark.datagen import load_token_events
    from beats_spark.flagship import flagship_config
    from beats_spark.streaming import run_stream, stream_events

    src_dir = str(tmp_path / "src")
    load_token_events(spark, "/root/testdata/sf0.001").coalesce(2).write.parquet(src_dir)
    schema = (
        "doc_id string, tokens array<int>, n_tok int, source string, payload string"
    )
    stream = stream_events(spark, src_dir, schema)
    assert stream.isStreaming
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = run_stream(stream, flagship_config(), out_dir, ckpt)
    q.awaitTermination(120)
    written = spark.read.parquet(out_dir)
    # identical sink set to the batch run
    from beats_spark.flagship import routed_frame

    batch = routed_frame(spark, "/root/testdata/sf0.001")
    got = {(r.source, r.sink, r.n) for r in written.groupBy("source", "sink").agg(F.count(F.lit(1)).alias("n")).collect()}
    want = {(r.source, r.sink, r.n) for r in batch.groupBy("source", "sink").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want


def test_streaming_rate_limit_state(spark, tmp_path):
    """Token bucket across micro-batches via applyInPandasWithState."""
    import pandas as pd

    from beats_spark.streaming import streaming_rate_limit

    src = str(tmp_path / "rl_src")
    ckpt = str(tmp_path / "rl_ckpt")
    os.makedirs(src)
    rows = [
        {"k": "a", "ts": f"2024-01-01 00:00:00.{i:03d}"} for i in range(20)
    ]
    pd.DataFrame(rows).to_json(f"{src}/batch1.json", orient="records", lines=True)
    stream = (
        spark.readStream.format("json")
        .schema("k string, ts string")
        .load(src)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    limited = streaming_rate_limit(stream, "k", "ts", limit_per_sec=5.0, burst=5.0)
    out_rows = []
    q = (
        limited.writeStream.foreachBatch(
            lambda df, _: out_rows.extend(df.collect())
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    total_passed = sum(r.passed for r in out_rows)
    total_dropped = sum(r.dropped for r in out_rows)
    assert total_passed + total_dropped == 20
    # burst 5 + ~0.1s of refill at 5/s ⇒ passed well under 20
    assert 5 <= total_passed <= 7


def test_streaming_cache_state(spark, tmp_path):
    """put→get KV across micro-batches (cache.go continuous analog)."""
    import pandas as pd

    from beats_spark.streaming import streaming_cache

    src = str(tmp_path / "c_src")
    ckpt = str(tmp_path / "c_ckpt")
    os.makedirs(src)
    rows = [
        {"k": "u1", "event_id": 1, "v": "a", "put": True},
        {"k": "u1", "event_id": 2, "v": None, "put": False},
        {"k": "u1", "event_id": 3, "v": "b", "put": True},
        {"k": "u1", "event_id": 4, "v": None, "put": False},
        {"k": "u2", "event_id": 5, "v": None, "put": False},
    ]
    pd.DataFrame(rows).to_json(f"{src}/b1.json", orient="records", lines=True)
    stream = (
        spark.readStream.format("json")
        .schema("k string, event_id long, v string, put boolean")
        .load(src)
    )
    out_rows = []
    q = (
        streaming_cache(stream, "k", "event_id", "v", "put")
        .writeStream.foreachBatch(lambda df, _: out_rows.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.event_id: r.cached for r in out_rows}
    assert got == {1: None, 2: "a", 3: "a", 4: "b", 5: None}
