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


def test_streaming_multiline_state(spark, tmp_path):
    """Stack trace split ACROSS micro-batches must merge into one
    event (verdict r01 item 7): per-source bundle state via
    applyInPandasWithState with the reference's 5s/500-line flush
    semantics (multiline/pattern.go:52-58)."""
    import time

    import pandas as pd

    from beats_spark.streaming import streaming_multiline

    src = str(tmp_path / "ml_src")
    ckpt = str(tmp_path / "ml_ckpt")
    os.makedirs(src)
    b1 = [
        {"source": "f1", "offset": 1, "message": "Error A"},
        {"source": "f1", "offset": 2, "message": "  at one"},
        {"source": "f1", "offset": 3, "message": "Error B"},
        {"source": "f1", "offset": 4, "message": "  at b1"},
    ]
    b2 = [
        {"source": "f1", "offset": 5, "message": "  at b2"},
        {"source": "f1", "offset": 6, "message": "  at b3"},
        {"source": "f1", "offset": 7, "message": "Error C"},
    ]
    pd.DataFrame(b1).to_json(f"{src}/batch1.json", orient="records", lines=True)
    time.sleep(1.1)  # distinct mod times => two triggers at 1 file/trigger
    pd.DataFrame(b2).to_json(f"{src}/batch2.json", orient="records", lines=True)
    stream = (
        spark.readStream.format("json")
        .schema("source string, offset long, message string")
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    # NoTimeout: an armed processing-time timeout would keep the
    # availableNow query scheduling batches instead of terminating
    merged = streaming_multiline(
        stream,
        {"type": "pattern", "pattern": r"^\s+at ", "match": "after"},
        timeout_ms=None,
    )
    out_rows = []
    q = (
        merged.writeStream.foreachBatch(lambda df, _: out_rows.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    by_msg = {r.message.splitlines()[0]: r for r in out_rows}
    # A closed inside batch 1 when B's header arrived
    assert by_msg["Error A"].n_lines == 2
    assert (by_msg["Error A"].first_offset, by_msg["Error A"].last_offset) == (1, 2)
    # B spans the micro-batch boundary: 2 lines in batch 1 + 2 in batch 2
    assert by_msg["Error B"].message == "Error B\n  at b1\n  at b2\n  at b3"
    assert by_msg["Error B"].n_lines == 4
    assert (by_msg["Error B"].first_offset, by_msg["Error B"].last_offset) == (3, 6)
    # C stays pending in state (NoTimeout, no successor line)
    assert "Error C" not in by_msg


def test_streaming_multiline_timeout_flush(spark, tmp_path):
    """The 5s idle flush proper (pattern.go timeout): a pending bundle
    with no successor is emitted by ProcessingTimeTimeout."""
    import time

    import pandas as pd

    from beats_spark.streaming import streaming_multiline

    src = str(tmp_path / "mlt_src")
    ckpt = str(tmp_path / "mlt_ckpt")
    os.makedirs(src)
    rows = [
        {"source": "f1", "offset": 1, "message": "Error T"},
        {"source": "f1", "offset": 2, "message": "  at tail"},
    ]
    pd.DataFrame(rows).to_json(f"{src}/b1.json", orient="records", lines=True)
    stream = (
        spark.readStream.format("json")
        .schema("source string, offset long, message string")
        .load(src)
    )
    merged = streaming_multiline(
        stream,
        {"type": "pattern", "pattern": r"^\s+at ", "match": "after"},
        timeout_ms=2000,
    )
    out_rows = []
    q = (
        merged.writeStream.foreachBatch(lambda df, _: out_rows.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not out_rows:
            time.sleep(1)
    finally:
        q.stop()
    assert out_rows, "idle timeout never flushed the pending bundle"
    assert out_rows[0].message == "Error T\n  at tail"
    assert out_rows[0].n_lines == 2


def test_kafka_partition_modes(spark):
    """partition.go modes against a pure-Python FNV-1a-32 oracle:
    string fields hash as UTF-8 bytes, ints as 8-byte little-endian
    (HashFieldValue), partition = (h & 0x7FFFFFFF) % n."""
    from beats_spark.outputs import kafka_partition_column

    def fnv1a(data: bytes, h: int = 2166136261) -> int:
        for b in data:
            h = ((h ^ b) * 16777619) % 4294967296
        return h

    rows = [("host-a", 17), ("host-b", 9999999999), ("métrique", 0)]
    df = spark.createDataFrame(rows, "src string, n long")
    n_parts = 12
    got = [
        r.p
        for r in df.withColumn(
            "p", kafka_partition_column(df, n_parts, hash_fields=["src", "n"])
        ).collect()
    ]
    import struct

    want = []
    for src, n in rows:
        h = fnv1a(src.encode("utf-8"))
        h = fnv1a(struct.pack("<q", n), h)
        want.append((h & 0x7FFFFFFF) % n_parts)
    assert got == want
    # key mode
    got_k = [
        r.p
        for r in df.withColumn(
            "p", kafka_partition_column(df, n_parts, key_col="src")
        ).collect()
    ]
    want_k = [(fnv1a(s.encode("utf-8")) & 0x7FFFFFFF) % n_parts for s, _ in rows]
    assert got_k == want_k
    # round_robin rotates within a task
    rr = [
        r.p
        for r in df.coalesce(1)
        .withColumn("p", kafka_partition_column(df, 2, mode="round_robin"))
        .collect()
    ]
    assert rr == [0, 1, 0]
    # random: valid range and deterministic
    rnd = [
        r.p
        for r in df.withColumn(
            "p", kafka_partition_column(df, n_parts, mode="random")
        ).collect()
    ]
    assert all(0 <= p < n_parts for p in rnd)
    # a NULL hash field falls back to a valid spread partition (the
    # reference's rand-on-failure), never NULL
    ndf = spark.createDataFrame([(None, 1)], "src string, n long")
    got_null = ndf.withColumn(
        "p", kafka_partition_column(ndf, n_parts, hash_fields=["src"])
    ).collect()[0].p
    assert got_null is not None and 0 <= got_null < n_parts


def test_streaming_multiline_count_and_while(spark, tmp_path):
    """counter.go / while.go modes in the streaming handler."""
    import pandas as pd

    from beats_spark.streaming import streaming_multiline

    def run(cfg, rows, sub):
        src = str(tmp_path / f"{sub}_src")
        ckpt = str(tmp_path / f"{sub}_ckpt")
        os.makedirs(src)
        pd.DataFrame(rows).to_json(f"{src}/b1.json", orient="records", lines=True)
        stream = (
            spark.readStream.format("json")
            .schema("source string, offset long, message string")
            .load(src)
        )
        out_rows = []
        q = (
            streaming_multiline(stream, cfg, timeout_ms=None)
            .writeStream.foreachBatch(lambda df, _: out_rows.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(out_rows, key=lambda r: r.first_offset)

    rows = [
        {"source": "f", "offset": i, "message": m}
        for i, m in enumerate(["l1", "l2", "l3", "l4", "l5"], 1)
    ]
    got = run({"type": "count", "count": 2}, rows, "cnt")
    # bundles of 2; the trailing single line stays pending (NoTimeout)
    assert [r.message for r in got] == ["l1\nl2", "l3\nl4"]

    wrows = [
        {"source": "f", "offset": i, "message": m}
        for i, m in enumerate(["x1", "x2", "solo", "x3", "x4"], 1)
    ]
    got_w = run({"type": "while_pattern", "pattern": "^x"}, wrows, "whl")
    # run of x1,x2 closed by 'solo'; 'solo' closed by x3; x3,x4 pending
    assert [r.message for r in got_w] == ["x1\nx2", "solo"]


def test_streaming_composition_kill_restart_exactly_once(spark, tmp_path):
    """Verdict-r02 item 8, the streaming twin of
    test_checkpoint_resume_exactly_once: one streaming job chaining
    stateful multiline -> dissect chain -> rate_limit -> routed fan-out,
    killed mid-stream and restarted on the same checkpoint. Per-sink
    counts must equal the corpus truth exactly once — including a
    multiline bundle whose continuation lines arrive only AFTER the
    restart (state store carries the pending bundle across the kill)."""
    import time

    from pyspark.sql import functions as F

    from beats_spark.pipeline import Pipeline
    from beats_spark.streaming import streaming_multiline

    # corpus: event i = head "EVT <i> level=<lvl>" + (i % 4) continuation
    # lines. Event 24 spans the f2/f3 file boundary (2 continuations in
    # each). A sentinel head at the end stays pending by design (no
    # timeout under availableNow) and is excluded from expectations.
    def event(i):
        lvl = "error" if i % 3 == 0 else "info"
        return [f"EVT {i} level={lvl}"] + [f"  at frame {j}" for j in range(i % 4)]

    lines = []
    for i in range(1, 25):
        lines.extend(event(i))
    split_f1 = len([l for i in range(1, 13) for l in event(i)])
    # event 24 has 24%4=0 continuations; give it 4 explicit ones split 2/2
    lines.extend(["  at frame x0", "  at frame x1", "  at frame x2", "  at frame x3"])
    split_f2 = len(lines) - 2  # last 2 continuations go to f3
    for i in range(25, 37):
        lines.extend(event(i))
    lines.append("EVT 999 level=end")  # pending sentinel

    rows = [(("srcA"), off + 1, l) for off, l in enumerate(lines)]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    schema = "source string, offset long, message string"

    def write_wave(name, chunk):
        # the file-stream source lists FLAT files; a .parquet *directory*
        # (what .write.parquet makes) would be invisible to it — write to
        # a scratch dir, then move the single part file into src_dir
        import shutil

        scratch = tmp_path / ("_w_" + name)
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(scratch))
        part = next(p for p in scratch.iterdir() if p.name.endswith(".parquet"))
        shutil.copy(str(part), str(src_dir / name))
        time.sleep(0.2)  # distinct modtimes: file order == write order

    write_wave("f1.parquet", rows[:split_f1])
    write_wave("f2.parquet", rows[split_f1:split_f2])

    out_dir = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    pipe = Pipeline(
        {
            "payload_field": "head",
            "processors": [
                {
                    "dissect": {
                        "tokenizer": "EVT %{evt_id} level=%{level}",
                        "field": "head",
                        "target_prefix": "",
                    }
                },
                {
                    "rate_limit": {
                        "limit": "100000/s",
                        "order_by": "first_offset",
                    }
                },
            ],
            "routing": {
                "rules": [
                    {"sink": "errors", "when": {"equals": {"level": "error"}}}
                ],
                "default": "events",
            },
        }
    )

    def process(batch_df, batch_id):
        if not batch_df.count():
            return
        with_head = batch_df.withColumn(
            "head", F.substring_index("message", "\n", 1)
        )
        routed = pipe.transform(with_head)
        # idempotent-by-batch-id sink: a replayed micro-batch rewrites
        # its own directory instead of appending duplicates
        routed.select(
            "evt_id", "level", "n_lines", "sink"
        ).write.mode("overwrite").parquet(str(out_dir / f"batch={batch_id}"))

    def start(available_now):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        bundles = streaming_multiline(
            stream, {"pattern": r"^\s", "match": "after"}, timeout_ms=None
        )
        w = (
            bundles.writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
        )
        if available_now:
            w = w.trigger(availableNow=True)
        else:
            w = w.trigger(processingTime="500 milliseconds")
        return w.start()

    # phase 1: continuous trigger, killed once the first output lands
    q = start(available_now=False)
    deadline = time.time() + 120
    while time.time() < deadline:
        if out_dir.exists() and any(out_dir.iterdir()):
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)

    # wave 2 lands while the job is DOWN; restart on the same checkpoint
    write_wave("f3.parquet", rows[split_f2:])
    q2 = start(available_now=True)
    q2.awaitTermination(180)

    got = spark.read.parquet(str(out_dir / "batch=*"))
    # exactly-once: every event id exactly once, none lost
    ids = [r.evt_id for r in got.select("evt_id").collect()]
    assert sorted(ids, key=int) == [str(i) for i in range(1, 37)], sorted(ids)
    assert len(ids) == len(set(ids))
    # per-sink counts match corpus truth (i % 3 == 0 -> errors)
    by_sink = {r.sink: r.n for r in got.groupBy("sink").agg(F.count("*").alias("n")).collect()}
    assert by_sink == {"errors": 12, "events": 24}, by_sink
    # the kill-spanning bundle (event 24) reassembled completely:
    # 1 head + 4 continuations, 2 of which arrived after the restart
    n24 = got.filter(F.col("evt_id") == "24").collect()
    assert len(n24) == 1 and n24[0].n_lines == 5, n24


# --- event-time windowed rollups under watermarks (windows.py) ---------------


def _write_event_file(src: str, name: str, rows: list[dict]) -> None:
    import time as _time

    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    _time.sleep(1.1)  # distinct mtimes order the file-source batches


_EVENT_SCHEMA = "ts string, event_type string, user_id bigint, value double"


def _event_stream(spark, src: str):
    return (
        spark.readStream.format("json")
        .schema(_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(src)
        .withColumn("ts", F.to_timestamp("ts"))
    )


def test_streaming_tumbling_watermark_closes_windows_and_drops_late(spark, tmp_path):
    """Append-mode tumbling aggregation: each window emits exactly once
    when the watermark passes its end; an event arriving after its
    window was finalized is dropped (never a duplicate window row);
    a window the watermark has not passed stays open and unemitted.
    Semantics pinned empirically on Spark 4: the filtering watermark
    lags one micro-batch (computed from batch N-1's max event time),
    and trigger(availableNow) runs a final no-data batch that evicts
    with the last watermark."""
    from beats_spark.windows import tumbling_metrics

    src = str(tmp_path / "twin_src")
    ckpt = str(tmp_path / "twin_ckpt")
    os.makedirs(src)
    ev = lambda ts, uid: {"ts": ts, "event_type": "a", "user_id": uid, "value": 1.5}
    # batch 0: hour-0 event + an event advancing max event time to 02:50
    _write_event_file(src, "f1.json", [ev("2024-01-01 00:10:00", 1), ev("2024-01-01 02:50:00", 2)])
    # batch 1 (wm = 02:40): hour-3 event; hour-0 window [.., 01:00) evicts + emits here
    _write_event_file(src, "f2.json", [ev("2024-01-01 03:00:00", 3)])
    # batch 2 (wm = 02:50): LATE hour-0 event — its window is finalized: dropped
    _write_event_file(src, "f3.json", [ev("2024-01-01 00:30:00", 4)])
    # batch 3: sentinel far ahead so the final no-data batch closes hours 2 and 3
    _write_event_file(src, "f4.json", [ev("2024-01-01 10:00:00", 5)])

    agg = tumbling_metrics(
        _event_stream(spark, src),
        ts_col="ts",
        every="1 hour",
        keys=("event_type",),
        value_col="value",
        watermark="10 minutes",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_tumbling")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.window_start: r for r in spark.sql("SELECT * FROM win_tumbling").collect()}

    h = lambda hour: 1704067200 + 3600 * hour  # 2024-01-01 00:00 UTC epoch
    # hour-0 emitted exactly once, WITHOUT the late event (n=1, not 2)
    assert set(rows) == {h(0), h(2), h(3)}, rows
    assert rows[h(0)].n_events == 1 and rows[h(0)].sum_value_milli == 1500
    assert rows[h(2)].n_events == 1 and rows[h(3)].n_events == 1
    # the sentinel's own hour-10 window is still open: not emitted
    assert h(10) not in rows


def test_streaming_session_window_watermark(spark, tmp_path):
    """session_window under a watermark in append mode: sessions emit
    once they can no longer grow (watermark past last-event + gap);
    a gap larger than 30m splits sessions; an open session (the
    sentinel's) never emits."""
    from beats_spark.windows import user_sessions

    src = str(tmp_path / "sess_src")
    ckpt = str(tmp_path / "sess_ckpt")
    os.makedirs(src)
    ev = lambda ts, uid, v: {"ts": ts, "event_type": "a", "user_id": uid, "value": v}
    _write_event_file(
        src,
        "f1.json",
        [
            ev("2024-01-01 00:00:00", 1, 1.0),
            ev("2024-01-01 00:05:00", 1, 2.0),  # merges (5m < 30m gap)
            ev("2024-01-01 01:00:00", 1, 4.0),  # 55m > gap: new session
        ],
    )
    # sentinel advances the watermark past 01:00 + 30m so both sessions close
    _write_event_file(src, "f2.json", [ev("2024-01-01 09:00:00", 99, 0.0)])
    _write_event_file(src, "f3.json", [ev("2024-01-01 09:00:01", 99, 0.0)])

    sess = user_sessions(
        _event_stream(spark, src),
        ts_col="ts",
        key="user_id",
        gap="30 minutes",
        value_col="value",
        watermark="10 minutes",
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("win_sessions")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        spark.sql("SELECT * FROM win_sessions").collect(),
        key=lambda r: (r.user_id, r.session_start_us),
    )
    base_us = 1704067200 * 1_000_000
    assert [(r.user_id, r.session_start_us, r.session_end_us, r.n_events, r.sum_value_milli) for r in rows] == [
        (1, base_us, base_us + 300 * 1_000_000, 2, 3000),
        (1, base_us + 3600 * 1_000_000, base_us + 3600 * 1_000_000, 1, 4000),
    ], rows


def test_streaming_tumbling_matches_batch_on_closed_windows(spark, tmp_path):
    """Batch/stream parity: the streamed append-mode output equals the
    batch tumbling_metrics over the same rows, restricted to windows
    the final watermark closed (the on-time subset — here all but the
    sentinel's window)."""
    from beats_spark.windows import tumbling_metrics

    src = str(tmp_path / "par_src")
    ckpt = str(tmp_path / "par_ckpt")
    os.makedirs(src)
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pdf = events.orderBy("event_id").limit(200).toPandas()
    rows = [
        {
            "ts": str(r.ts),
            "event_type": r.event_type,
            "user_id": int(r.user_id),
            "value": float(r.value),
        }
        for r in pdf.itertuples()
    ]
    _write_event_file(src, "f1.json", rows[:120])
    _write_event_file(src, "f2.json", rows[120:])
    # sentinel a year ahead: closes every data window
    _write_event_file(src, "f3.json", [{"ts": "2025-06-01 00:00:00", "event_type": "x", "user_id": 0, "value": 0.0}])
    _write_event_file(src, "f4.json", [{"ts": "2025-06-01 00:00:01", "event_type": "x", "user_id": 0, "value": 0.0}])

    kw = dict(ts_col="ts", every="1 hour", keys=("event_type",), value_col="value")
    q = (
        tumbling_metrics(_event_stream(spark, src), watermark="10 minutes", **kw)
        .writeStream.format("memory")
        .queryName("win_parity")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value_milli)
        for r in spark.sql("SELECT * FROM win_parity").collect()
        if r.event_type != "x"
    }
    want_df = tumbling_metrics(
        spark.createDataFrame(pdf).withColumn("ts", F.col("ts").cast("timestamp")), **kw
    )
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value_milli)
        for r in want_df.collect()
    }
    assert got == want


def test_streaming_sliding_window_approx_distinct(spark, tmp_path):
    """Sliding windows + approx_count_distinct stream in append mode
    (exact distinct cannot): each event lands in every/slide = 4
    overlapping windows; closed windows emit once with the HLL++
    distinct (exact at these tiny cardinalities)."""
    from beats_spark.windows import tumbling_metrics

    src = str(tmp_path / "slide_src")
    ckpt = str(tmp_path / "slide_ckpt")
    os.makedirs(src)
    ev = lambda ts, uid: {"ts": ts, "event_type": "a", "user_id": uid, "value": 2.0}
    _write_event_file(
        src,
        "f1.json",
        [ev("2024-01-01 00:10:00", 1), ev("2024-01-01 00:10:30", 1), ev("2024-01-01 00:40:00", 2)],
    )
    # sentinels push the watermark far past every data window
    _write_event_file(src, "f2.json", [ev("2024-01-01 09:00:00", 99)])
    _write_event_file(src, "f3.json", [ev("2024-01-01 09:00:01", 99)])

    agg = tumbling_metrics(
        _event_stream(spark, src),
        ts_col="ts",
        every="1 hour",
        slide="15 minutes",
        keys=("event_type",),
        value_col="value",
        distinct_col="user_id",
        approx_distinct=True,
        watermark="10 minutes",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_sliding")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r.window_start: (r.n_events, r.sum_value_milli, r.n_distinct)
        for r in spark.sql("SELECT * FROM win_sliding").collect()
    }
    base = 1704067200  # 2024-01-01 00:00 UTC
    m = lambda mins: base + 60 * mins
    # events at 00:10/00:10:30 (user 1) and 00:40 (user 2); 1h windows
    # sliding by 15m: the 00:10s land in starts 23:15..00:00, the 00:40
    # in 23:45..00:30 — so 23:45 and 00:00 hold all three events.
    assert rows[m(-45)] == (2, 4000, 1)
    assert rows[m(-30)] == (2, 4000, 1)
    assert rows[m(-15)] == (3, 6000, 2)
    assert rows[m(0)] == (3, 6000, 2)
    assert rows[m(15)] == (1, 2000, 1)
    assert rows[m(30)] == (1, 2000, 1)
    # every data event fell in exactly 4 windows; sentinel windows open
    assert len(rows) == 6, rows


def test_dedup_within_watermark_drops_in_window_and_evicts(spark, tmp_path):
    """Pins the streaming_dedup_within_watermark contract: a duplicate
    key within the delay is dropped ACROSS micro-batches; once the
    watermark passes an entry it is evicted and the key emits again
    (bounded state — the availableNow final no-data batch lesson says
    the watermark lags one micro-batch, so eviction is driven by f2's
    10:30 event)."""
    import os

    from pyspark.sql import functions as F

    from beats_spark.streaming import streaming_dedup_within_watermark

    base = 1_700_000_000_000_000  # anchor, µs
    files = [
        [("k1", base), ("k2", base + 5_000_000)],
        [("k1", base + 30_000_000), ("k3", base + 60_000_000)],  # dup k1
        [("k4", base + 1_800_000_000)],  # +30 min: watermark -> +28 min
        # state cleanup runs at END of batch with the batch-START
        # watermark (measured: a dup arriving in the same batch the
        # entry expires is still dropped — the one-batch-lag family),
        # so one more batch must pass before k1 can re-emit:
        [("k5", base + 1_860_000_000)],  # +31 min: evicts k1's entry
        [("k1", base + 1_920_000_000)],  # +32 min: k1 again, post-evict
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    import json as _json

    for i, rows in enumerate(files):
        with open(f"{src}/f{i}.json", "w") as fh:
            for k, us in rows:
                fh.write(_json.dumps({"k": k, "ts_us": us}) + "\n")
        # FileStreamSource orders by MODIFICATION TIME, not path; writes
        # land in the same ms and tie-break nondeterministically, which
        # silently reorders micro-batches (measured: f4 before f3) —
        # pin strictly increasing mtimes
        os.utime(f"{src}/f{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.format("json")
        .schema("k string, ts_us long")
        .option("maxFilesPerTrigger", 1)
        .load(src)
        .select("k", F.timestamp_micros("ts_us").alias("ts"))
    )
    out = streaming_dedup_within_watermark(stream, ["k"], "ts", "2 minutes")
    got = []
    q = (
        out.writeStream.foreachBatch(lambda d, _: got.extend(d.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    seen = sorted((r.k, r.ts.timestamp()) for r in got)
    want = sorted(
        (k, us / 1_000_000)
        for k, us in [
            ("k1", base), ("k2", base + 5_000_000),
            ("k3", base + 60_000_000), ("k4", base + 1_800_000_000),
            ("k5", base + 1_860_000_000),
            ("k1", base + 1_920_000_000),  # re-emitted after eviction
        ]
    )
    assert seen == want  # the in-window k1 duplicate is the ONLY drop
