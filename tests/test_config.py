"""filebeat.yml-style config loading → Pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from beats_spark.config import load_yaml

YML = """
filebeat:
  inputs:
    - type: log
      exclude_lines: ['CORRUPT']
processors:
  - dissect:
      tokenizer: 'level=%{level} ts=%{ts} caller=%{caller} msg="%{msg}" ip=%{ip} seq=%{seq|long}'
      field: payload
      target_prefix: ""
  - drop_event:
      when:
        equals: { level: debug }
  - add_fields:
      target: ""
      fields: { env: prod }
output:
  elasticsearch:
    index: "catchall"
    indices:
      - index: "errors"
        when: { equals: { level: error } }
      - index: "big-%{[level]}"
        when: { range: { "seq.gte": 90 } }
"""


def test_yaml_pipeline_end_to_end(spark):
    from beats_spark.datagen import load_token_events

    pipe = load_yaml(YML)
    df = load_token_events(spark, "/root/testdata/sf0.001")
    pipe.config["payload_field"] = "payload"
    out = pipe.transform(df)
    sinks = {r.sink for r in out.select("sink").distinct().collect()}
    assert "errors" in sinks and "catchall" in sinks
    assert any(s.startswith("big-") for s in sinks)
    # exclude_lines removed corrupt rows BEFORE parse
    assert out.filter(F.col("payload").startswith("CORRUPT")).count() == 0
    assert out.filter(F.col("level") == "debug").count() == 0
    assert out.select("env").distinct().collect()[0].env == "prod"


def test_yaml_kafka_topics(spark):
    yml = """
processors: []
output:
  kafka:
    topic: "default-topic"
    topics:
      - topic: "t-%{[source]}"
        when: { contains: { source: "src-4" } }
"""
    pipe = load_yaml(yml)
    df = spark.createDataFrame([("src-4",), ("src-9",)], "source string")
    out = pipe.transform(df)
    got = {r.source: r.sink for r in out.collect()}
    assert got == {"src-4": "t-src-4", "src-9": "default-topic"}


def test_unsupported_output_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="unsupported output"):
        load_yaml("output:\n  logstash:\n    hosts: ['x']\n")


def test_yaml_full_input_and_pipeline_selector(spark, tmp_path):
    """A filebeat.yml exercising the round-2 surface end to end:
    latin1 + custom line terminator + multiline input options through
    read_input, and output.elasticsearch.pipeline/pipelines compiled
    into the per-event ingest-pipeline column."""
    log = tmp_path / "app.bin"
    log.write_bytes(
        "Error uno\r  at a\r  at b\rInfo dos\rError trés\r  at c\r".encode("latin-1")
    )
    yml = f"""
filebeat:
  inputs:
    - type: log
      paths: ['{log}']
      encoding: latin1
      line_terminator: carriage_return
      multiline:
        type: pattern
        pattern: '^\\s+at '
        match: after
processors:
  - dissect:
      tokenizer: '%{{level}} %{{word}}'
      field: message
      target_prefix: ""
output:
  elasticsearch:
    index: "logs"
    pipeline: "default-pl"
    pipelines:
      - pipeline: "err-pl"
        when: {{ equals: {{ level: "Error" }} }}
"""
    from beats_spark.config import load_yaml, pipeline_config_from_dict, read_input
    import yaml as _yaml

    cfg = pipeline_config_from_dict(_yaml.safe_load(yml))
    assert cfg["inputs"][0]["encoding"] == "latin1"
    lines = read_input(spark, cfg["inputs"][0])
    msgs = [r.message for r in lines.orderBy("offset").collect()]
    assert msgs == ["Error uno\n  at a\n  at b", "Info dos", "Error trés\n  at c"]
    pipe = load_yaml(yml)
    out = pipe.transform(lines)
    # %{word} captures the remainder INCLUDING continuation lines
    # ((?s) dissect over the merged event) — key by its first line
    rows = {r.word.split("\n")[0]: (r.sink, r.pipeline) for r in out.collect()}
    assert rows["uno"] == ("logs", "err-pl")
    assert rows["dos"] == ("logs", "default-pl")
    assert rows["trés"] == ("logs", "err-pl")


def test_input_parsers_fields_tags(spark, tmp_path):
    """filestream-style parser chain + per-input fields/tags
    (parser.go:145-199, input config fields/fields_under_root/tags)."""
    import json

    log = tmp_path / "svc.log"
    lines = [
        json.dumps({"lvl": "E", "body": "boom"}),
        json.dumps({"lvl": "I", "body": "fine"}),
    ]
    log.write_text("\n".join(lines) + "\n")
    cfg = {
        "paths": [str(log)],
        "parsers": [{"ndjson": {"schema": "lvl string, body string", "target": ""}}],
        "fields": {"team": "ingest"},
        "fields_under_root": False,
        "tags": ["prod"],
    }
    from beats_spark.config import read_input

    out = read_input(spark, cfg)
    rows = sorted(out.collect(), key=lambda r: r.offset)
    assert [r.lvl for r in rows] == ["E", "I"]
    assert rows[0]["fields"]["team"] == "ingest"
    assert "prod" in rows[0]["tags"]
    # fields_under_root puts the key at top level
    cfg2 = dict(cfg, fields_under_root=True)
    out2 = read_input(spark, cfg2)
    assert out2.collect()[0]["team"] == "ingest"


def test_line_filters_stay_per_input():
    """ADVICE r02: reader-backed inputs keep include/exclude_lines to
    themselves (read_input applies them); only path-less entries
    promote filters to pipeline level."""
    from beats_spark.config import pipeline_config_from_dict

    cfg = pipeline_config_from_dict(
        {
            "inputs": [
                {"paths": ["/a/*.log"], "exclude_lines": ["^DBG-A"]},
                {"paths": ["/b/*.log"], "exclude_lines": ["^DBG-B"]},
            ]
        }
    )
    assert cfg["exclude_lines"] == [] and cfg["include_lines"] == []
    assert cfg["inputs"][0]["exclude_lines"] == ["^DBG-A"]
    assert cfg["inputs"][1]["exclude_lines"] == ["^DBG-B"]
    # path-less entry (pre-read-frame mode): filters promote
    cfg2 = pipeline_config_from_dict(
        {"inputs": [{"exclude_lines": ["CORRUPT"]}]}
    )
    assert cfg2["exclude_lines"] == ["CORRUPT"]


def test_exclude_lines_filters_merged_events_not_continuations(spark, tmp_path):
    """Reference ordering (harvester.go:428): the reader chain runs
    multiline FIRST, then include/exclude_lines drop whole MERGED
    events. An exclude pattern matching only a continuation line must
    not fire (the merged message starts with the header), and an
    exclude matching a bundle's first line drops the entire bundle.
    Empty lines never become events."""
    from beats_spark.config import read_input

    log = tmp_path / "m.log"
    log.write_text(
        "EVT one\n"
        "  at cont DROPME\n"     # continuation mentioning the pattern
        "DROPME header\n"        # bundle whose merged text matches -> gone
        "  at tail\n"
        "\n"                     # empty line: never an event
        "EVT two\n"
    )
    cfg = {
        "paths": [str(log)],
        "multiline": {"pattern": r"^\s+at ", "match": "after"},
        "exclude_lines": [r"^DROPME"],
    }
    msgs = sorted(
        r["message"] for r in read_input(spark, cfg).select("message").collect()
    )
    assert msgs == ["EVT one\n  at cont DROPME", "EVT two"]


def test_empty_content_kept_when_decoded_fields_nonempty(spark, tmp_path):
    """Message.IsEmpty (libbeat/reader/message.go:44-56) is Content
    empty AND Fields empty: after a decoding parser (container here),
    a row whose message is empty but whose decoded fields carry data
    must survive the empty-event drop (ADVICE r03). Without a decoder
    the strict empty-message drop stands."""
    from beats_spark.config import read_input

    log = tmp_path / "c.log"
    log.write_text(
        '{"log":"\\n","stream":"stdout","time":"2024-01-01T00:00:00Z"}\n'
        '{"log":"real line\\n","stream":"stderr","time":"2024-01-01T00:00:01Z"}\n'
    )
    rows = read_input(
        spark,
        {"paths": [str(log)], "parsers": [{"container": {"format": "docker"}}]},
    ).collect()
    assert len(rows) == 2
    by_stream = {r["stream"]: r["message"] for r in rows}
    assert by_stream["stdout"] == "" and by_stream["stderr"] == "real line"

    plain = tmp_path / "p.log"
    plain.write_text("hello\n\nworld\n")
    msgs = [r["message"] for r in read_input(spark, {"paths": [str(plain)]}).collect()]
    assert sorted(msgs) == ["hello", "world"]
