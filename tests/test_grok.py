"""Grok compiler + processor (the north-star's "grok/regex parse"
analog next to dissect)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.grok import GrokError, compile_grok, grok_columns
from beats_spark.processors import compile_one


def test_compile_expansion_and_captures():
    regex, caps = compile_grok(
        "%{IPV4:client} %{WORD:method} %{URIPATH:path} %{INT:bytes:int}"
    )
    assert caps == [
        ("client", None), ("method", None), ("path", None), ("bytes", "int")
    ]
    import re

    m = re.match("^" + regex + "$", "10.1.2.3 GET /a/b.html 1234")
    assert m and m.group(1) == "10.1.2.3" and m.group(4) == "1234"


def test_compile_unknown_pattern_and_type():
    with pytest.raises(GrokError, match="unknown pattern"):
        compile_grok("%{NOPE:x}")
    with pytest.raises(GrokError, match="unknown type"):
        compile_grok("%{INT:x:decimal}")


def test_custom_pattern_definitions():
    regex, caps = compile_grok(
        "%{APPTAG:tag}", extra_patterns={"APPTAG": r"app-\d+"}
    )
    import re

    assert re.fullmatch(regex, "app-42")
    assert caps == [("tag", None)]


def test_grok_columns_types_and_failure(spark):
    df = spark.createDataFrame(
        [("alice GET 200",), ("not a request",), (None,)], "line string"
    )
    matched, vals = grok_columns(
        F.col("line"), "%{USER:user} %{WORD:method} %{INT:status:int}"
    )
    rows = df.select(
        matched.alias("ok"), vals["user"].alias("u"), vals["status"].alias("s")
    ).collect()
    assert (rows[0].ok, rows[0].u, rows[0].s) == (True, "alice", 200)
    assert rows[0].s == 200 and isinstance(rows[0].s, int)
    assert rows[1].ok is False and rows[1].u is None
    assert rows[2].ok is False


def test_grok_processor_first_match_wins(spark):
    df = spark.createDataFrame(
        [
            ("ERROR disk full",),
            ("access 10.0.0.7 GET",),
            ("??",),
        ],
        "message string",
    )
    out = compile_one(
        {
            "grok": {
                "patterns": [
                    "%{LOGLEVEL:level} %{GREEDYDATA:msg}",
                    "access %{IPV4:client} %{WORD:method}",
                ],
            }
        }
    )(df)
    rows = out.collect()
    assert rows[0].level == "ERROR" and rows[0].msg == "disk full"
    assert rows[1].level is None and rows[1].client == "10.0.0.7"
    assert rows[2]._error is not None
    assert "grok_parse_failure" in rows[2]._flags
    assert "grok_parse_failure" not in (rows[0]._flags or [])


def test_combined_apache_log_composite(spark):
    """Composite patterns carry their nested captures (httpd set)."""
    line = (
        '203.0.113.9 - frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /apache_pb.gif HTTP/1.0" 200 2326 '
        '"http://ref.example/start" "Mozilla/4.08"'
    )
    df = spark.createDataFrame([(line,)], "message string")
    out = compile_one({"grok": {"pattern": "%{COMBINEDAPACHELOG}"}})(df)
    r = out.collect()[0]
    assert r.clientip == "203.0.113.9"
    assert r.auth == "frank"
    assert r.verb == "GET" and r.request == "/apache_pb.gif"
    assert r.response == "200" and r.bytes == "2326"
    assert r.referrer == "http://ref.example/start"
    assert r.agent == "Mozilla/4.08"


def test_outer_capture_of_composite_orders_groups():
    """%{COMMONAPACHELOG:line} numbers the outer group before nested
    captures."""
    import re

    regex, caps = compile_grok("%{COMMONAPACHELOG:line}")
    assert caps[0][0] == "line"
    assert [c[0] for c in caps[1:6]] == [
        "clientip", "ident", "auth", "timestamp", "verb"
    ]
    m = re.match(
        "^" + regex,
        '1.2.3.4 - bob [10/Oct/2000:13:55:36 -0700] "GET /x HTTP/1.0" 200 5',
    )
    assert m and m.group(2) == "1.2.3.4"  # nested clientip = group 2


def test_bare_paren_in_literal_text_is_neutralized():
    """ADVICE r02: a bare capturing '(' in pattern text must not shift
    the compiler's group numbering."""
    regex, caps = compile_grok(r"(a|b) %{WORD:w} \( [(] end")
    assert [c[0] for c in caps] == ["w"]
    import re

    m = re.match(regex, r"a word ( ( end")
    assert m and m.group(1) == "word"


def test_bare_paren_in_pattern_definitions_is_neutralized():
    regex, caps = compile_grok(
        "%{MYPAT:v}", extra_patterns={"MYPAT": r"(x+|y+)z"}
    )
    assert [c[0] for c in caps] == ["v"]
    import re

    rx = re.compile(regex)
    assert rx.groups == 1
    assert rx.match("xxz").group(1) == "xxz"


def test_escape_and_class_parens_survive():
    regex, _ = compile_grok(r"\(%{INT:n}[)(]")
    import re

    m = re.match(regex, "(42(")
    assert m and m.group(1) == "42"
