"""Log template mining (beats_spark/templates.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from beats_spark.templates import DEFAULT_MASKS, mask_message, mine_templates


def _mask_one(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "m string")
    return df.select(mask_message(F.col("m")).alias("t")).first().t


def test_mask_battery(spark):
    cases = {
        "ts=2026-01-07T12:00:00Z up": "ts=<TS> up",
        "at 2024-12-31 23:59:59.123 tick": "at <TS> tick",
        "peer 192.168.0.1:8080 ok": "peer <IP>:<N> ok",
        "req 550e8400-e29b-41d4-a716-446655440000 done": "req <UUID> done",
        "addr 0xDEADBEEF len 16": "addr <HEX> len <N>",
        "sha deadbeefcafe1234 short abc123": "sha <HEX> short abc<N>",
        "worker-7 retry 3 of 5": "worker-<N> retry <N> of <N>",
    }
    for raw, want in cases.items():
        assert _mask_one(spark, raw) == want, raw


def test_mask_order_ts_before_digits(spark):
    # if bare \d+ ran first, the timestamp would shred into <N> pieces
    assert _mask_one(spark, "2026-01-07T12:00:00Z") == "<TS>"
    assert _mask_one(spark, "10.1.0.200") == "<IP>"


def test_mine_templates_counts_and_topk(spark):
    df = spark.createDataFrame(
        [
            ("conn from 10.0.0.1 port 22", "a"),
            ("conn from 10.0.0.2 port 80", "b"),
            ("conn from 10.9.9.9 port 443", "a"),
            ("disk full on /dev/sda1", "a"),
            ("disk full on /dev/sda2", "a"),
            ("kernel panic", "c"),
        ],
        "message string, host string",
    )
    out = mine_templates(df, "message", distinct_col="host").collect()
    assert [(r.template, r.n, r.n_distinct) for r in out] == [
        ("conn from <IP> port <N>", 3, 2),
        ("disk full on /dev/sda<N>", 2, 1),
        ("kernel panic", 1, 1),
    ]
    # example = lexicographically first raw line (deterministic)
    assert out[0].example == "conn from 10.0.0.1 port 22"
    # k cutoff follows the same total order
    top = mine_templates(df, "message", k=2).collect()
    assert [r.template for r in top] == [
        "conn from <IP> port <N>",
        "disk full on /dev/sda<N>",
    ]


def test_masks_are_re2_compatible():
    """The oracle contract: every default mask must compile under RE2
    semantics too (no backrefs/lookaround) — checked structurally."""
    import re

    for pat, _ in DEFAULT_MASKS:
        re.compile(pat)  # valid Python/Java-style
        assert "(?<" not in pat and "(?=" not in pat and "(?!" not in pat
        assert "\\1" not in pat
