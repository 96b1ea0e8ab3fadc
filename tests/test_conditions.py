"""Condition compiler semantics vs the reference
(libbeat/conditions/*_test.go patterns): missing-field ⇒ false,
type-mismatch ⇒ false, strict equals type families, range float
coercion incl. numeric strings, boolean composition."""

import pytest
from pyspark.sql import functions as F

from beats_spark.conditions import compile_condition


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "error", 150, 1.5, True, "10.1.2.3", None),
            (2, "info", 50, 3.0, False, "8.8.8.8", "x"),
            (3, None, 100, None, None, None, None),
        ],
        "id int, level string, n_tok int, score double, flag boolean, ip string, maybe string",
    )


def ids(df, cond):
    return sorted(r["id"] for r in df.filter(compile_condition(df, cond)).collect())


def test_equals_string(df):
    assert ids(df, {"equals": {"level": "error"}}) == [1]


def test_equals_missing_field_is_false(df):
    assert ids(df, {"equals": {"nope": "error"}}) == []


def test_equals_null_is_false(df):
    assert ids(df, {"equals": {"level": "info"}}) == [2]  # row 3 NULL excluded


def test_equals_int_vs_float_column_is_false(df):
    # strict type family: int literal never matches double column
    assert ids(df, {"equals": {"score": 3}}) == []


def test_equals_int(df):
    assert ids(df, {"equals": {"n_tok": 100}}) == [3]


def test_equals_bool(df):
    assert ids(df, {"equals": {"flag": True}}) == [1]


def test_equals_string_vs_int_column_is_false(df):
    assert ids(df, {"equals": {"n_tok": "100"}}) == []


def test_range(df):
    assert ids(df, {"range": {"n_tok.gte": 100}}) == [1, 3]
    assert ids(df, {"range": {"n_tok.gt": 50, "n_tok.lt": 150}}) == [3]


def test_range_numeric_string_coerces(spark):
    d = spark.createDataFrame([(1, "12"), (2, "no")], "id int, v string")
    assert sorted(
        r["id"] for r in d.filter(compile_condition(d, {"range": {"v.gte": 10}})).collect()
    ) == [1]


def test_contains_and_regexp(df):
    assert ids(df, {"contains": {"level": "err"}}) == [1]
    assert ids(df, {"regexp": {"level": "^e.*r$"}}) == [1]


def test_contains_non_string_is_false(df):
    assert ids(df, {"contains": {"n_tok": "1"}}) == []


def test_has_fields(df):
    assert ids(df, {"has_fields": ["level", "maybe"]}) == [2]
    assert ids(df, {"has_fields": ["missing_col"]}) == []


def test_bool_composition(df):
    cond = {
        "or": [
            {"equals": {"level": "error"}},
            {"and": [{"equals": {"level": "info"}}, {"range": {"n_tok.lt": 100}}]},
        ]
    }
    assert ids(df, cond) == [1, 2]


def test_not_with_null_field(df):
    # NOT(equals) over a NULL value: Go evaluates equals→false, not→true
    assert ids(df, {"not": {"equals": {"level": "error"}}}) == [2, 3]


def test_network_cidr(df):
    assert ids(df, {"network": {"ip": "10.0.0.0/8"}}) == [1]
    assert ids(df, {"network": {"ip": "private"}}) == [1]
    assert ids(df, {"network": {"ip": "public"}}) == [2]


def test_condition_never_null(df):
    # the compiled Column must be two-valued over every row
    c = compile_condition(df, {"equals": {"level": "error"}})
    n_null = df.select(c.alias("c")).filter(F.col("c").isNull()).count()
    assert n_null == 0


def test_network_ipv6(spark):
    from beats_spark.conditions import compile_condition

    df = spark.createDataFrame(
        [("fe80::1",), ("2001:db8::5",), ("10.0.0.1",), ("garbage",)],
        "ip string",
    )
    c6 = compile_condition(df, {"network": {"ip": "2001:db8::/32"}})
    got = [r[0] for r in df.select(c6).collect()]
    assert got == [False, True, False, False]
    # named range with both families: private includes fc00::/7
    df2 = spark.createDataFrame([("fc00::1",), ("10.1.2.3",), ("8.8.8.8",)], "ip string")
    cp = compile_condition(df2, {"network": {"ip": "private"}})
    assert [r[0] for r in df2.select(cp).collect()] == [True, True, False]
