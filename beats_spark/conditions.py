"""Condition compiler: Beats condition config → Spark Column predicate.

Reference: libbeat/conditions/ (dispatch conditions.go:30-99).
Semantics preserved exactly (see SURVEY.md §2.7):

- missing field ⇒ condition is **false**, not NULL
  (equals.go:97-100, range.go:112-115). A field can be "missing" two
  ways here: absent from the schema (compile-time ⇒ lit(False)) or
  NULL at run time (⇒ coalesce(expr, false)).
- type mismatch ⇒ false (equals.go:33-37 warn+false). `equals` is
  strict per type family (extractors.go:64-89): an int literal only
  matches integer-typed values (a double 3.0 does NOT equal literal 3),
  a string literal only string values, a bool literal only bools.
- `range` coerces via ExtractFloat (extractors.go:27-62): any numeric
  *or numeric string* compares as float64; non-numeric ⇒ false.
- `contains` requires string values (matcher via ExtractString).
- and/or/not compose after the false-coercion, so Go boolean logic
  (not SQL ternary logic) applies throughout.

Config shape mirrors the YAML:
    {"equals": {"level": "error"}}
    {"range": {"n_tok.gte": 100, "n_tok.lt": 200}}
    {"and": [c1, c2]}, {"or": [...]}, {"not": c}
    {"has_fields": ["team"]}
    {"contains": {"msg": "substr"}}, {"regexp": {"msg": "^x.*"}}
    {"network": {"ip": "10.0.0.0/8"}}  (IPv4 CIDR + named ranges)
"""

from __future__ import annotations

import ipaddress
import re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from beats_spark.fields import field_col, field_type
from beats_spark.regex import jvm_safe

_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_TYPES = (T.FloatType, T.DoubleType, T.DecimalType)

# named network ranges (libbeat/conditions/network.go)
_NAMED_NETWORKS: dict[str, list[str]] = {
    "loopback": ["127.0.0.0/8", "::1/128"],
    "unicast": ["0.0.0.0/0", "::/0"],
    "multicast": ["224.0.0.0/4", "ff00::/8"],
    "unspecified": ["0.0.0.0/32", "::/128"],
    "link_local_unicast": ["169.254.0.0/16", "fe80::/10"],
    "link_local_multicast": ["224.0.0.0/24", "ff02::/16"],
    "private": ["10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16", "fc00::/7"],
    "public": [],  # handled as NOT(private|loopback|link_local|multicast|unspecified)
}


def _false() -> Column:
    return F.lit(False)


def _bool(col: Column) -> Column:
    """Coerce SQL ternary NULL to Go false (equals.go:97-100)."""
    return F.coalesce(col, F.lit(False))


def _equals_one(df: DataFrame, path: str, value: Any) -> Column:
    col = field_col(df, path)
    ftype = field_type(df.schema, path)
    if col is None or ftype is None:
        return _false()
    if isinstance(value, bool):  # bool first: bool is an int subclass in py
        if isinstance(ftype, T.BooleanType):
            return _bool(col == F.lit(value))
        return _false()
    if isinstance(value, int):
        if isinstance(ftype, _INT_TYPES):
            return _bool(col.cast("long") == F.lit(int(value)))
        return _false()  # float/string event value vs int literal ⇒ false
    if isinstance(value, str):
        if isinstance(ftype, T.StringType):
            return _bool(col == F.lit(value))
        return _false()
    raise ValueError(f"equals: unsupported literal type {type(value)} for {path}")


def _range_one(df: DataFrame, path: str, ops: dict[str, float]) -> Column:
    col = field_col(df, path)
    ftype = field_type(df.schema, path)
    if col is None or ftype is None:
        return _false()
    if isinstance(ftype, _INT_TYPES + _FLOAT_TYPES):
        fval = col.cast("double")
    elif isinstance(ftype, T.StringType):
        fval = col.try_cast("double")  # ParseFloat analog; non-numeric → NULL → false
    else:
        return _false()
    pred = F.lit(True)
    for op, raw in ops.items():
        v = F.lit(float(raw))
        if op == "gte":
            pred = pred & (fval >= v)
        elif op == "gt":
            pred = pred & (fval > v)
        elif op == "lte":
            pred = pred & (fval <= v)
        elif op == "lt":
            pred = pred & (fval < v)
        else:
            raise ValueError(f"range: unexpected operator {op}")
    return _bool(pred)


def _string_match(df: DataFrame, fields: dict[str, str], kind: str) -> Column:
    pred = F.lit(True)
    for path, pattern in fields.items():
        col = field_col(df, path)
        ftype = field_type(df.schema, path)
        if col is None or not isinstance(ftype, T.StringType):
            return _false()  # ExtractString: non-string ⇒ false
        if kind == "contains":
            pred = pred & col.contains(pattern)
        else:
            pred = pred & col.rlike(jvm_safe(pattern))
    return _bool(pred)


def _ipv4_to_long(col: Column) -> Column:
    """Dotted-quad string → int64 (NULL for non-IPv4). Octet checks are
    explicit comparisons, not a forall HOF — HOF lambdas evaluate
    interpreted outside whole-stage codegen and dominated the CIDR
    queries' per-row cost."""
    valid = col.rlike(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")
    parts = F.split(col, r"\.")
    octs = [parts.getItem(i).try_cast("long") for i in range(4)]
    octets_ok = (
        (octs[0] <= 255) & (octs[1] <= 255) & (octs[2] <= 255) & (octs[3] <= 255)
    )
    num = (
        octs[0] * F.lit(16777216)
        + octs[1] * F.lit(65536)
        + octs[2] * F.lit(256)
        + octs[3]
    )
    return F.when(valid & octets_ok, num)


def _ipv6_match_udf(cidrs: tuple[str, ...]):
    """Arrow-vectorized IPv6 membership test (no native 128-bit ints);
    used only when the config actually names v6 CIDRs."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from beats_spark._pickle import ensure_udf_portable

    ensure_udf_portable()

    def _match(s):
        import ipaddress as _ip

        nets = [_ip.ip_network(c, strict=False) for c in cidrs]

        def one(v):
            if v is None or ":" not in v:
                return False
            try:
                addr = _ip.ip_address(v)
            except ValueError:
                return False
            return addr.version == 6 and any(addr in n for n in nets)

        return s.map(one)

    _match.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_match, "boolean")


def _network_one(df: DataFrame, path: str, networks: Any) -> Column:
    """IP-in-CIDR. IPv4 via pure integer arithmetic (JVM-side); IPv6
    CIDRs, when configured, via an Arrow-vectorized membership UDF
    (network.go supports both families)."""
    col = field_col(df, path)
    ftype = field_type(df.schema, path)
    if col is None or not isinstance(ftype, T.StringType):
        return _false()
    if isinstance(networks, str):
        networks = [networks]
    cidrs: list[str] = []
    negate_public = False
    for n in networks:
        if n in _NAMED_NETWORKS:
            if n == "public":
                negate_public = True
                for k in ("private", "loopback", "link_local_unicast",
                          "link_local_multicast", "multicast", "unspecified"):
                    cidrs.extend(_NAMED_NETWORKS[k])
            else:
                cidrs.extend(_NAMED_NETWORKS[n])
        else:
            cidrs.append(n)
    ip_long = _ipv4_to_long(col)
    pred = _false()
    v6: list[str] = []
    for c in cidrs:
        try:
            net = ipaddress.ip_network(c, strict=False)
        except ValueError as e:
            raise ValueError(f"network: bad CIDR {c}") from e
        if net.version != 4:
            v6.append(c)
            continue
        lo, hi = int(net.network_address), int(net.broadcast_address)
        pred = pred | _bool((ip_long >= F.lit(lo)) & (ip_long <= F.lit(hi)))
    if v6:
        pred = pred | F.coalesce(_ipv6_match_udf(tuple(v6))(col), F.lit(False))
    if negate_public:
        is_ip = _bool(ip_long.isNotNull())
        if any(":" in c for c in _flatten_named_v6()):
            is_ip = is_ip | F.coalesce(
                _ipv6_match_udf(("::/0",))(col), F.lit(False)
            )
        pred = is_ip & ~pred
    return _bool(pred)


def _flatten_named_v6() -> list[str]:
    return [c for v in _NAMED_NETWORKS.values() for c in v if ":" in c]


def compile_condition(df: DataFrame, cond: dict[str, Any]) -> Column:
    """Compile one condition dict to a boolean Column (never NULL)."""
    if not isinstance(cond, dict) or len(cond) != 1:
        raise ValueError(f"condition must be a single-key dict, got {cond!r}")
    kind, body = next(iter(cond.items()))

    if kind == "equals":
        pred = F.lit(True)
        for path, value in body.items():
            pred = pred & _equals_one(df, path, value)
        return _bool(pred)
    if kind == "contains" or kind == "regexp":
        return _string_match(df, body, kind)
    if kind == "range":
        grouped: dict[str, dict[str, float]] = {}
        for key, value in body.items():
            m = re.match(r"^(.*)\.(gte|gt|lte|lt)$", key)
            if not m:
                raise ValueError(f"range: key must end in .gt/.gte/.lt/.lte: {key}")
            grouped.setdefault(m.group(1), {})[m.group(2)] = float(value)
        pred = F.lit(True)
        for path, ops in grouped.items():
            pred = pred & _range_one(df, path, ops)
        return _bool(pred)
    if kind == "has_fields":
        fields = [body] if isinstance(body, str) else list(body)
        pred = F.lit(True)
        for path in fields:
            col = field_col(df, path)
            pred = pred & (_false() if col is None else col.isNotNull())
        return _bool(pred)
    if kind == "network":
        pred = F.lit(True)
        for path, networks in body.items():
            pred = pred & _network_one(df, path, networks)
        return _bool(pred)
    if kind == "and":
        pred = F.lit(True)
        for sub in body:
            pred = pred & compile_condition(df, sub)
        return pred
    if kind == "or":
        pred = F.lit(False)
        for sub in body:
            pred = pred | compile_condition(df, sub)
        return pred
    if kind == "not":
        sub = body[0] if isinstance(body, list) else body
        return ~compile_condition(df, sub)
    raise ValueError(f"unknown condition kind: {kind}")
