"""Processor framework: registry + chain compiler + `when` gating.

Reference semantics (libbeat/processors/):
- registry of name → constructor (`registry.go`), config is a list of
  single-key dicts applied in order (`processor.go:69-123`).
- every processor may carry a `when` condition
  (`conditionals.go:108-127`); unmatched events pass through unchanged
  (WhenProcessor.Run, conditionals.go:74-79).
- `if`/`then`/`else` selects between two sub-chains
  (`conditionals.go:137-209`) — the condition is evaluated ONCE on the
  incoming event.
- chain: sequential Run; returning nil drops the event
  (`processor.go:170-183`).

Spark mapping: a processor compiles to `DataFrame → DataFrame`. Row
drops are filters; everything else is a pure column transform, so
`when` gating becomes per-column `F.when(cond, new).otherwise(old)` —
no row explosion, stays in whole-stage codegen.

Internal-column convention: names starting with `__` (plus the fields.py
`_meta`/`_error`/`_flags` columns) are pipeline-internal; `include_fields`
keeps them and the sink writer strips them.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.conditions import compile_condition
from beats_spark.fields import ERROR_COL, FLAGS_COL, META_COL

Transform = Callable[[DataFrame], DataFrame]

INTERNAL_COLS = {META_COL, ERROR_COL, FLAGS_COL}


def is_internal(name: str) -> bool:
    return name.startswith("__") or name in INTERNAL_COLS


class Processor:
    """Base: subclass, set `name`, implement apply()."""

    name: str = ""
    drops_rows = False  # True ⇒ processor filters; it gates itself

    def __init__(self, cfg: dict[str, Any]):
        self.cfg = cfg or {}

    def apply(self, df: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    # drops_rows processors implement this instead (cond may be None)
    def apply_when(self, df: DataFrame, cond: Column | None) -> DataFrame:
        raise NotImplementedError


REGISTRY: dict[str, type[Processor]] = {}


def register(cls: type[Processor]) -> type[Processor]:
    assert cls.name, cls
    REGISTRY[cls.name] = cls
    return cls


_GATE = "__when_gate__"
_ORIG = "__orig__"


def _gate_columns(df_in: DataFrame, proc: Processor, cond: Column) -> DataFrame:
    """Apply `proc` only where `cond`; elsewhere keep the original row.

    Originals are snapshotted under __orig__* names so overwrites can be
    unwound per column; Catalyst collapses the whole thing into one
    projection (no extra pass over the data).
    """
    pre = df_in.withColumn(_GATE, F.coalesce(cond, F.lit(False)))
    user_cols = [c for c in df_in.columns]
    for c in user_cols:
        pre = pre.withColumn(_ORIG + c, F.col(f"`{c}`"))
    df2 = proc.apply(pre)
    out = []
    gate = F.col(_GATE)
    seen = set()
    # preserve original column order, then append processor-added columns
    for c in user_cols:
        seen.add(c)
        oc = _ORIG + c
        if c in df2.columns:
            out.append(F.when(gate, F.col(f"`{c}`")).otherwise(F.col(f"`{oc}`")).alias(c))
        else:  # processor dropped it → null where gated, original elsewhere
            out.append(F.when(~gate, F.col(f"`{oc}`")).alias(c))
    for c in df2.columns:
        if c in seen or c == _GATE or c.startswith(_ORIG):
            continue
        out.append(F.when(gate, F.col(f"`{c}`")).alias(c))
    return df2.select(*out)


def compile_one(cfg: dict[str, Any]) -> Transform:
    """One config block {name: body} (body may hold `when`) → Transform."""
    if not isinstance(cfg, dict) or len(cfg) != 1:
        raise ValueError(f"processor config must be single-key dict: {cfg!r}")
    name, body = next(iter(cfg.items()))
    if name == "if":
        return _compile_if(body)
    if name not in REGISTRY:
        raise ValueError(f"unknown processor: {name}")
    body = dict(body or {})
    when_cfg = body.pop("when", None)
    proc = REGISTRY[name](body)

    def t(df: DataFrame) -> DataFrame:
        if proc.drops_rows:
            cond = compile_condition(df, when_cfg) if when_cfg else None
            return proc.apply_when(df, cond)
        if when_cfg is None:
            return proc.apply(df)
        return _gate_columns(df, proc, compile_condition(df, when_cfg))

    return t


def _compile_if(body: dict[str, Any]) -> Transform:
    """if/then/else (conditionals.go:137-209): condition evaluated once
    on the incoming frame, then column-gated branch application."""
    cond_cfg = body["condition"] if "condition" in body else body["if"]
    then_cfgs = body.get("then") or []
    else_cfgs = body.get("else") or []
    _IFC = "__if_cond__"

    def t(df: DataFrame) -> DataFrame:
        out = df.withColumn(_IFC, F.coalesce(compile_condition(df, cond_cfg), F.lit(False)))
        for branch, cfgs in ((True, then_cfgs), (False, else_cfgs)):
            gate_cfg = {"equals": {_IFC: branch}}
            for c in cfgs:
                c = dict(c)
                pname, pbody = next(iter(c.items()))
                pbody = dict(pbody or {})
                inner_when = pbody.pop("when", None)
                merged = (
                    gate_cfg
                    if inner_when is None
                    else {"and": [gate_cfg, inner_when]}
                )
                pbody["when"] = merged
                out = compile_one({pname: pbody})(out)
        return out.drop(_IFC)

    return t


def compile_chain(cfgs: list[dict[str, Any]]) -> Transform:
    """Ordered processor list → single Transform (processing.group)."""
    transforms = [compile_one(c) for c in cfgs or []]

    def t(df: DataFrame) -> DataFrame:
        for tr in transforms:
            df = tr(df)
        return df

    return t
