"""Flow-control processors (SURVEY.md §2.6).

rate_limit: the reference keeps a token bucket per key-fields hash and
drops non-conforming events (ratelimit/rate_limit.go:103-146). The
batch-correct analog: within each (key, time-bucket) window, keep the
first `limit` events in timestamp order — a windowed row_number, one
shuffle on (key, bucket), no state.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from beats_spark.fields import field_col
from beats_spark.processors.base import Processor, register

_LIMIT_RE = re.compile(r"^\s*(\d+)\s*/\s*(s|m|h)\s*$")
_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600}


@register
class RateLimit(Processor):
    """ratelimit/rate_limit.go:103-116 (Run), :125-146 (key).

    cfg: limit "N/unit" (unit ∈ s|m|h), fields (key fields; empty =
    global bucket), order_by (default '@timestamp').
    """

    name = "rate_limit"
    drops_rows = True

    def apply_when(self, df: DataFrame, cond: Column | None) -> DataFrame:
        m = _LIMIT_RE.match(str(self.cfg.get("limit", "")))
        if not m:
            raise ValueError(f"rate_limit: bad limit {self.cfg.get('limit')!r}")
        limit, unit = int(m.group(1)), m.group(2)
        bucket_s = _UNIT_SECONDS[unit]
        order = self.cfg.get("order_by", "@timestamp")
        order_fields = [order] if isinstance(order, str) else list(order)
        ocols = [field_col(df, o) for o in order_fields]
        if any(c is None for c in ocols):
            raise ValueError(f"rate_limit: missing order column in {order_fields}")
        ocol = ocols[0]
        keys = [
            c
            for c in (field_col(df, f) for f in self.cfg.get("fields", []))
            if c is not None
        ]
        # NTZ timestamps can't cast straight to double; go via LTZ
        # (session tz is UTC, matching naive-epoch semantics)
        epoch = ocol.cast("timestamp_ltz").cast("double")
        bucket = F.floor(epoch / bucket_s).cast("long")
        w = Window.partitionBy(*keys, bucket).orderBy(*ocols)
        if cond is None:
            keep = F.row_number().over(w) <= limit
        else:
            # the reference rate-limits only events the condition selects:
            # rank ONLY condition-matching rows, so non-matching events
            # never consume limit slots (round-2 ADVICE)
            c = F.coalesce(cond, F.lit(False))
            matched_rank = F.sum(F.when(c, 1).otherwise(0)).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            keep = ~c | (matched_rank <= limit)
        return (
            df.withColumn("__rl_keep__", keep)
            .filter(F.col("__rl_keep__"))
            .drop("__rl_keep__")
        )
