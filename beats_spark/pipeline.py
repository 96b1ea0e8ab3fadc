"""Pipeline assembly: config → one lazily-optimized DataFrame DAG.

The Beats lifecycle (SURVEY.md §3.1: input → harvester → queue →
publisher → output) collapses into
    read → include_lines filter → processor chain → routing → fan-out
with Spark task retry + atomic per-chunk commits replacing the
queue/ACK machinery. Config mirrors filebeat.yml:

    {
      "include_lines": ["^level="],          # pre-parse regex keep
      "exclude_lines": ["^DBG"],             # pre-parse regex drop
      "processors": [ {name: {...}}, ... ],  # ordered chain
      "routing": {"rules": [...], "default": ..., "dead_letter": ...},
      "payload_field": "payload",
    }

include/exclude_lines filter the post-reader-chain message — i.e.
AFTER multiline merging when a parser chain is configured
(harvester.go:428 filters the merged text; config.py read_input
mirrors that), and before the processor chain. With no parser chain
the message IS the raw line and Catalyst pushes the rlike down to the
scan.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beats_spark.fields import field_col
from beats_spark.processors import compile_chain
from beats_spark.routing import with_sink
from beats_spark.sinks import SINK_COL


class Pipeline:
    def __init__(self, config: dict[str, Any]):
        self.config = config
        self.chain = compile_chain(config.get("processors") or [])

    def transform(self, df: DataFrame) -> DataFrame:
        """Everything up to (and including) the sink column."""
        payload = self.config.get("payload_field", "payload")
        pcol = field_col(df, payload)
        if pcol is not None:
            inc = self.config.get("include_lines") or []
            exc = self.config.get("exclude_lines") or []
            if inc or exc:
                from beats_spark.readers.lines import line_keep_predicate

                # include patterns are ANY-match (harvester.go MatchAny),
                # exclude patterns each drop — one combined predicate
                df = df.filter(line_keep_predicate(pcol, include=inc, exclude=exc))
        df = self.chain(df)
        routing = self.config.get("routing")
        if routing:
            df = with_sink(df, routing, SINK_COL)
            # ES per-event ingest-pipeline selector rides next to sink
            # (elasticsearch/client.go getPipeline; config key mirrors
            # output.elasticsearch.pipeline/pipelines)
            if routing.get("pipeline"):
                from beats_spark.routing import with_pipeline

                df = with_pipeline(df, routing["pipeline"])
        return df
