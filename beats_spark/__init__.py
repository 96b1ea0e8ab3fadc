"""beats_spark — a PySpark-native log/telemetry parse → enrich → route → aggregate engine.

A from-scratch reimplementation of the *capabilities* of the Beats
harvester → processor → output pipeline (reference: belimawr/beats,
see SURVEY.md), designed Spark-first:

- events are rows of a DataFrame with a fixed schema (not dynamic maps)
- processors compile to Column expressions (whole-stage codegen), with
  Arrow-vectorized pandas UDFs only where expression semantics run out
- conditions compile to Columns with Beats' missing-field ⇒ false rule
- routing compiles the output selector (first-match-wins rule list) to a
  single `when`-chain producing a `sink` column; fan-out is one
  partitioned write, not N jobs
- the registry/checkpoint analog is a chunked, idempotent, resumable
  batch protocol over deterministic input buckets

Reference semantics are cited per module as /root/reference file:line.
"""

__version__ = "0.1.0"

from beats_spark.session import get_spark  # noqa: F401


def __getattr__(name: str):
    """Lazy top-level API (keeps `import beats_spark` light enough for
    executor-side unpickling): Pipeline, compile_chain,
    compile_condition, route, write_fanout, CheckpointedRunner."""
    if name == "Pipeline":
        from beats_spark.pipeline import Pipeline

        return Pipeline
    if name == "compile_chain":
        from beats_spark.processors import compile_chain

        return compile_chain
    if name == "compile_condition":
        from beats_spark.conditions import compile_condition

        return compile_condition
    if name == "route":
        from beats_spark.sinks import route

        return route
    if name == "write_fanout":
        from beats_spark.sinks import write_fanout

        return write_fanout
    if name == "CheckpointedRunner":
        from beats_spark.checkpoint import CheckpointedRunner

        return CheckpointedRunner
    raise AttributeError(name)
