"""Structured Streaming mode (SURVEY.md §1.2, §7): the continuous
analog of the batch pipeline.

Beats is a continuous tailer; our primary mode is batch-over-table
(the 10^12-row input is static), but the same processor chain runs
unchanged under readStream → foreachBatch → fan-out write. Stateful
operators that the batch engine expresses with windows (rate_limit,
cache) become applyInPandasWithState here — per-key state across
micro-batches, the token bucket proper.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from beats_spark.pipeline import Pipeline
from beats_spark.sinks import SINK_COL, strip_internal


def stream_events(
    spark: SparkSession, path: str, schema: str, fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def run_stream(
    stream_df: DataFrame,
    config: dict[str, Any],
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """readStream → processor chain + routing per micro-batch →
    per-sink fan-out append. foreachBatch gives the batch engine
    unchanged (incl. broadcast enrich); the streaming checkpoint
    replaces the batch manifest for exactly-once across restarts."""
    pipe = Pipeline(config)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        routed = pipe.transform(batch_df)
        out = strip_internal(routed, keep=("_error",))
        out.write.partitionBy(SINK_COL).mode("append").parquet(out_dir)

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- stateful cache (put→get KV across micro-batches) ------------------------

_CACHE_OUT = "key string, event_id long, cached string"
_CACHE_STATE = "value string"


def streaming_cache(
    df: DataFrame,
    key_col: str,
    id_col: str,
    value_col: str,
    put_flag_col: str,
):
    """cache/cache.go continuous form: rows where `put_flag_col` is true
    store `value_col` under the key; every row is emitted with the most
    recent prior stored value (`cached`). State carried across
    micro-batches via applyInPandasWithState — the batch engine's
    window-based Cache (enrich.py) with real cross-batch memory."""
    import pandas as pd

    from beats_spark._pickle import ensure_udf_portable

    ensure_udf_portable()

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        current = state.get[0] if state.exists else None
        ids, cached = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(id_col)
            for _, row in pdf.iterrows():
                ids.append(int(row[id_col]))
                cached.append(current)
                if bool(row[put_flag_col]):
                    current = (
                        None if row[value_col] is None else str(row[value_col])
                    )
        state.update((current,))
        yield pd.DataFrame(
            {"key": [key[0]] * len(ids), "event_id": ids, "cached": cached}
        )

    return df.groupBy(F.col(key_col)).applyInPandasWithState(
        update, _CACHE_OUT, _CACHE_STATE, "update", GroupStateTimeout.NoTimeout
    )


# --- stateful rate limit (token bucket across micro-batches) -----------------

_RL_OUT = "key string, ts timestamp, passed long, dropped long"
_RL_STATE = "tokens double, last double"


def streaming_rate_limit(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    limit_per_sec: float,
    burst: float | None = None,
):
    """ratelimit/rate_limit.go token-bucket, continuous form: per-key
    bucket refilled at limit_per_sec, capacity `burst` (default =
    1s of tokens), state carried across micro-batches via
    applyInPandasWithState. Emits per-(key, batch) pass/drop counts."""
    import pandas as pd

    from beats_spark._pickle import ensure_udf_portable

    ensure_udf_portable()
    cap = burst if burst is not None else limit_per_sec

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if state.exists:
            tokens, last = state.get
        else:
            tokens, last = cap, 0.0
        passed = dropped = 0
        max_ts = None
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for t in pdf[ts_col]:
                now = t.timestamp()
                if last:
                    tokens = min(cap, tokens + (now - last) * limit_per_sec)
                last = now
                if tokens >= 1.0:
                    tokens -= 1.0
                    passed += 1
                else:
                    dropped += 1
                max_ts = t
        state.update((float(tokens), float(last)))
        yield pd.DataFrame(
            {"key": [key[0]], "ts": [max_ts], "passed": [passed], "dropped": [dropped]}
        )

    return (
        df.groupBy(F.col(key_col))
        .applyInPandasWithState(
            update, _RL_OUT, _RL_STATE, "update", GroupStateTimeout.NoTimeout
        )
    )
