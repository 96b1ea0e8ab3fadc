"""Structured Streaming mode (SURVEY.md §1.2, §7): the continuous
analog of the batch pipeline.

Beats is a continuous tailer; our primary mode is batch-over-table
(the 10^12-row input is static), but the same processor chain runs
unchanged under readStream → foreachBatch → fan-out write. Stateful
operators that the batch engine expresses with windows (rate_limit,
cache) become applyInPandasWithState here — per-key state across
micro-batches, the token bucket proper.

_LOOP_BENCH: the state handlers are sequential by semantics, but their
inner loops iterate plain column lists / numpy epoch floats, never
pandas iterrows — measured 12.78 s (iterrows) vs 0.046 s (column
lists) for a 200k-row batch of (int, str, bool) columns on this box:
a 277× constant factor on the streaming hot path.
"""

from __future__ import annotations

import math
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


def run_stream_dedup(
    stream_df: DataFrame,
    runner,
    checkpoint_dir: str,
    transform=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
    crash_after_commits: int | None = None,
):
    """Streaming incremental dedup (VERDICT r03 item 7): readStream →
    foreachBatch, each micro-batch deduped within itself AND against
    everything already committed (training.dedup.incremental_dedup's
    manifest-snapshot anti-join), then committed atomically through
    the CheckpointedRunner manifest with chunk_id = batch_id.

    Exactly-once across kill/restart holds in BOTH crash windows:
    - crash after data write, before manifest commit → the attempt dir
      is unreferenced; Spark replays the batch_id, a fresh attempt
      supersedes it (the batch run()'s fail_before_commit story);
    - crash after manifest commit, before the streaming checkpoint
      advances → Spark replays the batch_id, the committed_chunks()
      guard skips it (idempotent re-delivery — the registrar's
      "already published this offset" check, reference analog
      filebeat/input/log/harvester.go state updates after publish).

    The corpus identity guarantee: runner.result() after any
    crash/restart sequence equals the uninterrupted run's corpus.

    `crash_after_commits` is test-only crash injection: raise AFTER
    that many manifest commits in this process, i.e. in the second
    window above."""
    from beats_spark.training.dedup import incremental_dedup

    dedup = incremental_dedup(
        runner, transform=transform, text_col=text_col, id_col=id_col
    )
    commits = {"n": 0}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) in runner.committed_chunks():
            return  # replayed micro-batch already in the manifest
        runner.commit_chunk(dedup(batch_df), int(batch_id))
        commits["n"] += 1
        if crash_after_commits is not None and commits["n"] >= crash_after_commits:
            raise RuntimeError("injected crash after manifest commit")

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_dedup_within_watermark(
    stream_df: DataFrame,
    key_cols: "list[str]",
    ts_col: str,
    delay: str,
) -> DataFrame:
    """Native bounded-state streaming dedup —
    `withWatermark(ts, delay).dropDuplicatesWithinWatermark(keys)`
    (Spark 4 API). The complement of `run_stream_dedup`:

    - run_stream_dedup = EXACTLY-ONCE FOREVER against the committed
      corpus (manifest anti-join; state = the manifest, durable and
      unbounded-by-design) — corpus identity.
    - this = duplicates suppressed only while they can still arrive
      within the watermark delay; the state store holds ≈ delay ×
      arrival-rate keys and EVICTS — the shape that runs indefinitely
      on a 1000-executor cluster, for at-least-once upstreams
      (kafka redeliveries, filebeat resends) where a key re-appearing
      days later is legitimately a new event.

    Contract pinned by test: a duplicate landing within `delay` of the
    first sighting is dropped even across micro-batch boundaries; once
    the watermark passes an entry it is evicted, and the same key CAN
    emit again (that re-emission is the price of bounded state — plain
    dropDuplicates never re-emits but its state grows without bound).
    Eviction timing (measured, Spark 4.1): state cleanup runs at the
    END of a batch against the batch-START watermark — a key arriving
    in the same batch its entry expires is still dropped; re-emission
    needs one further micro-batch (the same one-batch-lag family as
    the filtering watermark and the availableNow final no-data batch).
    Reference analog: libbeat's dedup guidance for at-least-once
    outputs; registrar offsets provide the durable variant."""
    return stream_df.withWatermark(
        ts_col, delay
    ).dropDuplicatesWithinWatermark(list(key_cols))


def _merged_chunks(pdfs: Iterator["Any"]):
    """All of a key's rows for one micro-batch as ONE frame (or None if
    empty): the `pdfs` iterator yields Arrow chunks of
    `arrow.maxRecordsPerBatch` rows each, so any handler that sorts
    must concat FIRST or the order interleaves at chunk boundaries
    (regression-tested at maxRecordsPerBatch=3)."""
    import pandas as pd

    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        return None
    return pd.concat(chunks) if len(chunks) > 1 else chunks[0]


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
        # sequential by definition, but iterate COLUMN LISTS, not
        # iterrows (pandas row materialization is ~40× slower per row —
        # see _LOOP_BENCH note)
        current = state.get[0] if state.exists else None
        ids, cached = [], []
        merged = _merged_chunks(pdfs)
        for pdf in ([merged] if merged is not None else []):
            pdf = pdf.sort_values(id_col)
            id_vals = pdf[id_col].astype("int64").tolist()
            put_vals = pdf[put_flag_col].tolist()
            new_vals = pdf[value_col].tolist()
            for i in range(len(id_vals)):
                ids.append(id_vals[i])
                cached.append(current)
                if bool(put_vals[i]):
                    current = None if new_vals[i] is None else str(new_vals[i])
        state.update((current,))
        yield pd.DataFrame(
            {"key": [key[0]] * len(ids), "event_id": ids, "cached": cached}
        )

    return df.groupBy(F.col(key_col)).applyInPandasWithState(
        update, _CACHE_OUT, _CACHE_STATE, "update", GroupStateTimeout.NoTimeout
    )


# --- stateful multiline (bundle across micro-batches) ------------------------

_ML_OUT = (
    "source string, message string, n_lines int, "
    "first_offset long, last_offset long"
)
_ML_STATE = (
    "pending string, n_lines int, first_offset long, last_offset long, "
    "prev_joiner boolean"
)


def streaming_multiline(
    df: DataFrame,
    cfg: dict[str, Any],
    line_col: str = "message",
    group_col: str = "source",
    order_col: str = "offset",
    separator: str = "\n",
    timeout_ms: int | None = 5000,
):
    """multiline/pattern.go continuous form: per-source bundles carried
    across micro-batches via applyInPandasWithState — the batch engine's
    window sessionization (readers/multiline.py) with real cross-batch
    memory. Reference flush semantics (pattern.go:52-58 defaults):
    - a non-continuation line closes the pending bundle,
    - flush_pattern closes it immediately after appending,
    - max_lines (default 500) force-splits oversized bundles,
    - `timeout` (default 5s) flushes an idle source's pending bundle
      via ProcessingTimeTimeout — the tail of a quiet file is not held
      forever. Pass timeout_ms=None to disable (NoTimeout): required
      for drain-and-stop (availableNow) jobs, where an armed
      processing-time timeout keeps the query scheduling batches
      instead of terminating.
    Modes: pattern (negate, match=after|before), count (bundle every N
    lines — counter.go), while_pattern (merge runs of matching lines —
    while.go)."""
    import re

    import pandas as pd

    from beats_spark._pickle import ensure_udf_portable

    ensure_udf_portable()

    mode_t = cfg.get("type", "pattern")
    pattern = cfg.get("pattern", "")
    negate = bool(cfg.get("negate", False))
    match = cfg.get("match", "after")
    flush_pattern = cfg.get("flush_pattern")
    count_n = int(cfg.get("count", 0) or 0)
    max_lines = int(cfg.get("max_lines", 500))
    if mode_t == "count":
        max_lines = min(max_lines, count_n) if count_n else max_lines

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        pat = re.compile(pattern)
        flush_re = re.compile(flush_pattern) if flush_pattern else None
        out: list[tuple] = []

        def load():
            if state.exists:
                return state.get
            return None, 0, 0, 0, False

        pending, n, fo, lo, prev_joiner = load()

        def emit():
            nonlocal pending, n, fo, lo
            if pending is not None:
                out.append((key[0], pending, n, fo, lo))
            pending, n, fo, lo = None, 0, 0, 0

        if state.hasTimedOut:
            emit()
            state.remove()
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "source", "message", "n_lines",
                        "first_offset", "last_offset",
                    ],
                )
            return

        merged = _merged_chunks(pdfs)
        for pdf in ([merged] if merged is not None else []):
            pdf = pdf.sort_values(order_col)
            # column lists, not iterrows (~40× per-row cost; _LOOP_BENCH)
            lines_v = pdf[line_col].tolist()
            offs_v = pdf[order_col].astype("int64").tolist()
            for raw_line, off in zip(lines_v, offs_v):
                line = "" if raw_line is None else str(raw_line)
                matched = pattern != "" and (bool(pat.search(line)) != negate)
                if mode_t == "count":
                    # counter.go: only the N-line cap splits bundles
                    starts_new = False
                elif mode_t == "while_pattern":
                    # while.go: merge runs of matching lines; a
                    # non-matching line is its own event and resets
                    starts_new = (not matched) or (not prev_joiner)
                    prev_joiner = matched
                elif match == "after":
                    # matching lines continue the previous bundle
                    starts_new = not matched
                else:
                    # match=before: a matching line joins the NEXT line;
                    # new event starts when the previous was no joiner
                    starts_new = not prev_joiner
                    prev_joiner = matched
                if starts_new or pending is None:
                    emit()
                    pending, n, fo = line, 1, off
                else:
                    pending = pending + separator + line
                    n += 1
                lo = off
                if flush_re is not None and flush_re.search(line):
                    emit()
                elif n >= max_lines:
                    emit()
        if pending is None and not prev_joiner:
            # nothing buffered: no state, no armed timeout (an armed
            # timeout would keep an availableNow query alive forever)
            if state.exists:
                state.remove()
        else:
            state.update((pending, n, fo, lo, bool(prev_joiner)))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "source", "message", "n_lines", "first_offset", "last_offset",
                ],
            )

    mode = (
        GroupStateTimeout.NoTimeout
        if timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return df.groupBy(F.col(group_col)).applyInPandasWithState(
        update, _ML_OUT, _ML_STATE, "append", mode
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
        merged = _merged_chunks(pdfs)
        for pdf in ([merged] if merged is not None else []):
            pdf = pdf.sort_values(ts_col)
            # numpy epoch floats instead of per-row Timestamp objects
            # (the bucket fold is sequential, but each step is now two
            # float ops; _LOOP_BENCH)
            now_v = (pdf[ts_col].astype("int64").to_numpy() / 1e9).tolist()
            for now in now_v:
                if last:
                    tokens = min(cap, tokens + (now - last) * limit_per_sec)
                last = now
                if tokens >= 1.0:
                    tokens -= 1.0
                    passed += 1
                else:
                    dropped += 1
            max_ts = pdf[ts_col].iloc[-1]
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


# --- stateful counter→rate (metric derivative across micro-batches) ----------

_CR_OUT = (
    "key string, ts_us long, counter long, "
    "rate_milli_per_s long, counter_reset boolean, dt_us long"
)
_CR_STATE = "last_us long, last_counter long"


def streaming_counter_rate(
    df: DataFrame,
    key_col: str,
    ts_us_col: str,
    counter_col: str,
    per_seconds: float = 1.0,
    tiebreak_col: str | None = None,
):
    """Continuous twin of `metrics.counter_rate`: per-series rate of a
    monotonic counter with the Prometheus reset rule, where the
    previous sample is carried ACROSS micro-batches in GroupState
    (last_us, last_counter) — a restart from checkpoint resumes with
    the same carry, so rates at batch boundaries equal the batch
    engine's (pinned in tests over multi-file micro-batches, with a
    reset placed exactly on a boundary).

    Same in-order-per-key arrival contract as streaming_multiline
    (file-ordered sources); within a batch rows sort by
    (ts_us, tiebreak). All arithmetic is exact Python ints (floor
    division) — identical results to the batch window form's
    long arithmetic, which is what makes stream == batch testable
    by value. Emits integer columns only (µs timestamps, milli
    rates): NULL rate on each series' first-ever sample and on
    Δt = 0 duplicates."""
    import pandas as pd

    from beats_spark._pickle import ensure_udf_portable

    ensure_udf_portable()
    scale = int(1_000_000 * per_seconds)

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        last_us, last_c = state.get if state.exists else (None, None)
        out_us: list = []
        out_c: list = []
        out_rate: list = []
        out_reset: list = []
        out_dt: list = []
        pdf = _merged_chunks(pdfs)
        if pdf is not None:
            order = [ts_us_col] + ([tiebreak_col] if tiebreak_col else [])
            pdf = pdf.sort_values(order)
            us_v = pdf[ts_us_col].astype("int64").tolist()
            c_v = pdf[counter_col].astype("int64").tolist()
            for i in range(len(us_v)):
                us, c = us_v[i], c_v[i]
                if last_c is None:
                    rate, reset, dt = None, False, None
                else:
                    dt = us - last_us
                    reset = c < last_c
                    inc = c if reset else c - last_c
                    # mirror the batch form's IEEE arithmetic exactly:
                    # Spark evaluates floor(long*long / long) as int64
                    # product → double division → floor, so convert
                    # each operand the same way (int // int would
                    # differ at quotients a half-ulp below an integer)
                    prod = inc * scale
                    if not (-(1 << 63) <= prod < (1 << 63)):
                        # ANSI parity: the batch form's int64 product
                        # THROWS on overflow — don't silently emit a
                        # value the batch engine would refuse
                        raise ArithmeticError(
                            "streaming_counter_rate: increase*scale "
                            f"({prod}) overflows int64 (batch ANSI parity)"
                        )
                    rate = (
                        math.floor(float(prod) / float(dt))
                        if dt > 0
                        else None
                    )
                out_us.append(us)
                out_c.append(c)
                out_rate.append(rate)
                out_reset.append(reset)
                out_dt.append(dt)
                last_us, last_c = us, c
        state.update((last_us, last_c))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(out_us),
                "ts_us": out_us,
                "counter": out_c,
                "rate_milli_per_s": pd.array(out_rate, dtype="Int64"),
                "counter_reset": out_reset,
                "dt_us": pd.array(out_dt, dtype="Int64"),
            }
        )

    return df.groupBy(F.col(key_col)).applyInPandasWithState(
        update, _CR_OUT, _CR_STATE, "update", GroupStateTimeout.NoTimeout
    )


# --- stateful ordered funnel (product-analytics twin, verdict-r04 #9) --------

_FN_OUT = "user string, depth int, events_seen long"
_FN_STATE = "mask long, first0_us long, n_events long"


def streaming_funnel_depth(
    df: DataFrame,
    user_col: str,
    ts_us_col: str,
    type_col: str,
    stages: list[str],
    within_seconds: float | None = None,
    tiebreak_col: str | None = None,
):
    """Continuous twin of `funnel.funnel_depth`: the per-user stage
    automaton carried across micro-batches in GroupState
    (stage bitmask, first-stage-0 µs, event count). Emits one row per
    user per micro-batch that touched them, with the user's CURRENT
    depth — so the latest row per user always equals what the batch
    engine computes over the union of all micro-batches (pinned in
    tests across file-split boundaries, with a stage transition
    landing exactly on a boundary).

    Semantics mirror the batch form exactly: stage k counts only when
    its event arrives strictly AFTER some event completing stage k−1
    (the bitmask is consulted BEFORE the current row's bits are
    merged, matching the batch rowsBetween(…, -1) window), and with
    `within_seconds` stages past the first must land within the
    budget of the user's first stage-0 event — where "first" is the
    min over STRICTLY PREVIOUS rows, so the state's first0 updates
    after the row is evaluated, like the batch window min. Same
    in-order-per-key arrival contract as streaming_counter_rate;
    within a batch rows sort by (ts, tiebreak) AFTER concatenating
    Arrow chunks (the cross-chunk ordering fix)."""
    import pandas as pd

    from beats_spark._pickle import ensure_udf_portable

    ensure_udf_portable()
    if len(stages) < 2:
        raise ValueError("streaming_funnel_depth: need at least 2 stages")
    budget_us = (
        int(within_seconds * 1_000_000) if within_seconds is not None else None
    )
    stage_idx = {s: k for k, s in enumerate(stages)}
    n_stages = len(stages)

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        mask, first0, n_ev = state.get if state.exists else (0, None, 0)
        pdf = _merged_chunks(pdfs)
        if pdf is not None:
            order = [ts_us_col] + ([tiebreak_col] if tiebreak_col else [])
            pdf = pdf.sort_values(order)
            us_v = pdf[ts_us_col].astype("int64").tolist()
            ty_v = pdf[type_col].tolist()
            for us, ty in zip(us_v, ty_v):
                k = stage_idx.get(ty)
                n_ev += 1
                if k is None:
                    continue
                if k == 0:
                    new_bit = 1
                elif mask & (1 << (k - 1)):
                    if budget_us is not None:
                        # strictly-previous first0 only (batch window
                        # semantics) — first0 is pre-row state here
                        new_bit = (
                            1 if first0 is not None and us <= first0 + budget_us
                            else 0
                        )
                    else:
                        new_bit = 1
                else:
                    new_bit = 0
                if new_bit:
                    mask |= 1 << k
                # first0 updates AFTER evaluation: the row's own
                # stage-0 event never funds its own budget check
                if k == 0 and first0 is None:
                    first0 = us
        state.update((mask, first0, n_ev))
        # depth = longest prefix of set stage bits
        depth = 0
        while depth < n_stages and mask & (1 << depth):
            depth += 1
        yield pd.DataFrame(
            {
                "user": [str(key[0])],
                "depth": [depth],
                "events_seen": [n_ev],
            }
        )

    return df.groupBy(F.col(user_col)).applyInPandasWithState(
        update, _FN_OUT, _FN_STATE, "update", GroupStateTimeout.NoTimeout
    )


# --- stateful EWMA smoothing (continuous twin of metrics.ewma_smooth) --------

_EW_OUT = "key string, rn long, value long, ewma long"
_EW_STATE = "last_s long, n_seen long"


def streaming_ewma(
    df: DataFrame,
    key_col: str,
    ts_us_col: str,
    value_col: str,
    num: int = 1,
    den: int = 8,
    tiebreak_col: str | None = None,
):
    """Continuous twin of `metrics.ewma_smooth`: the per-series
    integer recurrence s_t = (num·x_t + (den−num)·s_{t−1}) // den with
    the previous smoothed value AND the series position carried across
    micro-batches in GroupState (last_s, n_seen) — a restart from
    checkpoint resumes mid-series, so smoothed values at micro-batch
    boundaries equal the batch engine's (stream == batch pinned in
    tests with a boundary placed mid-series).

    Same in-order-per-key arrival contract as streaming_multiline /
    streaming_counter_rate (file-ordered sources); within a batch rows
    sort by (ts_us, tiebreak). Exact Python-int floor arithmetic —
    identical to the batch applyInPandas fold, which is what makes the
    equivalence testable by value. rn is the 1-based position in the
    WHOLE series, not the batch."""
    import pandas as pd

    from beats_spark._pickle import ensure_udf_portable

    ensure_udf_portable()
    if not (0 < num < den):
        raise ValueError(f"need 0 < num < den, got {num}/{den}")
    nn, dd = int(num), int(den)

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        last_s, n_seen = state.get if state.exists else (None, 0)
        out_rn: list = []
        out_v: list = []
        out_s: list = []
        pdf = _merged_chunks(pdfs)
        if pdf is not None:
            order = [ts_us_col] + ([tiebreak_col] if tiebreak_col else [])
            pdf = pdf.sort_values(order)
            for v in pdf[value_col].astype("int64").tolist():
                x = int(v)
                last_s = x if last_s is None else (nn * x + (dd - nn) * int(last_s)) // dd
                n_seen += 1
                out_rn.append(n_seen)
                out_v.append(x)
                out_s.append(last_s)
        state.update((last_s, n_seen))
        yield pd.DataFrame(
            {
                "key": [str(key[0])] * len(out_rn),
                "rn": out_rn,
                "value": out_v,
                "ewma": out_s,
            }
        )

    return df.groupBy(F.col(key_col)).applyInPandasWithState(
        update, _EW_OUT, _EW_STATE, "update", GroupStateTimeout.NoTimeout
    )


_HOLT_OUT = (
    "key string, rn long, value long, level long, trend long, forecast long"
)
_HOLT_STATE = "pend_x long, last_l long, last_b long, n_seen long"


def streaming_holt(
    df: DataFrame,
    key_col: str,
    ts_us_col: str,
    value_col: str,
    alpha: tuple[int, int] = (1, 4),
    beta: tuple[int, int] = (1, 8),
    tiebreak_col: str | None = None,
):
    """Continuous twin of `metrics.holt_smooth` (exact integer level +
    trend recurrences, Python-floor semantics). The textbook init
    b₁ = x₂ − x₁ is NON-CAUSAL — row 1's trend needs the SECOND
    observation — so the stream holds each series' first value in
    GroupState (`pend_x`) and emits rows 1 and 2 together when the
    second arrives; from then on every row emits immediately with
    (last_l, last_b, n_seen) carried across micro-batches, and a
    checkpoint restart resumes mid-series. A series that never gets a
    second point stays pending — the right call for a continuous
    stream, where 'series of one' only means 'so far' (batch jobs on
    closed data should use holt_smooth, which emits trend 0 for them).
    Same in-order-per-key arrival contract as streaming_ewma."""
    import pandas as pd

    from beats_spark._pickle import ensure_udf_portable

    ensure_udf_portable()
    na, da = map(int, alpha)
    nb, db = map(int, beta)
    if not (0 < na < da and 0 < nb < db):
        raise ValueError(f"need proper fractions, got {alpha}, {beta}")

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        pend, lv, tr, n = (
            state.get if state.exists else (None, None, None, 0)
        )
        rows: list[tuple] = []

        def emit(x: int, l_: int, b_: int) -> None:
            nonlocal n
            n += 1
            rows.append((n, x, l_, b_, l_ + b_))

        pdf = _merged_chunks(pdfs)
        if pdf is not None:
            order = [ts_us_col] + ([tiebreak_col] if tiebreak_col else [])
            pdf = pdf.sort_values(order)
            for v in pdf[value_col].astype("int64").tolist():
                x = int(v)
                if lv is None and pend is None:
                    pend = x  # first point: trend needs the next one
                elif lv is None:
                    lv, tr = int(pend), x - int(pend)
                    emit(int(pend), lv, tr)  # rn 1, deferred
                    prev = lv
                    lv = (na * x + (da - na) * (lv + tr)) // da
                    tr = (nb * (lv - prev) + (db - nb) * tr) // db
                    emit(x, lv, tr)  # rn 2
                    pend = None
                else:
                    prev = int(lv)
                    lv = (na * x + (da - na) * (int(lv) + int(tr))) // da
                    tr = (nb * (lv - prev) + (db - nb) * int(tr)) // db
                    emit(x, lv, tr)
        state.update((pend, lv, tr, n))
        yield pd.DataFrame(
            {
                "key": [str(key[0])] * len(rows),
                "rn": [r[0] for r in rows],
                "value": [r[1] for r in rows],
                "level": [r[2] for r in rows],
                "trend": [r[3] for r in rows],
                "forecast": [r[4] for r in rows],
            }
        )

    return df.groupBy(F.col(key_col)).applyInPandasWithState(
        update, _HOLT_OUT, _HOLT_STATE, "update", GroupStateTimeout.NoTimeout
    )
