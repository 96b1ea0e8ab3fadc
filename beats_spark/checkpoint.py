"""Registry-style checkpoint: resumable exactly-once batch reruns.

Reference: Filebeat's registrar persists per-file (source, offset)
state so a restart resumes where it left off
(filebeat/registrar/registrar.go:133-188 Run/writeStates; state record
filebeat/input/file/state.go:29-42). At-least-once there; we upgrade to
exactly-once via idempotent per-chunk commits.

Design (batch analog of files ⇒ chunks):
- the input is split into `n_chunks` deterministic chunks by
  `pmod(xxhash64(doc_id), n_chunks)` — the doc_id plays the role of the
  file offset (stable under reruns, independent of physical layout).
- each chunk is processed and written partitioned by
  (__chunk__, sink) with dynamic partition overwrite: rerunning a chunk
  REPLACES exactly its own partitions (idempotent replay).
- replay safety rests on determinism: a crashed chunk's partial
  partitions are necessarily a SUBSET of the partitions its rerun
  produces (same rows, same routing), so dynamic overwrite replaces
  every partial file. Non-deterministic processors (add_id/now) only
  affect row contents, never the (chunk, sink) partition set, because
  routing reads deterministic fields.
- after a chunk's write succeeds, a manifest row is appended:
  (run_id, chunk_id, row_count, doc_id range, per-chunk metrics,
  committed_at) — the State/registry analog with lineage + metrics.
- resume = read manifest, skip committed chunk ids (the anti-join of
  SURVEY.md §2.1's "resume from registry offset").

On a 1000-executor cluster each chunk is still a full distributed job;
n_chunks bounds the blast radius of a failure (work lost ≤ 1 chunk),
not parallelism.
"""

from __future__ import annotations

import time
from typing import Any, Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from beats_spark.sinks import SINK_COL, strip_internal
from beats_spark.fields import ERROR_COL

CHUNK_COL = "__chunk__"

_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("chunk_id", T.IntegerType()),
        T.StructField("row_count", T.LongType()),
        T.StructField("min_doc_id", T.StringType()),
        T.StructField("max_doc_id", T.StringType()),
        T.StructField("source_snapshot", T.StringType()),
        T.StructField("metrics", T.MapType(T.StringType(), T.LongType())),
        T.StructField("committed_at", T.DoubleType()),
    ]
)


def with_chunk(df: DataFrame, n_chunks: int) -> DataFrame:
    return df.withColumn(
        CHUNK_COL, F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_chunks)).cast("int")
    )


class CheckpointedRunner:
    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        n_chunks: int = 8,
        run_id: str = "run-0",
        source_snapshot: str = "",
    ):
        self.spark = spark
        # Replay idempotency REQUIRES dynamic partition overwrite: with
        # the default (static), mode('overwrite') on a chunk rerun would
        # delete every previously committed chunk's data while the
        # manifest still marks them committed — silent data loss for any
        # user-built session. Set it here instead of trusting the
        # session factory (round-2 ADVICE).
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        self.out_dir = out_dir.rstrip("/")
        self.data_dir = f"{self.out_dir}/data"
        self.manifest_dir = f"{self.out_dir}/manifest"
        self.n_chunks = n_chunks
        self.run_id = run_id
        # lineage: input snapshot identity (Iceberg snapshot id /
        # input path digest) — the State.Source/FileStateOS analog
        self.source_snapshot = source_snapshot

    def committed_chunks(self) -> set[int]:
        try:
            rows = (
                self.spark.read.schema(_MANIFEST_SCHEMA)
                .parquet(self.manifest_dir)
                .filter(F.col("run_id") == self.run_id)
                .select("chunk_id")
                .collect()
            )
        except Exception:
            return set()
        return {r.chunk_id for r in rows}

    def run(
        self,
        df: DataFrame,
        transform: Callable[[DataFrame], DataFrame],
        fail_after: int | None = None,
    ) -> list[int]:
        """Process uncommitted chunks; `fail_after` aborts after that
        many chunk commits (crash injection for resume tests). Returns
        chunk ids committed in this invocation."""
        chunked = with_chunk(df, self.n_chunks)
        done = self.committed_chunks()
        committed: list[int] = []
        for chunk in range(self.n_chunks):
            if chunk in done:
                continue
            part = chunked.filter(F.col(CHUNK_COL) == chunk)
            out = transform(part)
            out = strip_internal(out, keep=(ERROR_COL, CHUNK_COL))
            # manifest stats ride the write itself via Observation — no
            # second scan of the just-written chunk (same pattern as
            # sinks.write_fanout)
            obs = Observation(f"chunk-{chunk}")
            out = out.observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.min("doc_id").alias("lo"),
                F.max("doc_id").alias("hi"),
                F.sum(F.when(F.col(SINK_COL) == "dlq", 1).otherwise(0)).alias(
                    "dead"
                ),
            )
            # dynamic overwrite: replaces only partitions (chunk, *) —
            # a half-written chunk from a crash is fully replaced on rerun
            out.write.partitionBy(CHUNK_COL, SINK_COL).mode("overwrite").parquet(
                self.data_dir
            )
            stats_d = obs.get
            manifest_row = [
                (
                    self.run_id,
                    chunk,
                    stats_d["n"],
                    stats_d["lo"],
                    stats_d["hi"],
                    self.source_snapshot,
                    {
                        "events.published": stats_d["n"],
                        "events.dead_letter": stats_d["dead"] or 0,
                    },
                    time.time(),
                )
            ]
            self.spark.createDataFrame(manifest_row, _MANIFEST_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(self.manifest_dir)
            committed.append(chunk)
            if fail_after is not None and len(committed) >= fail_after:
                break
        return committed

    def cleanup(self, keep_run_ids: set[str]) -> int:
        """Registry GC (registrar clean_inactive / states.cleanup
        analog): drop manifest rows for runs not in `keep_run_ids`.
        Returns rows removed. Data partitions are left to the next
        overwrite (they are replaced per-chunk on rerun)."""
        try:
            m = self.manifest()
        except Exception:
            return 0
        before = m.count()
        kept = m.filter(F.col("run_id").isin(*keep_run_ids))
        kept_rows = kept.collect()
        removed = before - len(kept_rows)
        if removed:
            self.spark.createDataFrame(
                kept_rows, _MANIFEST_SCHEMA
            ).coalesce(1).write.mode("overwrite").parquet(self.manifest_dir)
        return removed

    def result(self) -> DataFrame:
        return self.spark.read.parquet(self.data_dir)

    def manifest(self) -> DataFrame:
        return self.spark.read.schema(_MANIFEST_SCHEMA).parquet(self.manifest_dir)
