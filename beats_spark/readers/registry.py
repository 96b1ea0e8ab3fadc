"""File-identity registry: rotation-safe resumable line reading.

Reference: filestream identifies a file by CONTENT, not by path —
`fingerprint` identity hashes the first N bytes
(filebeat/input/filestream/identifier.go:21-64 fingerprintIdentifier;
scanner gate: a file smaller than the fingerprint window is not
ingested until it grows, input.go:208-277 / prospector scanner), so

- rotation by RENAME (file.log -> file.log.1, appender keeps writing)
  preserves identity: the registrar state (offset) carries over and
  only appended lines are emitted (the rotation-continuation
  semantics of filebeat/tests/system/test_registrar.py:632+);
- truncate-and-recreate produces a NEW identity: the fresh file is
  read from the start;
- a copy keeps the identity too (same content) — exactly-once per
  CONTENT stream, the property the registrar's inode mode only
  approximates (inode reuse after delete is the classic filebeat
  double-read bug the fingerprint mode fixed).

Batch model mapping: `read_lines` offsets are per-file line ordinals;
the registry stores `lines emitted so far` per identity and the
resumable read filters `offset > emitted`. Identity probing is a
driver-side O(#files) read of N bytes per file — the same shape as the
reference's prospector scan (one stat+head per file per poll); the
line data itself stays fully distributed. Commit is atomic
(tmp + os.replace), at-least-once across crashes like the registrar
(a crash between emit and commit re-emits that window).
"""

from __future__ import annotations

import glob as _glob
import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_identity(path: str, length: int = 1024) -> str | None:
    """sha256 of the first `length` bytes, or None while the file is
    smaller than the fingerprint window (not ingestable yet — the
    filestream scanner gate)."""
    try:
        with open(path, "rb") as fh:
            head = fh.read(length)
    except OSError:
        return None
    if len(head) < length:
        return None
    return hashlib.sha256(head).hexdigest()


class LineRegistry:
    """Per-identity emitted-line watermarks, persisted as JSON next to
    the data (registrar.go:133-188 writeStates analog, single writer).
    """

    def __init__(self, state_path: str, fingerprint_bytes: int = 1024):
        self.state_path = state_path
        self.n = fingerprint_bytes
        try:
            with open(state_path) as fh:
                self._states: dict[str, int] = json.load(fh)
        except (FileNotFoundError, ValueError):
            self._states = {}

    # -- state ------------------------------------------------------------

    def emitted(self, identity: str) -> int:
        return int(self._states.get(identity, 0))

    def _persist(self) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self._states, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self.state_path)

    # -- resumable read -----------------------------------------------------

    def scan(self, patterns: str | list[str]) -> dict[str, str]:
        """{path: identity} for every currently-ingestable file
        matching the glob(s); too-small files are gated out."""
        pats = [patterns] if isinstance(patterns, str) else list(patterns)
        out: dict[str, str] = {}
        for pat in pats:
            for p in sorted(_glob.glob(pat)):
                ident = file_identity(p, self.n)
                if ident is not None:
                    out[os.path.abspath(p)] = ident
        return out

    def resume_read(
        self, spark: SparkSession, patterns: str | list[str], **read_kwargs
    ) -> tuple[DataFrame, dict[str, str]]:
        """read_lines over the matching files, filtered to lines BEYOND
        each identity's committed watermark. Returns (frame, idmap);
        pass idmap back to commit() after the output is durably
        written. A renamed-and-appended file keeps its identity, so
        only the appended tail is emitted."""
        from beats_spark.readers.lines import read_lines

        idmap = self.scan(patterns)
        if not idmap:
            raise FileNotFoundError(f"no ingestable files match {patterns!r}")
        df = read_lines(spark, list(idmap), **read_kwargs)
        wm = spark.createDataFrame(
            [(p, ident, self.emitted(ident)) for p, ident in idmap.items()],
            "path string, identity string, emitted long",
        )
        # read_lines sources are URIs (file:/…); normalize to the
        # local path for the watermark join
        src_path = F.regexp_replace(F.col("source"), "^file:/+", "/")
        out = (
            df.withColumn("__path__", src_path)
            .join(F.broadcast(wm), F.col("__path__") == F.col("path"))
            .filter(F.col("offset") > F.col("emitted"))
            .drop("__path__", "path", "emitted")
        )
        return out, idmap

    def commit(self, df: DataFrame, idmap: dict[str, str]) -> None:
        """Advance watermarks to the max emitted offset per identity
        (a #files-sized aggregate) and persist atomically."""
        highs = {
            r.identity: r.hi
            for r in df.groupBy("identity")
            .agg(F.max("offset").alias("hi"))
            .collect()
        }
        for ident in set(idmap.values()):
            hi = highs.get(ident)
            if hi is not None:
                self._states[ident] = max(self.emitted(ident), int(hi))
        self._persist()
