"""Multimodal columns: image/audio/video as opaque binary + typed
metadata; decode/feature-extract as Arrow-batched mapInPandas stages.

The decode step proper is STUBBED (no image/audio libs in this
container): `register_decoder` lets a real deployment plug in e.g.
PIL/torchaudio; the default deterministic fake derives pixel/sample
stats from the bytes so the Spark-side plumbing — schema, partitioning,
batch shape, UDF signatures — is real and tested.

Schema convention:
    media: binary                 -- the opaque payload
    media_meta: struct<kind:string, format:string, width:int,
                       height:int, duration_ms:int>
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_DDL = (
    "struct<kind:string, format:string, width:int, height:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "key string, kind string, n_bytes long, checksum long, "
    "feat array<float>, decode_error string"
)

_DECODERS: dict[str, Callable[[bytes], list[float]]] = {}


def register_decoder(kind: str, fn: Callable[[bytes], list[float]]) -> None:
    """Plug in a real decoder (e.g. PIL image → pixel features)."""
    _DECODERS[kind] = fn


def poly_checksum(payload: bytes) -> int:
    """Engine-portable payload checksum: left fold (acc*31 + byte) mod
    2^31-1. Chosen over zlib.crc32 so a SQL oracle (DuckDB list_reduce
    over hex-extracted bytes) reproduces it bit-exactly — every
    intermediate stays < 2^36, safe in int64 on any engine."""
    acc = 0
    for byte in payload:
        acc = (acc * 31 + byte) % 2147483647
    return acc


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in: byte-histogram lane sums, ppm-quantized.

    feat[j] = ppm_j / 1e6 with ppm_j = (1_000_000 * sum of bytes at
    positions ≡ j mod dim) // (255 * max(len//dim, 1)) — pure integer
    arithmetic up to the final exact division, so any engine (Python,
    Spark, DuckDB) re-derives the identical doubles; no banker-rounding
    dependence. Replace via register_decoder in a real deployment."""
    if not payload:
        return [0.0] * dim
    acc = [0] * dim
    for i, byte in enumerate(payload):
        acc[i % dim] += byte
    n = max(len(payload) // dim, 1)
    return [((1_000_000 * a) // (255 * n)) / 1e6 for a in acc]


def _real_decode(kind: str):
    fn = _DECODERS.get(kind)
    if fn is not None:
        return fn
    if kind in ("image", "audio", "video"):
        return lambda b: _fake_decode(b)
    raise NotImplementedError(f"no decoder registered for media kind {kind!r}")


def sniff_media_meta(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Magic-byte container sniff (native expressions, no decode):
    fills media_meta.kind/format from the payload prefix."""
    b = F.col(media_col)

    def magic(sig: bytes) -> "F.Column":
        # compare hex of the binary prefix — a string cast would mangle
        # non-UTF8 magic bytes
        return F.hex(F.substring(b, 1, len(sig))) == sig.hex().upper()

    fmt = (
        F.when(magic(b"\x89PNG"), F.lit("png"))
        .when(magic(b"\xff\xd8\xff"), F.lit("jpeg"))
        .when(magic(b"GIF8"), F.lit("gif"))
        .when(magic(b"RIFF"), F.lit("wav"))
        .when(magic(b"ID3"), F.lit("mp3"))
        .when(magic(b"OggS"), F.lit("ogg"))
        .otherwise(F.lit("unknown"))
    )
    kind = (
        F.when(fmt.isin("png", "jpeg", "gif"), F.lit("image"))
        .when(fmt.isin("wav", "mp3", "ogg"), F.lit("audio"))
        .otherwise(F.lit("unknown"))
    )
    meta = F.named_struct(
        F.lit("kind"), kind,
        F.lit("format"), fmt,
        F.lit("width"), F.lit(None).cast("int"),
        F.lit("height"), F.lit(None).cast("int"),
        F.lit("duration_ms"), F.lit(None).cast("int"),
    )
    return df.withColumn("media_meta", meta)


def extract_features(
    df: DataFrame,
    key_col: str = "key",
    media_col: str = "media",
    kind_col: str | None = None,
    default_kind: str = "image",
    batch_partitions: int | None = None,
) -> DataFrame:
    """mapInPandas feature extraction over binary media.

    Arrow-batched: each pandas batch decodes payloads vectorized-ish
    (per-batch loop in worker Python — the decode itself is C-library
    work in a real deployment). Repartition first so batches are
    balanced across executors (media rows are fat; row-count-based
    splits beat byte-based here).
    """
    import pandas as pd

    from beats_spark._pickle import ensure_udf_portable

    ensure_udf_portable()

    cols = [key_col, media_col] + ([kind_col] if kind_col else [])
    src = df.select(*cols)
    if batch_partitions:
        src = src.repartition(batch_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            keys, kinds, n_bytes, checksums, feats, errs = [], [], [], [], [], []
            key_vals = b[key_col].tolist()
            media_vals = b[media_col].tolist()
            kind_vals = b[kind_col].tolist() if kind_col else None
            for idx in range(len(b)):
                raw = media_vals[idx]
                payload = bytes(raw) if raw is not None else b""
                kind = kind_vals[idx] if kind_vals is not None else default_kind
                keys.append(key_vals[idx])
                kinds.append(kind)
                n_bytes.append(len(payload))
                checksums.append(poly_checksum(payload))
                try:
                    feats.append(_real_decode(kind)(payload))
                    errs.append(None)
                except NotImplementedError as e:
                    feats.append(None)
                    errs.append(str(e))
            yield pd.DataFrame(
                {
                    "key": keys,
                    "kind": kinds,
                    "n_bytes": n_bytes,
                    "checksum": checksums,
                    "feat": feats,
                    "decode_error": errs,
                }
            )

    return src.mapInPandas(gen, FEATURE_SCHEMA)
