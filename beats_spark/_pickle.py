"""UDF portability: make beats_spark closures self-contained.

Pandas-UDF closures reference classes from this package (e.g.
dissect.Tokenizer). cloudpickle serializes importable classes *by
reference*, so Python workers that don't have beats_spark on their
PYTHONPATH (driver script run from elsewhere, no --py-files) fail with
ModuleNotFoundError. Registering the modules for by-value pickling
embeds the code in the closure — a few KB per UDF, and the library
works however it is deployed. On a real cluster --py-files still
applies and this is merely redundant.
"""

from __future__ import annotations

_registered = False


def ensure_udf_portable() -> None:
    global _registered
    if _registered:
        return
    try:
        from pyspark import cloudpickle  # vendored copy pyspark actually uses
    except ImportError:  # pragma: no cover - layout differences across versions
        import cloudpickle  # type: ignore[no-redef]
    import beats_spark.dissect as _dissect
    import beats_spark.streaming as _streaming
    import beats_spark.training.bpe as _bpe
    import beats_spark.training.media_codecs as _media_codecs
    import beats_spark.training.multimodal as _multimodal

    # media_codecs must register too: multimodal's default kernels call
    # into it, and a by-reference module global would re-raise
    # ModuleNotFoundError on workers without the package on PYTHONPATH.
    # streaming registers because its stateful handlers share the
    # module-level _merged_chunks helper — a by-reference global in
    # every applyInPandasWithState closure
    # bpe registers because bpe_encode_words' pandas UDF calls the
    # module-level bpe_apply — a by-reference global in the closure
    for mod in (_dissect, _streaming, _bpe, _media_codecs, _multimodal):
        try:
            cloudpickle.register_pickle_by_value(mod)
        except Exception:  # pragma: no cover
            pass
    _registered = True
