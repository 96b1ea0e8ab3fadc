"""Processor registry — import all modules to populate REGISTRY.

Mirrors libbeat/processors/registry.go: each module registers its
processors by name at import time; compile_chain() turns an ordered
config list (the YAML `processors:` analog) into one DataFrame
transform.
"""

from beats_spark.processors.base import (  # noqa: F401
    REGISTRY,
    Processor,
    Transform,
    compile_chain,
    compile_one,
    register,
)
from beats_spark.processors import shape as _shape  # noqa: F401
from beats_spark.processors import parse as _parse  # noqa: F401
from beats_spark.processors import enrich as _enrich  # noqa: F401
from beats_spark.processors import flow as _flow  # noqa: F401
from beats_spark.processors import metadata as _metadata  # noqa: F401
from beats_spark import grok as _grok  # noqa: F401
