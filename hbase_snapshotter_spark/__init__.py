"""PySpark-native snapshot/analytics engine.

A from-scratch rebuild of the capabilities of
``mysql-time-machine/hbase-snapshotter`` (reference: ``/root/reference``)
expressed as idiomatic PySpark DataFrame transformations, plus the
LLM-data-pipeline operator surface (dedup, similarity search, text
analysis, multimodal columns) designed for 100 TB scale.

Layout:

- ``functions``  — driver-side type parsing + column-expression builders.
- ``plans``      — schema strategies (explicit / as-of-reconstructed).
- ``sources``    — change-log readers and warehouse sinks.
- ``operators``  — snapshot, as-of join, dedup, similarity, text ops.
- ``streaming``  — structured-streaming variants (watermark, windows).
- ``queries``    — the registry consumed by ``__spark_entry__.py``.
"""

__version__ = "0.1.0"

# Plan-build fast path (r13): memoize py4j's static reflection lookups
# so every F.*/lit/col/toSeq call costs one gateway round-trip instead
# of three.  Patches py4j CLASSES (not instances), so it applies to
# sessions created before or after this import; results/plans are
# byte-identical (see py4j_fastpath docstring).  SPARK_GRAFT_PY4J_CACHE=0
# disables it for A/B measurement.
from hbase_snapshotter_spark import py4j_fastpath as _py4j_fastpath

_py4j_fastpath.install()
