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
