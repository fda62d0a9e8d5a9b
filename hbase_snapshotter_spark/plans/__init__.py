from hbase_snapshotter_spark.plans.schema import (  # noqa: F401
    KEY_COLUMN,
    STATUS_COLUMN,
    explicit_schema,
    schema_as_of,
    transform_schema,
)
