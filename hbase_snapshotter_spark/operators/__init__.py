from hbase_snapshotter_spark.operators.snapshot import (  # noqa: F401
    decode_expr,
    latest_cells,
    latest_per_key,
    snapshot_as_of,
)
