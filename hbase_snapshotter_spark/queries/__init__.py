from hbase_snapshotter_spark.queries.registry import QUERIES, ORACLES  # noqa: F401
